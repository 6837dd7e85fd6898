"""Tile assignment + payload invariants (the raster↔vector routing layer).

Per input image row: slippy z11/z18 tile parity columns
(SpatialDataStore.getTile, SpatialDataStore.java:199-216), the packed cell
id and Morton key (functions/cells.py) for partitioning, and — on demand —
the payload invariants (decoded-pixel PSNR ≥ 40 dB vs the caption-rendered
canonical grid, caption equality, pHash match) via an Arrow-batched UDF.

``bytes`` is only read on the verification path; the tile-assignment plan
itself projects it away (column pruning — SURVEY §7.4.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import Z_AREA, Z_ITEM
from ..functions.cells import cell_pack_col, morton_col, tile_x_col, tile_y_col
from ..functions.images import decode_image, extract_caption, phash64, psnr_db, render_pixels
from .match import CAPTION_RE


def assign_tiles(images: DataFrame) -> DataFrame:
    """Pure-column tile assignment; never touches `bytes`."""
    lat = F.regexp_extract("caption", CAPTION_RE, 3).try_cast("double")
    lon = F.regexp_extract("caption", CAPTION_RE, 4).try_cast("double")
    x18, y18 = tile_x_col(lon, Z_ITEM), tile_y_col(lat, Z_ITEM)
    return images.select(
        "image_id",
        tile_x_col(lon, Z_AREA).alias("tile_x11"),
        tile_y_col(lat, Z_AREA).alias("tile_y11"),
        x18.alias("tile_x18"),
        y18.alias("tile_y18"),
        cell_pack_col(x18, y18, Z_ITEM).alias("cell"),
        morton_col(x18, y18).alias("morton"),
    )


VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes_ok", T.BooleanType(), False),
        T.StructField("caption_ok", T.BooleanType(), False),
        T.StructField("phash_ok", T.BooleanType(), False),
        T.StructField("psnr_db", T.DoubleType(), False),
    ]
)


def verify_payloads(images: DataFrame, min_psnr: float = 40.0) -> DataFrame:
    """Per-row payload invariants (north rule): decode `bytes`, compare to
    the caption-rendered canonical pixels (allclose for lossless, PSNR ≥
    40 dB for lossy), check the pixel-carried geotag equals `caption`, and
    recompute pHash.  Arrow-batched mapInPandas — numpy per image, no
    per-row Python at the API level."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                # An undecodable payload is exactly what verification must
                # REPORT — a raise here would kill the task (and at 10^12
                # rows, the job) on the first corrupt row.
                try:
                    px = decode_image(bytes(r.bytes))
                except Exception:
                    rows.append((r.image_id, False, False, False, 0.0))
                    continue
                canon = render_pixels(r.caption, int(r.w), int(r.h))
                p = psnr_db(canon, px)
                lossless = r.fmt == "png"
                bytes_ok = bool(np.array_equal(canon, px)) if lossless else bool(p >= min_psnr)
                try:
                    cap_ok = extract_caption(px) == r.caption
                except Exception:
                    cap_ok = False
                rows.append((r.image_id, bytes_ok, cap_ok, phash64(px) == int(r.phash) if lossless else True, float(min(p, 1e9))))
            yield pd.DataFrame(rows, columns=[f.name for f in VERIFY_SCHEMA.fields])

    return images.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash").mapInPandas(
        run, schema=VERIFY_SCHEMA
    )


def tile_assignments_with_invariants(images: DataFrame) -> DataFrame:
    """Join the column-only tile plan with the payload verification on the
    image_id spine (bytes never crosses the tile-assignment shuffle)."""
    return assign_tiles(images).join(verify_payloads(images), "image_id")


def tile_pyramid(
    points: DataFrame,
    min_zoom: int = Z_AREA,
    max_zoom: int = Z_ITEM,
    weight: str | None = None,
) -> DataFrame:
    """Raster tile pyramid: per-tile totals at ``max_zoom`` rolled up to
    every ancestor level down to ``min_zoom`` (the raster half of the
    raster↔vector layer; slippy ancestor = coordinate right-shift, same
    parent math as functions/cells.cell_parent_col).

    Plan shape, chosen for 10^12-row inputs: (1) partial+final hash agg
    at the LEAF zoom first — the leaf aggregate is bounded by the number
    of occupied z-``max_zoom`` tiles, orders of magnitude smaller than
    the input; (2) one Generate exploding each leaf row over its
    ``max_zoom - min_zoom + 1`` ancestor levels with a column-amount
    shiftright (pure codegen, no per-level rescan of the input);
    (3) one final hash agg on (z, x, y).  Two exchanges total, both on
    already-reduced data; a per-level loop over the input would scan it
    ``levels`` times and shuffle unreduced rows.

    Returns (z, x, y, n, w_sum) — ``w_sum`` only when ``weight`` given.
    """
    assert 0 <= min_zoom <= max_zoom, (min_zoom, max_zoom)
    x = tile_x_col(F.col("lon"), max_zoom)
    y = tile_y_col(F.col("lat"), max_zoom)
    aggs = [F.count(F.lit(1)).alias("n")]
    if weight:
        aggs.append(F.sum(weight).alias("w_sum"))
    leaf = points.select(
        x.alias("x"), y.alias("y"),
        *([F.col(weight).alias(weight)] if weight else []),
    ).groupBy("x", "y").agg(*aggs)
    up = [F.sum("n").alias("n")]
    if weight:
        up.append(F.sum("w_sum").alias("w_sum"))
    return (
        leaf.select(
            F.explode(
                F.sequence(F.lit(min_zoom), F.lit(max_zoom))
            ).alias("z"),
            "x", "y", "n",
            *(["w_sum"] if weight else []),
        )
        .select(
            "z",
            F.expr(f"shiftright(x, {max_zoom} - z)").alias("x"),
            F.expr(f"shiftright(y, {max_zoom} - z)").alias("y"),
            "n",
            *(["w_sum"] if weight else []),
        )
        .groupBy("z", "x", "y")
        .agg(*up)
    )
