"""Polyline simplification for vector-tile display — Douglas–Peucker
(Douglas & Peucker 1973, the public tile-rendering standard) over the
segment geometry arrays.

Why it belongs in the engine: the export surface (S6,
`sources/export.py`) ships every segment at full vertex density.  At
display zooms an 80-vertex arterial renders identically to its 6-vertex
simplification; a planet network is ~10^8 segments × tens of vertices,
and the vector-tile bytes (not the parquet) are what a tile server pays
for forever.  Per-zoom thinning with a sub-pixel tolerance is lossless
ON SCREEN by construction: every dropped vertex is within ``tol`` of
the kept polyline (asserted as a property test, not assumed).

Execution shape: one ``mapInPandas`` over the segment table — a NARROW
map, zero exchanges, geometry arrays never shuffle (same contract as
the offset-curve writer at `sources/export.py:88`).  The kernel is
vectorised numpy per polyline (stack-based DP, no recursion) — a
handful of microseconds per segment.

Tolerance: pass ``tolerance_deg`` directly, or derive it from a slippy
zoom — one display pixel at zoom ``z`` spans ``360 / (256 · 2^z)``
degrees of longitude at the equator; longitudes are cos(lat)-corrected
inside the kernel so the tolerance is isotropic on screen.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def pixel_tolerance_deg(zoom: int, px: float = 1.0) -> float:
    """Degrees-of-longitude span of ``px`` display pixels at ``zoom``
    (256-px slippy tiles)."""
    return 360.0 / (256.0 * (1 << zoom)) * px


def dp_keep_mask(lons: np.ndarray, lats: np.ndarray, tol_deg: float) -> np.ndarray:
    """Boolean keep-mask for one polyline under Douglas–Peucker with
    point-to-SEGMENT distance (the clamped variant — robust to
    spikes past the chord ends).  Endpoints always kept.  Longitude is
    scaled by cos(mean lat) so ``tol_deg`` means the same ground
    distance in both axes."""
    n = len(lons)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    coslat = math.cos(math.radians(float(np.mean(lats))))
    xs = lons * coslat
    ys = np.asarray(lats, dtype=np.float64)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        x0, y0, x1, y1 = xs[i], ys[i], xs[j], ys[j]
        px, py = xs[i + 1 : j], ys[i + 1 : j]
        dx, dy = x1 - x0, y1 - y0
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            d = np.hypot(px - x0, py - y0)
        else:
            t = np.clip(((px - x0) * dx + (py - y0) * dy) / l2, 0.0, 1.0)
            d = np.hypot(px - (x0 + t * dx), py - (y0 + t * dy))
        k = int(np.argmax(d))
        if d[k] > tol_deg:
            mid = i + 1 + k
            keep[mid] = True
            stack.append((i, mid))
            stack.append((mid, j))
    return keep


def simplify_segments(
    segments: DataFrame,
    tolerance_deg: float | None = None,
    zoom: int | None = None,
    px: float = 1.0,
) -> DataFrame:
    """Replace each segment's ``lons``/``lats`` with their
    Douglas–Peucker simplification and append ``pts_in``/``pts_out``
    vertex counts (the rollup a tile pipeline reports per zoom).
    Exactly one of ``tolerance_deg`` / ``zoom`` must be given.

    Narrow one-pass ``mapInPandas``; every other column rides through
    untouched, so the op composes with the geojson writers and the
    tile assignment unchanged."""
    if (tolerance_deg is None) == (zoom is None):
        raise ValueError("pass exactly one of tolerance_deg / zoom")
    tol = tolerance_deg if tolerance_deg is not None else pixel_tolerance_deg(zoom, px)

    from pyspark.sql.types import IntegerType, StructField, StructType

    # NB: never .add() onto df.schema — it's the DataFrame's CACHED
    # StructType and add() mutates in place, desyncing the Python-side
    # column list from the JVM plan
    out_schema = StructType(
        list(segments.schema.fields)
        + [StructField("pts_in", IntegerType()), StructField("pts_out", IntegerType())]
    )

    def _simplify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_in = np.empty(len(pdf), dtype=np.int32)
            n_out = np.empty(len(pdf), dtype=np.int32)
            lons_col = pdf["lons"].to_numpy()
            lats_col = pdf["lats"].to_numpy()
            new_lons, new_lats = [], []
            for i in range(len(pdf)):
                lo = np.asarray(lons_col[i], dtype=np.float64)
                la = np.asarray(lats_col[i], dtype=np.float64)
                m = dp_keep_mask(lo, la, tol)
                n_in[i] = len(lo)
                n_out[i] = int(m.sum())
                new_lons.append(lo[m].tolist())
                new_lats.append(la[m].tolist())
            pdf = pdf.copy()
            pdf["lons"] = new_lons
            pdf["lats"] = new_lats
            pdf["pts_in"] = n_in
            pdf["pts_out"] = n_out
            yield pdf

    return segments.mapInPandas(_simplify, schema=out_schema)
