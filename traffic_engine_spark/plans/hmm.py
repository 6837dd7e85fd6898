"""Per-trace Viterbi/HMM map matching — the north rule's named kernel,
as an applyInPandas operator over the declarative candidate pairing.

The parity pipeline (plans/match.py) is the reference's tripline state
machine (exactness gate); this operator is the ADDITIONAL HMM matcher
the north star describes: candidate OSM segments are proposed per z18
cell ring by an equi-join on the packed cell key (the same J1 machinery,
ints only — no float crosses the JVM/Python boundary except fix
coordinates), and the Gaussian-emission / continuity-transition Viterbi
decode (functions/viterbi.py, Newson & Krumm 2009 shape) runs inside one
``applyInPandas`` group per trace.

Scale shape: the pairing is one bounded-key equi-join (candidates per
fix = segments covering a 3×3 z18 ring — city-block density), the
shuffle key is trace_id, and the kernel is numpy over Arrow batches.
Dense-cell skew is the same axis the pipeline already handles
(plans/skew.salted_join on the packed key); a trace's candidate rows are
O(fixes × ring density), never O(network).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import explode_bbox_cover, pack_xy, tile_x_col, tile_y_col
from ..functions.viterbi import Z_HMM, point_segment_dist_m_np, viterbi_decode_np

MATCH_SCHEMA = (
    "trace_id long, seq long, ts long, segment_id long, dist_m double"
)


def _segment_cover(segments: DataFrame) -> DataFrame:
    """(packed cell, segment endpoint dim): one row per z18 tile (±1 ring)
    a segment's bbox covers."""
    seg = segments.select(
        "segment_id", "start_node_id", "end_node_id",
        F.element_at("lons", 1).alias("ax"), F.element_at("lats", 1).alias("ay"),
        F.element_at("lons", -1).alias("bx"), F.element_at("lats", -1).alias("by"),
    )
    return explode_bbox_cover(
        seg,
        F.least(F.col("ax"), F.col("bx")), F.least(F.col("ay"), F.col("by")),
        F.greatest(F.col("ax"), F.col("bx")), F.greatest(F.col("ay"), F.col("by")),
        zoom=Z_HMM, margin=1,
    ).select(
        pack_xy(F.col("tile_x"), F.col("tile_y")).alias("_ck"),
        "segment_id", "start_node_id", "end_node_id", "ax", "ay", "bx", "by",
    )


def viterbi_match(
    fixes: DataFrame,
    segments: DataFrame,
    k: int = 4,
    sigma_m: float = 25.0,
    trans_adj: float = 1.0,
    trans_jump: float = 10.0,
) -> DataFrame:
    """(trace_id, seq, ts, segment_id, dist_m): the Viterbi-decoded
    segment per GPS fix (segment_id -1 where no segment covers the fix's
    cell ring).  seq orders fixes by (ts, lon, lat) within the trace.

    Deterministic: candidate order is ascending segment_id, argmin takes
    the first minimum, and all float math is float64 numpy shared with
    the test oracle — output is independent of partitioning and
    parallelism (test_viterbi_partitioning_invariant).
    """
    cover = _segment_cover(segments)
    # non-finite coordinates (decode_fixes' try_cast admits 'NaN' and
    # 'Infinity' captions) are garbage for matching AND poison fix
    # identity (NaN != NaN splits runs while the oracle's drop_duplicates
    # merges them) — drop them to mirror the oracle's np.isfinite filter
    fixes = fixes.filter(
        ~F.isnan("lat") & ~F.isnan("lon")
        & (F.abs(F.col("lat")) != float("inf"))
        & (F.abs(F.col("lon")) != float("inf"))
    )
    fx = fixes.select(
        "trace_id", "ts", "lat", "lon",
        pack_xy(
            tile_x_col(F.col("lon"), Z_HMM), tile_y_col(F.col("lat"), Z_HMM)
        ).alias("_ck"),
    )
    # left join: fixes whose ring holds no segment still reach the kernel
    # (they must emit the -1 sentinel and break no chains).  The join key
    # is dropped before the Arrow boundary — at ~19 candidates/fix
    # (measured, bench city z18) the candidate payload is the operator's
    # dominant cost, so every shipped column counts.
    # coalesce the dim columns to sentinels so they stay NON-NULL int64
    # through Arrow: a single null makes pandas materialise the column as
    # float64, which rounds 60-bit md5 segment ids (2^53 ulp) — reproduced
    # as off-by-one ids on mixed covered/uncovered traces
    cand = (
        fx.join(cover, "_ck", "left").drop("_ck")
        .withColumn("segment_id", F.coalesce(F.col("segment_id"), F.lit(-1)))
        .withColumn("start_node_id", F.coalesce(F.col("start_node_id"), F.lit(-1)))
        .withColumn("end_node_id", F.coalesce(F.col("end_node_id"), F.lit(-1)))
        .withColumn("ax", F.coalesce(F.col("ax"), F.lit(0.0)))
        .withColumn("ay", F.coalesce(F.col("ay"), F.lit(0.0)))
        .withColumn("bx", F.coalesce(F.col("bx"), F.lit(0.0)))
        .withColumn("by", F.coalesce(F.col("by"), F.lit(0.0)))
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        trace_id = int(pdf["trace_id"].iloc[0])
        # fix identity = (ts, lat, lon); seq = rank in that order.
        # EVERYTHING below is vectorised pandas/numpy — a dict-comprehension
        # formulation was measured 100× slower at bench scale (per-row
        # Python over the candidate rows)
        pdf = pdf.sort_values(["ts", "lat", "lon"], kind="mergesort")
        # exact run-length fix ids over the sorted keys (no hashing — a
        # hash collision would silently merge two fixes)
        k1 = pdf["ts"].to_numpy()
        k2 = pdf["lat"].to_numpy()
        k3 = pdf["lon"].to_numpy()
        new = np.ones(len(pdf), dtype=bool)
        new[1:] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1]) | (k3[1:] != k3[:-1])
        pdf = pdf.assign(_fi=np.cumsum(new) - 1)
        fix_keys = pdf.drop_duplicates("_fi")[["ts", "lat", "lon"]].reset_index(drop=True)
        n_fix = len(fix_keys)
        has = pdf[pdf["segment_id"] >= 0]
        if len(has):
            # one candidate per (fix, segment) even when several covered
            # ring tiles matched; ascending segment_id within a fix is the
            # tie-break order the decode relies on
            has = (
                has.drop_duplicates(["_fi", "segment_id"])
                .sort_values(["_fi", "segment_id"], kind="mergesort")
            )
            dist = point_segment_dist_m_np(
                has["lon"].to_numpy(np.float64), has["lat"].to_numpy(np.float64),
                has["ax"].to_numpy(np.float64), has["ay"].to_numpy(np.float64),
                has["bx"].to_numpy(np.float64), has["by"].to_numpy(np.float64),
            )
            has["_d"] = dist
            # top-k emission candidates per fix by (dist, segment_id)
            has["_rk"] = (
                has.sort_values(["_fi", "_d", "segment_id"], kind="mergesort")
                .groupby("_fi").cumcount()
            )
            has = has[has["_rk"] < k].sort_values(
                ["_fi", "segment_id"], kind="mergesort"
            )
            seg, d = viterbi_decode_np(
                has["_fi"].to_numpy(np.int64),
                has["segment_id"].to_numpy(np.int64),
                has["start_node_id"].to_numpy(np.int64),
                has["end_node_id"].to_numpy(np.int64),
                has["_d"].to_numpy(np.float64),
                n_fix, sigma_m, trans_adj, trans_jump,
            )
        else:
            seg = np.full(n_fix, -1, dtype=np.int64)
            d = np.full(n_fix, -1.0, dtype=np.float64)
        return pd.DataFrame({
            "trace_id": np.full(n_fix, trace_id, dtype=np.int64),
            "seq": np.arange(n_fix, dtype=np.int64),
            "ts": fix_keys["ts"].to_numpy(np.int64),
            "segment_id": seg,
            "dist_m": np.round(d, 6),
        })

    return cand.groupBy("trace_id").applyInPandas(kernel, schema=MATCH_SCHEMA)
