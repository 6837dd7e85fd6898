"""The main pipeline (SURVEY §3.1 recast): images → decoded fixes →
lag-pairing → cell-grid spatial join → exact refine → per-trace state
machine → speed samples.

Plan shape (exactly three exchanges, SURVEY §3.1):
  (a) window shuffle on trace_id (pairing — reused by the kernel),
  (b) the J1 join — *broadcast* of the tripline cell index (no shuffle of
      the big side) when the network fits, sort-merge on cell otherwise,
  (c) the final histogram groupBy.

Hot-path discipline:
  * geotag decode is JVM regexp on `caption` — `bytes` is never read, never
    shuffled (column pruning; payload verification is a separate plan,
    plans/tiles.py).
  * J2 refine (LineSegment.intersectionDistance, geom/LineSegment.java:17-43)
    is pure column arithmetic — whole-stage-codegen'd, no UDF.
  * only the inherently-sequential J3/J4 state machine
    (Vehicle.java:139-170,250-275) runs in Python, Arrow-batched per trace.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import (
    DEFAULT_CONFIG,
    EngineConfig,
    MAX_PAIR_DELTA_MS_FIXED,
    MAX_PAIR_DELTA_MS_QUIRK,
    MAX_SPEED,
    MIN_SEGMENT_LEN,
    MINIMUM_VEHICLE_COUNT,
    Z_AREA,
    Z_ITEM,
)
from ..functions.binning import coerce_ms_col
from ..functions.cells import explode_bbox_cover, tile_x_col, tile_y_col

# ---------------------------------------------------------------------------
# stage 1 — geotag decode (caption is authoritative; FIXTURES.md §1)
# ---------------------------------------------------------------------------

CAPTION_RE = r"trace=(-?\d+);ts=(-?\d+);lat=(-?[0-9.]+);lon=(-?[0-9.]+)"


def decode_fixes(images: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """images → (image_id, trace_id, ts, lat, lon); JVM-side regexp, no UDF.

    sec→ms coercion per GPSPoint.java:28-29 happens here; tz offsetting
    (GPSPoint.offsetTime) is a join against the per-area offset dim —
    synthetic fixtures are UTC (offset 0) so it is the identity there.
    """
    decoded = images.select(
        "image_id",
        F.regexp_extract("caption", CAPTION_RE, 1).try_cast("long").alias("trace_id"),
        coerce_ms_col(F.regexp_extract("caption", CAPTION_RE, 2).try_cast("long")).alias("ts"),
        F.regexp_extract("caption", CAPTION_RE, 3).try_cast("double").alias("lat"),
        F.regexp_extract("caption", CAPTION_RE, 4).try_cast("double").alias("lon"),
    )
    # rows with unparseable geotags are dropped (ANSI-safe via try_cast)
    return decoded.filter(
        F.col("trace_id").isNotNull() & F.col("ts").isNotNull()
        & F.col("lat").isNotNull() & F.col("lon").isNotNull()
    )


# ---------------------------------------------------------------------------
# stage 2 — per-trace consecutive pairing (W1) + admissibility filters
# ---------------------------------------------------------------------------


def pair_fixes(fixes: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """lag() over (trace_id, ts) — Vehicle's per-vehicle FIFO pairing
    (Vehicle.java:104-122).  Filters: F7 first-point, F6 max-gap (µs quirk
    by default), F5 stationary."""
    w = Window.partitionBy("trace_id").orderBy("ts", "image_id")
    max_gap = MAX_PAIR_DELTA_MS_QUIRK if cfg.strict_parity else MAX_PAIR_DELTA_MS_FIXED
    pairs = (
        fixes.withColumn("seq", F.row_number().over(w) - 1)
        .withColumn("p_ts", F.lag("ts").over(w))
        .withColumn("p_lat", F.lag("lat").over(w))
        .withColumn("p_lon", F.lag("lon").over(w))
    )
    return pairs.filter(
        F.col("p_ts").isNotNull()  # F7 (Vehicle.java:110-112)
        & ((F.col("ts") - F.col("p_ts")) <= F.lit(max_gap))  # F6 (Vehicle.java:118)
        & ((F.col("lat") != F.col("p_lat")) | (F.col("lon") != F.col("p_lon")))  # F5
    )


# ---------------------------------------------------------------------------
# stage 3 — J1 cell equi-join + J2 native-column refine
# ---------------------------------------------------------------------------


def tripline_cell_index(triplines: DataFrame) -> DataFrame:
    """Explode each tripline over its z18 bbox cover tiles — the
    tileIndex build of SpatialDataStore.save (SpatialDataStore.java:72-93).
    Duplicate hits for multi-tile triplines are *preserved* (the reference
    range scan returns one hit per (tile, id) entry)."""
    return explode_bbox_cover(
        triplines,
        F.least("lon0", "lon1"), F.least("lat0", "lat1"),
        F.greatest("lon0", "lon1"), F.greatest("lat0", "lat1"),
        zoom=Z_ITEM, margin=0,
    )


def _cross(ux: Column, uy: Column, vx: Column, vy: Column) -> Column:
    return ux * vy - uy * vx


def find_crossings(
    pairs: DataFrame,
    tripline_index: DataFrame,
    broadcast_triplines: bool = True,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """GPS pair ⋈ tripline on z18 tile (±1 margin), refined by the exact
    parametric intersection — all native columns (J1+J2).

    Returns one row per crossing *occurrence* (reference duplicate-hit
    semantics), with the matched (tile_x, tile_y) kept for the kernel's
    deterministic ordering (the reference's B-tree scan order,
    SpatialDataStore.java:165-177)."""
    gps_cells = explode_bbox_cover(
        pairs,
        F.least("lon", "p_lon"), F.least("lat", "p_lat"),
        F.greatest("lon", "p_lon"), F.greatest("lat", "p_lat"),
        zoom=Z_ITEM, margin=1,
    )
    tl = F.broadcast(tripline_index) if broadcast_triplines else tripline_index
    j = gps_cells.join(tl, ["tile_x", "tile_y"], "inner")

    # J2 refine — LineSegment.intersectionDistance (LineSegment.java:17-43)
    rx, ry = F.col("lon") - F.col("p_lon"), F.col("lat") - F.col("p_lat")
    sx, sy = F.col("lon1") - F.col("lon0"), F.col("lat1") - F.col("lat0")
    rxs = _cross(rx, ry, sx, sy)
    ax, ay = F.col("lon0") - F.col("p_lon"), F.col("lat0") - F.col("p_lat")
    t_gps = _cross(ax, ay, sx / rxs, sy / rxs)
    # tripline-side parameter (GPSSegment.getCrossing runs both directions)
    sxr = _cross(sx, sy, rx, ry)
    bx, by = F.col("p_lon") - F.col("lon0"), F.col("p_lat") - F.col("lat0")
    t_tl = _cross(bx, by, rx / sxr, ry / sxr)

    refined = (
        j.withColumn("t_gps", t_gps)
        .withColumn("t_tl", t_tl)
        .filter(
            (rxs != 0)
            & F.col("t_gps").between(0.0, 1.0)
            & F.col("t_tl").between(0.0, 1.0)
        )
        .withColumn(
            "time",
            ((F.col("ts") - F.col("p_ts")).cast("double") * F.col("t_gps")
             + F.col("p_ts").cast("double")).cast("long"),  # (long) truncation
        )
    )
    return refined.select(
        "trace_id", "seq", "image_id", "time", "segment_id", "tripline_index",
        "tripline_id", F.col("dist_m").alias("dist"), "tile_x", "tile_y",
    )


# ---------------------------------------------------------------------------
# stage 4 — J3/J4 per-trace state machine (the only Python in the pipeline)
# ---------------------------------------------------------------------------

SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.LongType(), False),
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("time", T.LongType(), False),
        T.StructField("speed", T.DoubleType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)


def _trace_kernel(pdf: pd.DataFrame, seg_nodes: dict, jumpers: dict) -> pd.DataFrame:
    """Crossing→sample state machine for one trace; mirrors
    Vehicle.processVehicle:139-170 + getLastCrossingAndUpdatePendingCrossings
    (:250-275) + getAdmissibleSpeedSample (:215-248) + Jumper.getSpeedSamples
    (Jumper.java:46-57).  Ordering: (seq, time, tile_x, tile_y, tripline_id)
    = the reference's stable time-sort over the B-tree scan order."""
    pdf = pdf.sort_values(["seq", "time", "tile_x", "tile_y", "tripline_id"])
    pending: list[tuple] = []  # (time, tripline_id, segment_id, index, dist)
    last_segment = None  # (start_node, end_node)
    last_segment_time = None
    out = []
    trace_id = int(pdf["trace_id"].iloc[0]) if len(pdf) else 0
    for c in pdf.itertuples():
        c_time, c_seg, c_idx, c_dist = int(c.time), int(c.segment_id), int(c.tripline_index), float(c.dist)
        last_crossing = None
        for pc in sorted(pending):
            if pc[2] == c_seg and pc[3] <= c_idx and abs(pc[3] - c_idx) == 1:
                last_crossing = pc
                pending = []
                break
        if c_idx == 1:
            pending.append((c_time, int(c.tripline_id), c_seg, c_idx, c_dist))
        if last_crossing is None:
            continue
        if c_idx < last_crossing[3]:
            continue  # wrong direction (Vehicle.java:221-224)
        ds = abs(c_dist - last_crossing[4])
        dt_s = (c_time - last_crossing[0]) // 1000  # Java long division
        if dt_s == 0:
            continue
        speed = ds / dt_s
        if speed > MAX_SPEED:
            continue
        sample_time = last_crossing[0]
        cur_nodes = seg_nodes.get(c_seg)
        if cur_nodes is not None and last_segment is not None:
            if last_segment[1] != cur_nodes[0]:
                jm = jumpers.get((last_segment[1], cur_nodes[0]))
                if jm is not None:
                    dtj = (sample_time - last_segment_time) // 1000
                    jspeed = (jm[0] + MIN_SEGMENT_LEN * 2) / dtj if dtj != 0 else float("inf")
                    for sid in jm[1]:
                        out.append((trace_id, sid, sample_time, jspeed, "jumper"))
        last_segment_time = sample_time
        last_segment = cur_nodes
        out.append((trace_id, c_seg, sample_time, speed, "crossing"))
    return pd.DataFrame(out, columns=["trace_id", "segment_id", "time", "speed", "source"])


def speed_samples(
    spark: SparkSession,
    crossings: DataFrame,
    segments: DataFrame,
    jumpers_pd: pd.DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """applyInPandas per trace_id.  Side inputs (segment endpoint nodes +
    jumpers) ship as broadcast dicts — at planet scale these shard by z11
    area and join in as broadcast *per region bucket*."""
    seg_nodes = {
        int(r.segment_id): (int(r.start_node_id), int(r.end_node_id))
        for r in segments.select("segment_id", "start_node_id", "end_node_id").collect()
    }
    jm = {
        (int(r.start_node_id), int(r.end_node_id)): (float(r.length_m), [int(x) for x in r.segment_ids])
        for r in jumpers_pd.itertuples()
    }
    bc_seg = spark.sparkContext.broadcast(seg_nodes)
    bc_jump = spark.sparkContext.broadcast(jm)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _trace_kernel(pdf, bc_seg.value, bc_jump.value)

    return crossings.groupBy("trace_id").applyInPandas(run, schema=SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# W3 — k-anonymity / skew gate (optional, cell-level)
# ---------------------------------------------------------------------------


def anonymity_gate(fixes: DataFrame, min_vehicles: int = MINIMUM_VEHICLE_COUNT) -> DataFrame:
    """Drop fixes in z11 tiles observed by < min_vehicles distinct traces
    (VehicleStates.java:19,188-227).  A cross-key aggregate ⇒ a join
    against a groupBy(count distinct) dim, not per-key state."""
    with_tile = fixes.withColumn("ax", tile_x_col(F.col("lon"), Z_AREA)).withColumn(
        "ay", tile_y_col(F.col("lat"), Z_AREA)
    )
    counts = (
        with_tile.groupBy("ax", "ay")
        .agg(F.approx_count_distinct("trace_id").alias("n_traces"))
        .filter(F.col("n_traces") >= min_vehicles)
    )
    return with_tile.join(F.broadcast(counts.select("ax", "ay")), ["ax", "ay"], "left_semi").drop("ax", "ay")


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------


def run_pipeline(
    spark: SparkSession,
    images: DataFrame,
    triplines: DataFrame,
    segments: DataFrame,
    jumpers_pd: pd.DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
):
    """images → (crossings, samples).  The one lazy plan of SURVEY §3.1."""
    fixes = decode_fixes(images, cfg)
    if cfg.apply_anonymity_gate:
        fixes = anonymity_gate(fixes)
    pairs = pair_fixes(fixes, cfg)
    tl_index = tripline_cell_index(triplines)
    crossings = find_crossings(pairs, tl_index, cfg=cfg)
    samples = speed_samples(spark, crossings, segments, jumpers_pd, cfg)
    return crossings, samples
