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
    INTERSECTION_MARGIN_METERS,
    MAX_PAIR_DELTA_MS_FIXED,
    MAX_PAIR_DELTA_MS_QUIRK,
    MAX_SPEED,
    MIN_SEGMENT_LEN,
    MINIMUM_VEHICLE_COUNT,
    Z_AREA,
    Z_ITEM,
)
from ..functions.binning import coerce_ms_col
from ..functions.ids import tripline_id_py
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
    # split-based parse (one split, no per-field regex — measurably cheaper
    # than 4× regexp_extract on the hot path; format is canonical)
    parts = F.split(F.col("caption"), ";")
    field = lambda i: F.substring_index(F.element_at(parts, i + 1), "=", -1)  # noqa: E731
    decoded = images.select(
        "image_id",
        field(0).try_cast("long").alias("trace_id"),
        coerce_ms_col(field(1).try_cast("long")).alias("ts"),
        field(2).try_cast("double").alias("lat"),
        field(3).try_cast("double").alias("lon"),
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
    # narrow the probe row before the ~20× cover explode: every byte here is
    # multiplied by the fan-out (image_id in particular is dead weight — the
    # kernel keys on (trace_id, seq))
    probe = pairs.select(
        "trace_id", "seq", "ts", "p_ts", "lat", "lon", "p_lat", "p_lon"
    )
    gps_cells = explode_bbox_cover(
        probe,
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
        "trace_id", "seq", "time", "segment_id", "tripline_index",
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


def speed_samples(
    spark: SparkSession,
    crossings: DataFrame,
    segments: DataFrame,
    jumpers_pd: pd.DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Partition-streaming kernel: repartition by trace_id +
    sortWithinPartitions, then ONE mapInPandas pass that streams rows in
    order, resetting state at trace boundaries.  Semantically identical to
    a per-trace applyInPandas, but without the per-group pandas-frame
    overhead (traces are small — grouped-map was ~20× slower at 64k
    traces).  State carries across Arrow batch boundaries, so batch size
    does not affect results.

    Side inputs (segment endpoint nodes + jumpers) ship as broadcast dicts
    — at planet scale these shard by z11 area and join in as broadcast
    *per region bucket*."""
    seg_nodes = {}
    tl_attrs = {}  # packed (idx<<60 | segment_id) → (tripline_id, dist)
    for r in segments.select(
        "segment_id", "start_node_id", "end_node_id", "length_m"
    ).collect():
        sid = int(r.segment_id)
        seg_nodes[sid] = (int(r.start_node_id), int(r.end_node_id))
        if float(r.length_m) > MIN_SEGMENT_LEN:
            tl_attrs[(1 << 60) | sid] = (tripline_id_py(sid, 1), INTERSECTION_MARGIN_METERS)
            tl_attrs[(2 << 60) | sid] = (
                tripline_id_py(sid, 2), float(r.length_m) - INTERSECTION_MARGIN_METERS,
            )
    jm = {
        (int(r.start_node_id), int(r.end_node_id)): (float(r.length_m), [int(x) for x in r.segment_ids])
        for r in jumpers_pd.itertuples()
    }
    bc_seg = spark.sparkContext.broadcast(seg_nodes)
    bc_tl = spark.sparkContext.broadcast(tl_attrs)
    bc_jump = spark.sparkContext.broadcast(jm)

    n_part = spark.sparkContext.defaultParallelism * 4  # explicit: AQE would
    # coalesce by byte size and starve the Python stage of parallelism
    packed = F.shiftleft(F.col("tripline_index").cast("long"), 60) + F.col("segment_id")
    arranged = (
        crossings.select(
            "trace_id", "seq", "time", "segment_id", "tripline_index",
            "tripline_id", "tile_x", "tile_y", packed.alias("packed"),
        )
        .repartition(n_part, "trace_id")
        .sortWithinPartitions("trace_id", "seq", "time", "tile_x", "tile_y", "tripline_id")
        # ordering established — project everything but the 3-column payload
        # away so it never crosses the Arrow boundary
        .select("trace_id", "time", "packed")
    )

    def run(batches):
        seg_map, jump_map, tl_map = bc_seg.value, bc_jump.value, bc_tl.value
        seg_mask = (1 << 60) - 1
        state_trace = None
        pending: list[tuple] = []
        last_segment = None
        last_segment_time = None
        out_trace: list[int] = []
        out_seg: list[int] = []
        out_time: list[int] = []
        out_speed: list[float] = []
        out_src: list[str] = []

        for pdf in batches:
            # tolist(): one C pass to native python scalars — per-element
            # numpy→int conversion in the loop is ~3× slower
            tr = pdf["trace_id"].to_numpy().tolist()
            tm = pdf["time"].to_numpy().tolist()
            pk = pdf["packed"].to_numpy().tolist()
            for i in range(len(tr)):
                trace = tr[i]
                if trace != state_trace:
                    state_trace = trace
                    pending = []
                    last_segment = None
                    last_segment_time = None
                c_time = tm[i]
                p = pk[i]
                c_seg = p & seg_mask
                c_idx = p >> 60
                c_tlid, c_dist = tl_map[p]
                last_crossing = None
                if pending:
                    it = pending if len(pending) == 1 else sorted(pending)
                    for pc in it:
                        if pc[2] == c_seg and pc[3] <= c_idx and abs(pc[3] - c_idx) == 1:
                            last_crossing = pc
                            pending = []
                            break
                if c_idx == 1:
                    pending.append((c_time, c_tlid, c_seg, c_idx, c_dist))
                if last_crossing is None:
                    continue
                if c_idx < last_crossing[3]:
                    continue  # wrong direction (Vehicle.java:221-224)
                dt_s = (c_time - last_crossing[0]) // 1000  # Java long division
                if dt_s == 0:
                    continue
                speed = abs(c_dist - last_crossing[4]) / dt_s
                if speed > MAX_SPEED:
                    continue
                sample_time = last_crossing[0]
                cur_nodes = seg_map.get(c_seg)
                if cur_nodes is not None and last_segment is not None and last_segment[1] != cur_nodes[0]:
                    jmp = jump_map.get((last_segment[1], cur_nodes[0]))
                    if jmp is not None:
                        dtj = (sample_time - last_segment_time) // 1000
                        jspeed = (jmp[0] + MIN_SEGMENT_LEN * 2) / dtj if dtj != 0 else float("inf")
                        for sid in jmp[1]:
                            out_trace.append(trace); out_seg.append(sid)
                            out_time.append(sample_time); out_speed.append(jspeed)
                            out_src.append("jumper")
                last_segment_time = sample_time
                last_segment = cur_nodes
                out_trace.append(trace); out_seg.append(c_seg)
                out_time.append(sample_time); out_speed.append(speed)
                out_src.append("crossing")
            if len(out_trace) >= 65536:
                yield pd.DataFrame(
                    {"trace_id": out_trace, "segment_id": out_seg, "time": out_time,
                     "speed": out_speed, "source": out_src}
                )
                out_trace, out_seg, out_time, out_speed, out_src = [], [], [], [], []
        if out_trace:
            yield pd.DataFrame(
                {"trace_id": out_trace, "segment_id": out_seg, "time": out_time,
                 "speed": out_speed, "source": out_src}
            )

    return arranged.mapInPandas(run, schema=SAMPLE_SCHEMA)


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
        .agg(F.countDistinct("trace_id").alias("n_traces"))  # exact: the
        # gate must be deterministic across runs/partitionings (north rule);
        # tile cardinality is low so exact distinct is cheap
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
