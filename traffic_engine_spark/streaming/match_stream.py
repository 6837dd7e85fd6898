"""Structured Streaming variant of the match pipeline (SURVEY §2.8).

The reference is a continuously-running stateful processor: per-vehicle
queues, 5-minute vehicle TTL (VehicleStates.java:18,232-245), arrival-order
pairing with no watermark.  The Spark recast:

  readStream (images) → decode → applyInPandasWithState keyed by trace_id,
  state = (last fix, pending crossings, last segment, last segment time) —
  exactly the Vehicle fields (Vehicle.java:29-39) — with processing-time
  timeout as the TTL (W4).

The kernel *shares the same state-transition code path shape* as the batch
kernel (plans/match.py); batch is the source of truth for parity tests,
and the streaming kernel is validated against batch outputs on the same
fixture (tests/test_infra.py::test_streaming_kernel_matches_batch, plus the
multi-microbatch variant that forces state round-trips mid-trace) via the
foreachBatch-free memory sink.

The anonymity gate (W3, ≥10 vehicles per tile) is implemented as the
reference's per-tile RELEASE gate (`gate_fixes_stream`: buffer a tile's
fixes until MINIMUM_VEHICLE_COUNT distinct traces were seen, then release
and pass through; never-opening tiles TTL-evict their buffer —
VehicleStates.java:188-245).  On a finite input the released row set
equals the batch `anonymity_gate` exactly (test_streaming_gate_matches_
batch); compose gate → kernel as two stages (bronze→silver) when both
stateful operators are needed in one flow.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..config import (
    MAX_PAIR_DELTA_MS_QUIRK,
    MAX_SPEED,
    MIN_SEGMENT_LEN,
    VEHICLE_INVALIDATION_TIME_MS,
    Z_ITEM,
)
from ..functions.cells import bbox_tiles_np
from ..oracle.pyoracle import intersection_distance

STREAM_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.LongType(), False),
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("time", T.LongType(), False),
        T.StructField("speed", T.DoubleType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("end_time", T.LongType(), False),
    ]
)

# state: lastPoint (ts, lat, lon), pending crossings, last segment nodes,
# last segment time — GroupState holds one tuple row.
#
# Pending crossings are (time, tripline_id, segment_id, index, dist) tuples.
# The ids are md5-derived 60-bit longs (> 2^53): they do NOT round-trip
# through float64, so the state stores them as parallel LongType arrays —
# an array<array<double>> encoding would silently corrupt every id at the
# first microbatch boundary and pending crossings would never complete.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType(), True),
        T.StructField("last_lat", T.DoubleType(), True),
        T.StructField("last_lon", T.DoubleType(), True),
        T.StructField("pend_time", T.ArrayType(T.LongType()), True),
        T.StructField("pend_tl", T.ArrayType(T.LongType()), True),
        T.StructField("pend_seg", T.ArrayType(T.LongType()), True),
        T.StructField("pend_idx", T.ArrayType(T.LongType()), True),
        T.StructField("pend_dist", T.ArrayType(T.DoubleType()), True),
        T.StructField("last_seg_start", T.LongType(), True),
        T.StructField("last_seg_end", T.LongType(), True),
        T.StructField("last_seg_time", T.LongType(), True),
    ]
)


def make_stream_kernel(tile_index: dict, tl_attrs: dict, seg_nodes: dict, jumpers: dict):
    """Build the applyInPandasWithState function over broadcastable dicts:
    tile_index: (x, y) → [tripline_id], tl_attrs: id → (segment_id, index,
    dist, lon0, lat0, lon1, lat1), seg_nodes: segment_id → (start, end),
    jumpers: (end, start) → (length, [segment_ids])."""

    def kernel(key, pdf_iter, state: GroupState):
        trace_id = key[0]
        if state.hasTimedOut:  # W4 vehicle eviction
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in STREAM_SAMPLE_SCHEMA.fields])
            return

        if state.exists:
            (last_ts, last_lat, last_lon,
             p_time, p_tl, p_seg, p_idx, p_dist, lss, lse, lst) = state.get
            pending = [
                (int(t), int(tl), int(sg), int(ix), float(d))
                for t, tl, sg, ix, d in zip(
                    p_time or [], p_tl or [], p_seg or [], p_idx or [], p_dist or []
                )
            ]
            last_seg = (lss, lse) if lss is not None else None
        else:
            last_ts = last_lat = last_lon = None
            pending, last_seg, lst = [], None, None

        out = []
        for pdf in pdf_iter:
            for r in pdf.sort_values(["ts", "image_id"]).itertuples():
                ts, lat, lon = int(r.ts), float(r.lat), float(r.lon)
                p0 = (last_ts, last_lat, last_lon) if last_ts is not None else None
                last_ts, last_lat, last_lon = ts, lat, lon
                if p0 is None:
                    continue
                if ts - p0[0] > MAX_PAIR_DELTA_MS_QUIRK:
                    continue
                if p0[1] == lat and p0[2] == lon:
                    continue
                crossings = []
                for tile in bbox_tiles_np([p0[2], lon], [p0[1], lat], Z_ITEM, margin=1):
                    for tl_id in tile_index.get(tile, ()):
                        seg_id, idx, dist, lon0, lat0, lon1, lat1 = tl_attrs[tl_id]
                        t_gps = intersection_distance((p0[2], p0[1]), (lon, lat), (lon0, lat0), (lon1, lat1))
                        if t_gps is None or t_gps < 0 or t_gps > 1:
                            continue
                        t_tl = intersection_distance((lon0, lat0), (lon1, lat1), (p0[2], p0[1]), (lon, lat))
                        if t_tl is None or t_tl < 0 or t_tl > 1:
                            continue
                        time = int((ts - p0[0]) * t_gps + p0[0])
                        crossings.append((time, tl_id, seg_id, idx, dist, tile[0], tile[1]))
                crossings.sort(key=lambda c: (c[0], c[5], c[6], c[1]))
                for c_time, tl_id, c_seg, c_idx, c_dist, _, _ in crossings:
                    last_crossing = None
                    for pc in sorted(pending):
                        if pc[2] == c_seg and pc[3] <= c_idx and abs(pc[3] - c_idx) == 1:
                            last_crossing = pc
                            pending = []
                            break
                    if c_idx == 1:
                        pending.append((c_time, tl_id, c_seg, c_idx, c_dist))
                    if last_crossing is None:
                        continue
                    if c_idx < last_crossing[3]:
                        continue
                    dt_s = (c_time - last_crossing[0]) // 1000
                    if dt_s == 0:
                        continue
                    speed = abs(c_dist - last_crossing[4]) / dt_s
                    if speed > MAX_SPEED:
                        continue
                    sample_time = int(last_crossing[0])
                    cur = seg_nodes.get(c_seg)
                    if cur is not None and last_seg is not None and last_seg[1] != cur[0]:
                        jm = jumpers.get((last_seg[1], cur[0]))
                        if jm is not None:
                            dtj = (sample_time - lst) // 1000
                            jspeed = (jm[0] + MIN_SEGMENT_LEN * 2) / dtj if dtj != 0 else float("inf")
                            for sid in jm[1]:
                                out.append((trace_id, sid, sample_time, jspeed, "jumper", c_time))
                    lst = sample_time
                    last_seg = cur
                    out.append((trace_id, c_seg, sample_time, speed, "crossing", c_time))

        state.update(
            (
                last_ts, last_lat, last_lon,
                [int(p[0]) for p in pending],
                [int(p[1]) for p in pending],
                [int(p[2]) for p in pending],
                [int(p[3]) for p in pending],
                [float(p[4]) for p in pending],
                last_seg[0] if last_seg else None,
                last_seg[1] if last_seg else None,
                lst,
            )
        )
        state.setTimeoutDuration(VEHICLE_INVALIDATION_TIME_MS)
        yield pd.DataFrame(
            out, columns=[f.name for f in STREAM_SAMPLE_SCHEMA.fields]
        )

    return kernel


def stream_speed_samples(fixes_stream: DataFrame, network_dicts) -> DataFrame:
    """fixes readStream → speed samples via per-trace stateful kernel."""
    tile_index, tl_attrs, seg_nodes, jumpers = network_dicts
    kernel = make_stream_kernel(tile_index, tl_attrs, seg_nodes, jumpers)
    return (
        fixes_stream.groupBy("trace_id")
        .applyInPandasWithState(
            kernel,
            outputStructType=STREAM_SAMPLE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def histograms_to_store_sink(store):
    """foreachBatch sink: per-microbatch speed samples → histogram
    increments → MERGE-accumulate into a SnapshotStore — the reference's
    continuously-running StatsDataStore.save loop (StatsDataStore.java:
    140-162) as a streaming upsert.  Each microbatch commits one snapshot
    (time-travel shows the running accumulation); on a finite input the
    final table state equals the batch histograms exactly
    (test_streaming_histograms_merge_store).

    Replay-safe: foreachBatch is at-least-once — a microbatch is
    re-delivered if the driver dies between the store commit and the
    streaming checkpoint commit — so the batch_id rides into the snapshot
    log as the merge's op_id and an already-applied batch is skipped
    instead of double-counted (test_streaming_store_sink_replay_safe)."""
    from ..plans.stats import histograms

    def sink(batch_df, batch_id):
        store.merge_sum(histograms(batch_df), ["n"], op_id=f"hist-batch-{batch_id}")

    return sink


def sessionize_stream(
    events: DataFrame,
    key: str = "user_id",
    ts_ms: str = "ts_ms",
    gap_ms: int = 1_800_000,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming twin of operators/relational.sessionize: per-session
    aggregates via Spark's built-in ``session_window`` over event time.

    Returns (key, n_events, first_ts, last_ts) — the session-level shape
    a streaming sink can emit (the batch operator's per-event session_id
    is not expressible incrementally without retraction).  Semantics
    parity with the batch gap rule: batch starts a new session when
    ``gap > gap_ms`` (an event at exactly prev + gap_ms stays in the
    session), while session_window merges on strictly-less-than, so the
    window gap is ``gap_ms + 1`` — batch == stream on every boundary
    (test_streaming_sessionize_matches_batch).

    ``watermark_delay`` (e.g. "30 minutes") bounds state for continuous
    streams with append output; a finite replay under complete mode needs
    none.  Works on batch DataFrames too (same code path)."""
    ev = events.withColumn("_ts", F.timestamp_millis(F.col(ts_ms).cast("long")))
    if watermark_delay is not None:
        ev = ev.withWatermark("_ts", watermark_delay)
    return (
        ev.groupBy(F.col(key), F.session_window("_ts", f"{gap_ms + 1} milliseconds"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_ms).alias("first_ts"),
            F.max(ts_ms).alias("last_ts"),
        )
        .select(key, "n_events", "first_ts", "last_ts")
    )


def offmap_traces_from_stream(
    spark, streamed_samples_pd: pd.DataFrame, segments, jumpers_pd, fixes
):
    """S9 on the streaming flow — the medallion wiring: the kernel streams
    append-mode samples into a silver table; off-map traces are the
    downstream declarative view over it (plans/match.offmap_traces is pure
    DataFrame algebra over any samples relation).  A gap row needs BOTH
    bounding crossings plus every fix between them, so an append-only
    streaming operator cannot close it incrementally without re-buffering
    all trace fixes in state — the reference itself materialises OffMapTrace
    into a store and serves it by query (OSMDataStore.java:116,156-158),
    which is exactly this bronze→silver shape.  Batch==stream parity:
    tests/test_infra.py::test_streaming_offmap_matches_batch."""
    from ..plans.match import offmap_traces

    samples = spark.createDataFrame(streamed_samples_pd, schema=STREAM_SAMPLE_SCHEMA)
    return offmap_traces(spark, samples, segments, jumpers_pd, fixes)


# ---------------------------------------------------------------------------
# W3 — streaming anonymity gate (VehicleStates.java:188-245)
# ---------------------------------------------------------------------------

GATED_FIX_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("trace_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
    ]
)

GATE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open", T.BooleanType(), True),
        T.StructField("traces", T.ArrayType(T.LongType()), True),
        T.StructField("buf_img", T.ArrayType(T.StringType()), True),
        T.StructField("buf_trace", T.ArrayType(T.LongType()), True),
        T.StructField("buf_ts", T.ArrayType(T.LongType()), True),
        T.StructField("buf_lat", T.ArrayType(T.DoubleType()), True),
        T.StructField("buf_lon", T.ArrayType(T.DoubleType()), True),
    ]
)


def gate_fixes_stream(
    fixes_stream: DataFrame, min_vehicles: int = 10, zoom: int = 11
) -> DataFrame:
    """Streaming W3: the reference's RELEASE gate (VehicleStates.java:
    188-227 — a tile's queued points process only once the tile holds
    MINIMUM_VEHICLE_COUNT vehicles; under-threshold tiles buffer and are
    TTL-evicted, :232-245).  Keyed by z11 tile: buffer fixes until
    `min_vehicles` distinct traces were seen in the tile, then release the
    buffer and pass everything through; never-opening tiles drop their
    buffer at the state TTL — on a finite input this yields exactly the
    batch `anonymity_gate` row set (test_streaming_gate_matches_batch)."""
    from ..functions.cells import tile_x_np, tile_y_np

    def kernel(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:  # tile never filled — reference eviction
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in GATED_FIX_SCHEMA.fields])
            return
        if state.exists:
            is_open, traces_raw, bi, bt, bts, bla, blo = state.get
            traces = set(int(t) for t in (traces_raw or []))
            buf = [list(bi or []), list(bt or []), list(bts or []),
                   list(bla or []), list(blo or [])]
        else:
            is_open, traces = False, set()
            buf = [[], [], [], [], []]

        out = [[], [], [], [], []]
        for pdf in pdf_iter:
            for r in pdf.itertuples():
                row = (str(r.image_id), int(r.trace_id), int(r.ts),
                       float(r.lat), float(r.lon))
                if is_open:
                    for i in range(5):
                        out[i].append(row[i])
                    continue
                traces.add(row[1])
                for i in range(5):
                    buf[i].append(row[i])
                if len(traces) >= min_vehicles:
                    is_open = True
                    for i in range(5):
                        out[i].extend(buf[i])
                        buf[i] = []
        state.update(
            (
                is_open, sorted(traces) if not is_open else [],
                buf[0], buf[1], buf[2], buf[3], buf[4],
            )
        )
        state.setTimeoutDuration(VEHICLE_INVALIDATION_TIME_MS)
        yield pd.DataFrame(
            {"image_id": out[0], "trace_id": out[1], "ts": out[2],
             "lat": out[3], "lon": out[4]}
        )

    def add_tile(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["ax"] = tile_x_np(pdf["lon"].to_numpy(), zoom)
            pdf["ay"] = tile_y_np(pdf["lat"].to_numpy(), zoom)
            yield pdf

    with_tile = fixes_stream.mapInPandas(
        add_tile,
        schema="image_id string, trace_id long, ts long, lat double, lon double, ax long, ay long",
    )
    return with_tile.groupBy("ax", "ay").applyInPandasWithState(
        kernel,
        outputStructType=GATED_FIX_SCHEMA,
        stateStructType=GATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def network_to_dicts(segments_pd, triplines_pd, jumpers_pd):
    """Pack the (small) network tables into the kernel's lookup dicts."""
    tile_index: dict = {}
    tl_attrs: dict = {}
    for r in triplines_pd.itertuples():
        tl_attrs[int(r.tripline_id)] = (
            int(r.segment_id), int(r.tripline_index), float(r.dist_m),
            float(r.lon0), float(r.lat0), float(r.lon1), float(r.lat1),
        )
        for t in bbox_tiles_np([r.lon0, r.lon1], [r.lat0, r.lat1], Z_ITEM, margin=0):
            tile_index.setdefault(t, []).append(int(r.tripline_id))
    for ids in tile_index.values():
        ids.sort()
    seg_nodes = {
        int(r.segment_id): (int(r.start_node_id), int(r.end_node_id))
        for r in segments_pd.itertuples()
    }
    jumpers = {
        (int(r.start_node_id), int(r.end_node_id)): (float(r.length_m), [int(x) for x in r.segment_ids])
        for r in jumpers_pd.itertuples()
    }
    return tile_index, tl_attrs, seg_nodes, jumpers
