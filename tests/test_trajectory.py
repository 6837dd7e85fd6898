"""Trajectory near-dup: discrete Fréchet kernel vs an independent
double-loop replay, candidate generation on planted jittered copies, and
the refine's keep/drop behaviour on hand-built geometries."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from traffic_engine_spark.functions.geodesy import haversine_m
from traffic_engine_spark.functions.trajectory import discrete_frechet_m
from traffic_engine_spark.operators import trajectory as T

SF = "/root/testdata/sf0.001"


def _frechet_naive(lon_a, lat_a, lon_b, lat_b) -> float:
    """Independent replay: the textbook O(n*m) row-by-row recurrence
    (Eiter & Mannila 1994), no vectorisation, no shared code with the
    anti-diagonal kernel beyond the haversine metric itself."""
    n, m = len(lon_a), len(lon_b)
    ca = np.empty((n, m))
    for i in range(n):
        for j in range(m):
            d = float(haversine_m(lon_a[i], lat_a[i], lon_b[j], lat_b[j]))
            if i == 0 and j == 0:
                ca[i, j] = d
            elif i == 0:
                ca[i, j] = max(ca[0, j - 1], d)
            elif j == 0:
                ca[i, j] = max(ca[i - 1, 0], d)
            else:
                ca[i, j] = max(
                    min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1]), d
                )
    return float(ca[n - 1, m - 1])


def test_discrete_frechet_matches_naive_replay():
    rng = np.random.default_rng(4242)
    # hand cases first: identical polylines, and a pure parallel offset
    lon = np.array([-122.5, -122.499, -122.498])
    lat = np.array([37.5, 37.5005, 37.501])
    assert discrete_frechet_m(lon, lat, lon, lat) == 0.0
    off = float(haversine_m(-122.5, 37.5, -122.5, 37.5 + 0.001))
    got = discrete_frechet_m(lon, lat, lon, lat + 0.001)
    assert got == pytest.approx(off, rel=1e-9)
    # 30 random pairs, mixed lengths incl. degenerate 1-point traces
    for _ in range(30):
        n, m = rng.integers(1, 40, size=2)
        a_lon = -122.5 + rng.random(n) * 0.01
        a_lat = 37.5 + rng.random(n) * 0.01
        b_lon = -122.5 + rng.random(m) * 0.01
        b_lat = 37.5 + rng.random(m) * 0.01
        want = _frechet_naive(a_lon, a_lat, b_lon, b_lat)
        got = discrete_frechet_m(a_lon, a_lat, b_lon, b_lat)
        assert got == pytest.approx(want, rel=1e-12), (n, m)


def test_trace_near_dup_catches_jittered_copies(spark):
    """Every planted copy pairs with exactly its original at J >= 0.5 and
    survives the Fréchet refine with a metre-scale distance; no natural
    pair clears the candidate threshold (densest natural overlap ~0.125)."""
    from traffic_engine_spark.queries import YARDSTICKS, _traces_with_copies

    pts = _traces_with_copies(spark, SF)
    planted = {
        (int(r.trace_id), int(r.trace_id) + 1000000)
        for r in pts.filter(
            (F.col("trace_id") < 1000000) & (F.col("trace_id") % 5 == 0)
        )
        .select("trace_id")
        .distinct()
        .collect()
    }
    assert planted  # sf0.001 has 15 users -> 3 copies
    cands = YARDSTICKS["trace_near_dup"][0](spark, SF).collect()
    got = {(int(r.trace_a), int(r.trace_b)) for r in cands}
    assert got == planted
    assert all(r.jaccard >= 0.5 for r in cands)
    refined = YARDSTICKS["trace_frechet_refine"][0](spark, SF).collect()
    assert {(int(r.trace_a), int(r.trace_b)) for r in refined} == planted
    # 0.00002 deg of jitter on both axes is ~3.1 m at 37.5N
    assert all(0.0 < r.frechet_m < 5.0 for r in refined)


def test_frechet_refine_keep_and_drop(spark):
    """Hand geometries through the Spark refine: a detoured trace shares
    every cell with the straight one (candidate), but its Fréchet distance
    is the detour depth — kept when the threshold exceeds it, dropped
    when not.  The distance value itself must equal the naive replay."""
    rows = []
    base_lat, base_lon = 37.5, -122.5
    for i in range(11):
        rows.append((1, i, base_lat, base_lon + i * 0.0001))
        # same start/end, bulges 0.001 deg (~111 m) north mid-route
        bulge = 0.001 if 3 <= i <= 7 else 0.0
        rows.append((2, i, base_lat + bulge, base_lon + i * 0.0001))
    pts = spark.createDataFrame(
        rows, "trace_id long, ts_ms long, lat double, lon double"
    )
    cands = T.trace_near_dup_candidates(pts, zoom=16, min_jaccard=0.5)
    assert [(r.trace_a, r.trace_b) for r in cands.collect()] == [(1, 2)]
    a = [r for r in rows if r[0] == 1]
    b = [r for r in rows if r[0] == 2]
    want = _frechet_naive(
        np.array([r[3] for r in a]), np.array([r[2] for r in a]),
        np.array([r[3] for r in b]), np.array([r[2] for r in b]),
    )
    assert 100.0 < want < 125.0  # the bulge, in metres
    kept = T.trace_frechet_refine(pts, cands, max_frechet_m=200.0).collect()
    assert len(kept) == 1
    assert kept[0].frechet_m == pytest.approx(round(want, 6), abs=1e-6)
    dropped = T.trace_frechet_refine(pts, cands, max_frechet_m=50.0).collect()
    assert dropped == []


def test_trace_near_dup_partitioning_invariant(spark):
    """Same values at shuffle.partitions 8 vs 3 — the engine-wide
    invariance contract (tests/test_invariance.py) for the new family."""
    from traffic_engine_spark.queries import YARDSTICKS

    cur = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        a = sorted(
            tuple(r)
            for r in YARDSTICKS["trace_frechet_refine"][0](spark, SF).collect()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(
            tuple(r)
            for r in YARDSTICKS["trace_frechet_refine"][0](spark, SF).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", cur)
    assert a == b and a


def _stops_df(spark, rows):
    return spark.createDataFrame(
        rows, "trace_id long, ts_ms long, lat double, lon double, seq long"
    )


def test_detect_stops_hand_fixture(spark):
    """Gaps-and-islands semantics pinned by hand: a dwell run, a moving
    gap, a second dwell, and a duplicate-timestamp link (dt=0 -> undefined
    speed) that must BREAK a stop, exactly as PLANS.md specifies."""
    step = 0.000009  # ~1 m per 10 s -> 0.1 m/s, well under threshold
    jump = 0.01      # ~1.1 km per 10 s -> ~111 m/s, far over
    rows = [
        # trace 1: 4-point dwell, jump, 3-point dwell
        (1, 0,      37.5,                -122.5, 0),
        (1, 10_000, 37.5 + step,         -122.5, 1),
        (1, 20_000, 37.5 + 2 * step,     -122.5, 2),
        (1, 30_000, 37.5 + 3 * step,     -122.5, 3),
        (1, 40_000, 37.5 + jump,         -122.5, 4),
        (1, 50_000, 37.5 + jump + step,  -122.5, 5),
        (1, 60_000, 37.5 + jump + 2 * step, -122.5, 6),
        # trace 2: slow link, DUPLICATE ts link (undefined speed), slow link
        (2, 0,      37.6,            -122.5, 0),
        (2, 10_000, 37.6 + step,     -122.5, 1),
        (2, 10_000, 37.6 + 2 * step, -122.5, 2),
        (2, 20_000, 37.6 + 3 * step, -122.5, 3),
    ]
    out = T.detect_stops(
        _stops_df(spark, rows), max_speed_ms=1.5, min_points=2, tiebreak="seq"
    )
    got = {
        (r.trace_id, r.start_ms): (r.end_ms, r.n_points, r.duration_ms)
        for r in out.collect()
    }
    assert got == {
        (1, 0): (30_000, 4, 30_000),        # first dwell: anchor 0 -> 30 s
        (1, 40_000): (60_000, 3, 20_000),   # second dwell after the jump
        (2, 0): (10_000, 2, 10_000),        # slow link up to the dup-ts row
        (2, 10_000): (20_000, 2, 10_000),   # dup-ts link broke the run
    }
    # centroids are endpoint means in integer microdegrees
    row = [r for r in out.collect() if r.trace_id == 1 and r.start_ms == 0][0]
    want_lat = round(
        sum(round((37.5 + k * step) * 1e6) for k in (1, 2, 3)) / 3 / 1e6, 6
    )
    assert row.centroid_lat == want_lat and row.centroid_lon == -122.5
    # min_points filter drops the 2-point stops
    out3 = T.detect_stops(
        _stops_df(spark, rows), max_speed_ms=1.5, min_points=3, tiebreak="seq"
    )
    assert {(r.trace_id, r.start_ms) for r in out3.collect()} == {(1, 0), (1, 40_000)}


def test_detect_stops_partitioning_invariant(spark):
    """Same stops (values, not just counts) at shuffle.partitions 8 vs 3
    and under an adversarial pre-repartition — the island ids derive from
    the per-trace sort, never from physical layout."""
    import random

    rng = random.Random(77)
    rows = []
    for t in range(12):
        lat, ts = 37.5 + t * 0.01, 0
        for s in range(40):
            ts += rng.choice([5_000, 10_000])
            lat += rng.choice([0.000005, 0.000009, 0.002])
            rows.append((t, ts, lat, -122.5, s))
    df = _stops_df(spark, rows)
    base = T.detect_stops(df, max_speed_ms=1.5, tiebreak="seq")
    want = sorted(map(tuple, base.collect()))
    assert len(want) > 5
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        got = sorted(
            map(tuple, T.detect_stops(df.repartition(7), max_speed_ms=1.5, tiebreak="seq").collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert got == want


def test_detect_stops_single_exchange_plan(spark):
    """The whole operator — both window passes AND the island aggregate —
    rides ONE exchange: hash partitioning on trace co-locates every
    (trace, island) group, so Spark plans no second shuffle, and the two
    same-ordered windows share one in-partition sort."""
    import re

    df = spark.createDataFrame(
        [(1, 0, 37.5, -122.5, 0)],
        "trace_id long, ts_ms long, lat double, lon double, seq long",
    )
    plan = (
        T.detect_stops(df, tiebreak="seq")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange", plan)) == 1
    assert len(re.findall(r"\bSort\b", plan)) == 1


def test_trips_and_od_matrix_hand_fixture(spark):
    """Two dwells separated by a fast hop make exactly one trip whose
    depart/arrive bound the hop; OD cells come from the stop centroids."""
    step, jump = 0.000009, 0.01
    rows = []
    for t in (1, 2):  # two identical traces -> OD count 2
        base = 37.5 + (t - 1) * 0.0  # same geometry
        rows += [
            (t, 0,      base,                 -122.5, 0),
            (t, 10_000, base + step,          -122.5, 1),
            (t, 20_000, base + 2 * step,      -122.5, 2),
            (t, 40_000, base + jump,          -122.5, 3),
            (t, 50_000, base + jump + step,   -122.5, 4),
            (t, 60_000, base + jump + 2 * step, -122.5, 5),
        ]
    df = _stops_df(spark, rows)
    stops = T.detect_stops(df, max_speed_ms=1.5, min_points=3, tiebreak="seq")
    trips = T.trips_from_stops(stops, zoom=13).collect()
    assert len(trips) == 2
    for r in trips:
        assert (r.depart_ms, r.arrive_ms, r.travel_ms) == (20_000, 40_000, 20_000)
        assert r.o_lat < r.d_lat and r.o_cell != r.d_cell
    od = T.od_matrix(T.trips_from_stops(stops, zoom=13)).collect()
    assert len(od) == 1
    r = od[0]
    assert (r.n_trips, r.total_travel_ms, r.min_travel_ms, r.max_travel_ms,
            r.avg_travel_ms) == (2, 40_000, 20_000, 20_000, 20000.0)


def test_od_pipeline_two_exchanges(spark):
    """Raw points -> stops -> trips -> OD matrix plans exactly TWO
    exchanges: the trips lead-window rides the stop aggregate's trace
    partitioning (subset-satisfies), so only the final OD-pair aggregate
    adds a shuffle."""
    import re

    df = spark.createDataFrame(
        [(1, 0, 37.5, -122.5, 0)],
        "trace_id long, ts_ms long, lat double, lon double, seq long",
    )
    out = T.od_matrix(T.trips_from_stops(T.detect_stops(df, tiebreak="seq")))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange", plan)) == 2


def test_geofence_transitions_hand_fixture(spark):
    """Enter/exit/switch/start kinds pinned by hand on two square fences;
    a point stream that never changes zone emits only its start row."""
    from traffic_engine_spark.operators.spatial import (
        geofence_transitions,
        pip_assign_convex,
    )

    polys = [
        {"poly_id": 0, "coords": [(-122.5, 37.5), (-122.4, 37.5), (-122.4, 37.6), (-122.5, 37.6)]},
        {"poly_id": 1, "coords": [(-122.4, 37.5), (-122.3, 37.5), (-122.3, 37.6), (-122.4, 37.6)]},
    ]
    rows = [
        # trace 1: outside -> fence0 -> fence1 -> outside
        (1, 0,  37.55, -122.60, 0),
        (1, 10, 37.55, -122.45, 1),
        (1, 20, 37.55, -122.35, 2),
        (1, 30, 37.55, -122.20, 3),
        (1, 40, 37.55, -122.21, 4),   # still outside: no row
        # trace 2: born inside fence0, never leaves
        (2, 0,  37.55, -122.45, 0),
        (2, 10, 37.551, -122.451, 1),
    ]
    df = spark.createDataFrame(
        rows, "trace_id long, ts_ms long, lat double, lon double, seq long"
    )
    out = geofence_transitions(
        pip_assign_convex(df, polys), tiebreak="seq"
    ).collect()
    got = {(r.trace_id, r.ts_ms): (r.from_zone, r.to_zone, r.kind) for r in out}
    assert got == {
        (1, 0): (None, -1, "start"),
        (1, 10): (-1, 0, "enter"),
        (1, 20): (0, 1, "switch"),
        (1, 30): (1, -1, "exit"),
        (2, 0): (None, 0, "start"),
    }
    skip_first = geofence_transitions(
        pip_assign_convex(df, polys), tiebreak="seq", include_first=False
    ).collect()
    assert {(r.trace_id, r.ts_ms) for r in skip_first} == {(1, 10), (1, 20), (1, 30)}


def test_resample_traces_hand_fixture(spark):
    """Grid ticks, interpolation values, dup-ts links and exact-multiple
    boundaries pinned by hand at interval 10."""
    rows = [
        (1, 5,  10.0, 100.0, 0),
        (1, 25, 30.0, 120.0, 1),   # ticks 10, 20 inside (5, 25]
        (1, 25, 99.0, 999.0, 2),   # dup ts: no ticks, never duplicates
        (1, 30, 40.0, 130.0, 3),   # tick 30 == cur_ts exactly (closed above)
        (2, 10, 1.0, 1.0, 0),
        (2, 20, 2.0, 2.0, 1),      # tick 20 only: (10, 20] excludes 10
    ]
    df = _stops_df(spark, rows)
    out = T.resample_traces(df, interval_ms=10, tiebreak="seq")
    got = {(r.trace_id, r.tick_ms): (r.lat, r.lon) for r in out.collect()}
    assert got == {
        (1, 10): (10.0 + 20.0 * (5 / 20), 100.0 + 20.0 * (5 / 20)),
        (1, 20): (10.0 + 20.0 * (15 / 20), 100.0 + 20.0 * (15 / 20)),
        (1, 30): (40.0, 130.0),  # frac = 1 at the closing endpoint
        (2, 20): (2.0, 2.0),
    }
    # every tick is a grid multiple; count matches the span partition
    assert all(t % 10 == 0 for (_, t) in got)


def test_resample_traces_no_shuffle_after_window(spark):
    """One exchange total: the Generate (sequence explode) is narrow."""
    import re

    df = spark.createDataFrame(
        [(1, 0, 37.5, -122.5, 0)],
        "trace_id long, ts_ms long, lat double, lon double, seq long",
    )
    plan = (
        T.resample_traces(df, interval_ms=10, tiebreak="seq")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange", plan)) == 1
    assert "Generate" in plan


def test_trace_features_hand_fixture_and_plan(spark):
    """Feature values verified against an independent numpy replay on a
    small random set; plan pinned to ONE exchange and ZERO joins."""
    import math
    import re
    import random

    from traffic_engine_spark.functions.cells import cell_pack_np, tile_x_np, tile_y_np

    def cell_of(la, lo, z):
        return int(cell_pack_np(
            tile_x_np(np.array([lo]), z), tile_y_np(np.array([la]), z), z)[0])

    rng = random.Random(99)
    rows = []
    for t in range(6):
        for s in range(rng.randint(1, 15)):
            rows.append(
                (t, s * 1000,
                 37.5 + rng.randint(0, 40) * 0.001,
                 -122.5 + rng.randint(0, 40) * 0.001, s)
            )
    df = _stops_df(spark, rows)
    out = T.trace_features(df, zoom=15, tiebreak="seq")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange", plan)) == 1
    assert "Join" not in plan

    got = {r.trace_id: r for r in out.collect()}
    for t in range(6):
        pts = sorted([r for r in rows if r[0] == t], key=lambda r: (r[1], r[4]))
        lats = [p[2] for p in pts]; lons = [p[3] for p in pts]
        n = len(pts)
        total = 0
        for i in range(1, n):
            total += math.floor(
                float(haversine_m(lons[i - 1], lats[i - 1], lons[i], lats[i])) * 1000 + 0.5
            )
        c_lat = sum(math.floor(x * 1e6 + 0.5) for x in lats) / n / 1e6
        c_lon = sum(math.floor(x * 1e6 + 0.5) for x in lons) / n / 1e6
        dev2 = sum(
            math.floor(float(haversine_m(c_lon, c_lat, lons[i], lats[i])) ** 2 * 1000 + 0.5)
            for i in range(n)
        )
        cells = {}
        for la, lo in zip(lats, lons):
            cells[cell_of(la, lo, 15)] = cells.get(cell_of(la, lo, 15), 0) + 1
        clogc = sum(math.floor(c * math.log2(c) * 1e9 + 0.5) for c in cells.values())
        r = got[t]
        assert r.n_points == n and r.total_mm == total
        assert r.span_ms == pts[-1][1] - pts[0][1]
        assert r.n_cells == len(cells)
        assert r.rog_m == round(math.sqrt(dev2 / n / 1e3), 6)
        assert r.cell_entropy == round(math.log2(n) - clogc / 1e9 / n, 6)


def test_colocation_pairs_fixture_and_cap(spark):
    """Planted co-presence found; bucket boundary straddle missed (the
    documented fixed-grid approximation); hot-slot cap only removes."""
    B = 1000
    rows = [
        # users 1,2 share (cellX, bucket0) twice -> n_cobuckets 2
        (1, 0,      37.5, -122.5, 0),
        (2, 100,    37.5, -122.5, 0),
        (1, B + 10, 37.5, -122.5, 1),
        (2, B + 20, 37.5, -122.5, 1),
        # users 3,4: same cell but adjacent buckets -> no pair
        (3, B - 1,  37.9, -122.1, 0),
        (4, B + 1,  37.9, -122.1, 0),
        # users 5,6,7 pile into one slot -> 3 pairs, or 0 with cap=2
        (5, 0, 37.7, -122.3, 0),
        (6, 0, 37.7, -122.3, 0),
        (7, 0, 37.7, -122.3, 0),
        # duplicate pings of user 1 in bucket 0 must not inflate the count
        (1, 50, 37.5, -122.5, 9),
    ]
    df = _stops_df(spark, rows)
    out = T.colocation_pairs(df, zoom=16, bucket_ms=B)
    got = {(r.trace_a, r.trace_b): r.n_cobuckets for r in out.collect()}
    assert got == {(1, 2): 2, (5, 6): 1, (5, 7): 1, (6, 7): 1}
    capped = T.colocation_pairs(df, zoom=16, bucket_ms=B, max_traces_per_bucket=2)
    got_c = {(r.trace_a, r.trace_b): r.n_cobuckets for r in capped.collect()}
    assert got_c == {(1, 2): 2}  # the 3-trace slot is dropped, nothing else
