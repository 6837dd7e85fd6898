"""Synthetic GPS trace simulation along the grid city (FIXTURES.md §3).

Traces are seeded random walks along street polylines, sampled at 8–20 s
intervals at 6–14 m/s with small lateral noise.  Deterministic: same seed ⇒
same fixes, independent of partitioning.  Appends the required edge-case
traces, each keyed to the reference behaviour it exercises.

Coordinates are rounded to 1e-7° (the caption's canonical precision,
FIXTURES §1) *at generation time* so the caption round-trip is lossless.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.geodesy import haversine_m
from .osm_gen import M_PER_DEG_LAT

# Monday 2023-08-07 00:00 UTC — week-aligned base for histogram spreads
BASE_TS_MS = 1_691_366_400_000


def _walk_polyline(meta, rng, start_rc, n_moves, center_bias=0.6):
    """Random walk over grid intersections; returns polyline node ids."""
    n_rows, n_cols = meta["n_rows"], meta["n_cols"]
    node_id, mid_id = meta["node_id"], meta["mid_id"]
    r, c = start_rc
    path = [int(node_id[r, c])]
    prev = None
    cr, cc = n_rows // 2, n_cols // 2
    for _ in range(n_moves):
        cand = []
        if r > 0:
            cand.append(("N", r - 1, c))
        if r < n_rows - 1:
            cand.append(("S", r + 1, c))
        if c > 0:
            cand.append(("W", r, c - 1))
        if c < n_cols - 1:
            cand.append(("E", r, c + 1))
        if prev is not None and len(cand) > 1:
            cand = [x for x in cand if (x[1], x[2]) != prev]
        # bias toward downtown (the skew hot cell, FIXTURES §3)
        weights = np.array(
            [
                center_bias if abs(rr - cr) + abs(cc2 - cc) < abs(r - cr) + abs(c - cc) else 1.0 - center_bias + 0.4
                for _, rr, cc2 in cand
            ]
        )
        weights = weights / weights.sum()
        k = rng.choice(len(cand), p=weights)
        d, nr, nc = cand[k]
        prev = (r, c)
        if d in ("E", "W"):  # horizontal moves pass through the midpoint node
            mc = min(c, nc)
            path.append(int(mid_id[(r, mc)]))
        path.append(int(node_id[nr, nc]))
        r, c = nr, nc
    return path


def _sample_fixes(meta, rng, path_nodes, t0_ms, speed_lo=6.0, speed_hi=14.0):
    """Interpolate fixes along the polyline; returns [(ts_ms, lat, lon)]."""
    pts = np.array([meta["nodes_xy"][n] for n in path_nodes])  # (k, 2) lat, lon
    lats, lons = pts[:, 0], pts[:, 1]
    seg_m = haversine_m(lons[:-1], lats[:-1], lons[1:], lats[1:])
    cum = np.concatenate([[0.0], np.cumsum(seg_m)])
    total = cum[-1]
    fixes = []
    pos, t = 0.0, float(t0_ms)
    while pos <= total:
        i = min(int(np.searchsorted(cum, pos, side="right")) - 1, len(cum) - 2)
        frac = 0.0 if seg_m[i] == 0 else (pos - cum[i]) / seg_m[i]
        lat = lats[i] + frac * (lats[i + 1] - lats[i])
        lon = lons[i] + frac * (lons[i + 1] - lons[i])
        # lateral noise ≤ ~3 m, perpendicular to travel direction
        dlat_dir = lats[i + 1] - lats[i]
        dlon_dir = lons[i + 1] - lons[i]
        norm = np.hypot(dlat_dir, dlon_dir) or 1.0
        off = rng.normal(0.0, 1.2)
        off = float(np.clip(off, -3.0, 3.0)) / M_PER_DEG_LAT
        lat += -dlon_dir / norm * off
        lon += dlat_dir / norm * off
        fixes.append((int(t), round(float(lat), 7), round(float(lon), 7)))
        dt = rng.uniform(8.0, 20.0)
        v = rng.uniform(speed_lo, speed_hi)
        pos += v * dt
        t += dt * 1000.0
    return fixes


def generate_traces(
    meta,
    seed: int = 42,
    n_traces: int = 20,
    n_moves_lo: int = 6,
    n_moves_hi: int = 14,
    edge_cases: bool = True,
) -> pd.DataFrame:
    """Returns fixes DataFrame: (trace_id, seq, ts, lat, lon).

    ``ts`` is epoch ms except the seconds-units edge trace (< 15e9 ⇒ the
    engine's sec→ms coercion path, GPSPoint.java:28-29).
    """
    rows = []

    def emit(trace_id, fixes):
        for i, (ts, lat, lon) in enumerate(fixes):
            rows.append((trace_id, i, ts, lat, lon))

    n_rows, n_cols = meta["n_rows"], meta["n_cols"]
    for t in range(n_traces):
        rng = np.random.default_rng(seed * 1_000_003 + t)
        start = (int(rng.integers(0, n_rows)), int(rng.integers(0, n_cols)))
        n_moves = int(rng.integers(n_moves_lo, n_moves_hi))
        # spread over hours of two weeks (histogram spread, FIXTURES §3)
        week = int(rng.integers(0, 2))
        hour = int(rng.integers(0, 7 * 24))
        t0 = BASE_TS_MS + week * 7 * 86_400_000 + hour * 3_600_000
        emit(t, _sample_fixes(meta, rng, _walk_polyline(meta, rng, start, n_moves), t0))

    if not edge_cases:
        df = pd.DataFrame(rows, columns=["trace_id", "seq", "ts", "lat", "lon"])
        return df.astype(
            {"trace_id": np.int64, "seq": np.int32, "ts": np.int64,
             "lat": np.float64, "lon": np.float64}
        )

    nid = meta["node_id"]
    rngE = np.random.default_rng(seed + 777)

    # E1: stationary consecutive fixes (dropped, GPSSegment.java:62-64)
    t0 = BASE_TS_MS + 26 * 3_600_000
    path = [int(nid[0, c]) for c in range(0, 3)]
    fx = _sample_fixes(meta, rngE, path, t0)
    still = [fx[0], (fx[0][0] + 15_000, fx[0][1], fx[0][2])] + [
        (ts + 15_000, la, lo) for ts, la, lo in fx[1:]
    ]
    emit(1001, still)

    # E2: time gaps — 500 s (dropped only in fixed mode) and 300,000 s
    # (dropped even under the reference's µs quirk, Vehicle.java:118)
    path = [int(nid[6, c]) for c in range(0, 4)]
    fx = _sample_fixes(meta, rngE, path, t0)
    gap = []
    for i, (ts, la, lo) in enumerate(fx):
        if i >= len(fx) // 2:
            ts += 500_000  # 500 s gap at midpoint
        if i == len(fx) - 1:
            ts += 300_000_000_000  # 300k s gap before last fix (µs-quirk trip)
        gap.append((ts, la, lo))
    emit(1002, gap)

    # E3: impossible speed pair (> 31 m/s ⇒ sample dropped, Vehicle.java:241)
    path = [int(nid[3, c]) for c in range(0, 5)]
    fx = _sample_fixes(meta, rngE, path, t0, speed_lo=6.0, speed_hi=9.0)
    fast = [(fx[0][0] + i * 2_000, la, lo) for i, (ts, la, lo) in enumerate(fx)]
    emit(1003, fast)

    # E4: seconds-unit timestamps (sec→ms coercion, GPSPoint.java:28-29)
    path = [int(nid[2, c]) for c in range(0, 6)]
    t0s = (BASE_TS_MS + 50 * 3_600_000) // 1000
    fx = _sample_fixes(meta, rngE, path, t0s * 1.0)  # positions only
    secs = [((t0s + i * 15), la, lo) for i, (ts, la, lo) in enumerate(fx)]
    emit(1004, secs)

    # E5: wrong-direction drive on the oneway row r=1 (tripline 2 before 1,
    # Vehicle.java:221-224 / Crossing.completedBy)
    path = [int(nid[1, c]) for c in range(n_cols - 1, max(n_cols - 5, 0), -1)]
    full = []
    for a, b in zip(path[:-1], path[1:]):
        full.extend([a])
    full.append(path[-1])
    fx = _sample_fixes(meta, rngE, full, t0 + 7_200_000)
    emit(1005, fx)

    # E6: straight run across the dense short-segment columns (jumper
    # gap-fill, Vehicle.java:155-162, Jumper.java:46-57)
    path = []
    r = 4
    for c in range(0, n_cols):
        path.append(int(nid[r, c]))
        if c < n_cols - 1:
            path.append(int(meta["mid_id"][(r, c)]))
    fx = _sample_fixes(meta, rngE, path, t0 + 10_800_000, speed_lo=8.0, speed_hi=10.0)
    emit(1006, fx)

    df = pd.DataFrame(rows, columns=["trace_id", "seq", "ts", "lat", "lon"])
    return df.astype(
        {"trace_id": np.int64, "seq": np.int32, "ts": np.int64, "lat": np.float64, "lon": np.float64}
    )
