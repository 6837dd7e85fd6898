"""Trajectory distance kernels (numpy, Arrow-batch friendly).

Discrete Fréchet distance (Eiter & Mannila 1994, "Computing discrete
Fréchet distance", TR CD-TR 94/64): the min-over-couplings max-link
distance between two point sequences — the standard trajectory
near-duplicate refine metric (two recordings of the same trip with GPS
jitter have a tiny Fréchet distance; two trips that merely share road
cells do not).

The DP here is vectorised over ANTI-DIAGONALS: every cell of diagonal
``k = i + j`` depends only on diagonals ``k-1`` (up / left) and ``k-2``
(diagonal), so each wavefront is one numpy expression — O(n+m) Python
iterations instead of O(n·m), the same trick used for vectorised edit
distance.  Point-to-point distances are haversine metres on the shared
sphere radius (functions/geodesy.py), computed as one broadcast n×m
matrix per pair.

Reference tie-in: opentraffic/traffic-engine stores off-map traces for
later analysis (OffMapTrace, data/OffMapTrace.java) but has no
trace-similarity operator; this kernel is the scale tool for deduping
that corpus (SURVEY §2.9 extension family, like the document dedup ops).
"""

from __future__ import annotations

import numpy as np

from .geodesy import haversine_m


def discrete_frechet_m(
    lon_a: np.ndarray,
    lat_a: np.ndarray,
    lon_b: np.ndarray,
    lat_b: np.ndarray,
) -> float:
    """Discrete Fréchet distance in metres between two polylines.

    Inputs are 1-D coordinate arrays in visit order (already sorted by
    timestamp upstream).  Empty inputs are a caller error — the operator
    filters zero-point traces before invoking the kernel.
    """
    a_lon = np.asarray(lon_a, dtype=np.float64)
    a_lat = np.asarray(lat_a, dtype=np.float64)
    b_lon = np.asarray(lon_b, dtype=np.float64)
    b_lat = np.asarray(lat_b, dtype=np.float64)
    n, m = a_lon.shape[0], b_lon.shape[0]
    if n == 0 or m == 0:
        raise ValueError("discrete_frechet_m: empty polyline")
    # one broadcast distance matrix per pair; trace lengths are bounded
    # (the per-vehicle state assumption the reference's matcher also
    # makes), so n*m stays executor-memory-sized
    d = haversine_m(
        a_lon[:, None], a_lat[:, None], b_lon[None, :], b_lat[None, :]
    )
    inf = np.inf
    prev = np.full(n, inf)  # diagonal k-1, indexed by i
    prev2 = np.full(n, inf)  # diagonal k-2, indexed by i
    cur = np.full(n, inf)
    for k in range(n + m - 1):
        i_lo = max(0, k - m + 1)
        i_hi = min(n - 1, k)  # inclusive
        idx = np.arange(i_lo, i_hi + 1)
        dk = d[idx, k - idx]
        up = np.where(idx > 0, prev[np.maximum(idx - 1, 0)], inf)
        left = np.where(idx < k, prev[idx], inf)
        diag = np.where(
            (idx > 0) & (idx < k), prev2[np.maximum(idx - 1, 0)], inf
        )
        best = np.minimum(np.minimum(up, left), diag)
        vals = np.where(np.isinf(best), dk, np.maximum(dk, best))
        cur.fill(inf)
        cur[idx] = vals
        prev2, prev, cur = prev, cur, prev2
    return float(prev[n - 1])
