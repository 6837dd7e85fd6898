"""Pure-numpy Viterbi map-matching core (no Spark dependencies).

The north rule names "a per-trace Viterbi/HMM map-matching kernel runs
inside applyInPandas groups".  The PARITY pipeline (plans/match.py)
deliberately implements the reference's tripline-crossing state machine
instead — the correctness gate is exact equality with the reference,
whose matcher is not an HMM (Vehicle.processVehicle walks tripline
crossings, Vehicle.java:105-290).  This module supplies the named
Viterbi kernel as an ADDITIONAL operator (plans/hmm.py): the classic
Newson & Krumm (2009) shape — Gaussian emission on point→segment
distance, transition preferring segment continuity — decoded exactly per
trace.

Shared between the Spark kernel and the single-threaded test oracle so
both sides are bit-identical float64; the CANDIDATE PAIRING and the
orchestration around this core are implemented independently on each
side and verified by exact-match tests.
"""

from __future__ import annotations

import numpy as np

# metres per degree of latitude (spherical mean radius 6 371 000 m)
M_PER_DEG = 111_194.92664455873  # = pi * 6_371_000 / 180

# candidate-pairing zoom: z18 tiles are ~150 m at mid latitudes, so the
# ±1-ring reach (~450 m) is generous against the σ=25 m emission while
# keeping per-cell segment fan-out city-block-bounded (z16 was measured
# to blow the candidate join up ~10× at bench scale)
Z_HMM = 18


def point_segment_dist_m_np(
    plon: np.ndarray, plat: np.ndarray,
    ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray,
) -> np.ndarray:
    """Vectorised equirectangular point→segment distance in metres.

    Projection plane is anchored at each POINT's latitude (the error of a
    shared cos over a ~200 m segment is sub-millimetre).  Endpoints of a
    zero-length segment degrade to point distance.  float64 throughout —
    the oracle calls this same function scalar-wise, so engine and oracle
    distances are bit-equal.
    """
    plon = np.asarray(plon, dtype=np.float64)
    plat = np.asarray(plat, dtype=np.float64)
    kx = np.cos(np.radians(plat)) * M_PER_DEG
    px = plon * kx
    py = plat * M_PER_DEG
    axm, aym = np.asarray(ax, np.float64) * kx, np.asarray(ay, np.float64) * M_PER_DEG
    bxm, bym = np.asarray(bx, np.float64) * kx, np.asarray(by, np.float64) * M_PER_DEG
    dx, dy = bxm - axm, bym - aym
    den = dx * dx + dy * dy
    t = np.where(den > 0.0, ((px - axm) * dx + (py - aym) * dy) / np.where(den > 0.0, den, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = axm + t * dx, aym + t * dy
    return np.hypot(px - cx, py - cy)


def viterbi_decode_np(
    cand_fix: np.ndarray,      # int64, candidate -> fix index (0..n_fix-1), fix-major sorted
    cand_seg: np.ndarray,      # int64 segment_id per candidate
    cand_start: np.ndarray,    # int64 start_node_id per candidate
    cand_end: np.ndarray,      # int64 end_node_id per candidate
    cand_dist: np.ndarray,     # float64 point->segment metres per candidate
    n_fix: int,
    sigma_m: float = 25.0,
    trans_adj: float = 1.0,
    trans_jump: float = 10.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact Viterbi decode over per-fix candidate sets.

    emission(c)   = (dist/sigma)^2 / 2           (Gaussian log-likelihood)
    transition    = 0 same segment; trans_adj if the segments share a
                    node (undirected adjacency); trans_jump otherwise
    tie-break     = candidates are processed in ascending segment_id per
                    fix, and argmin takes the FIRST minimum, so every tie
                    resolves to the lowest segment_id deterministically.

    Fixes with no candidates get segment_id -1 / dist -1.0 and are
    SKIPPED by the chain (the DP links the previous candidate-bearing fix
    directly to the next one).  Returns (chosen_seg[n_fix],
    chosen_dist[n_fix]).
    """
    chosen_seg = np.full(n_fix, -1, dtype=np.int64)
    chosen_dist = np.full(n_fix, -1.0, dtype=np.float64)
    # fix -> candidate slice (candidates must arrive fix-major, and
    # ascending segment_id within a fix).
    # NOTE: this per-trace decode is the REFERENCE (the test oracle calls
    # it scalar-wise).  The Spark kernel uses `viterbi_decode_batch_np`,
    # which runs the same recurrence in trace-lockstep — bit-identical by
    # construction (identical elementwise float ops, first-minimum
    # argmins, +inf padding that can never be selected) and pinned equal
    # by test_viterbi_batch_matches_per_trace.
    slices: list[tuple[int, int]] = []
    starts = np.searchsorted(cand_fix, np.arange(n_fix), side="left")
    ends = np.searchsorted(cand_fix, np.arange(n_fix), side="right")
    active = [i for i in range(n_fix) if ends[i] > starts[i]]
    if not active:
        return chosen_seg, chosen_dist

    prev_cost: np.ndarray | None = None
    prev_slice: tuple[int, int] | None = None
    back: list[np.ndarray] = []      # per active fix: argmin prev candidate
    for i in active:
        lo, hi = int(starts[i]), int(ends[i])
        emis = (cand_dist[lo:hi] / sigma_m) ** 2 / 2.0
        if prev_cost is None:
            cost = emis
            back.append(np.full(hi - lo, -1, dtype=np.int64))
        else:
            plo, phi = prev_slice
            same = cand_seg[lo:hi][:, None] == cand_seg[plo:phi][None, :]
            adj = (
                (cand_start[lo:hi][:, None] == cand_start[plo:phi][None, :])
                | (cand_start[lo:hi][:, None] == cand_end[plo:phi][None, :])
                | (cand_end[lo:hi][:, None] == cand_start[plo:phi][None, :])
                | (cand_end[lo:hi][:, None] == cand_end[plo:phi][None, :])
            )
            trans = np.where(same, 0.0, np.where(adj, trans_adj, trans_jump))
            total = prev_cost[None, :] + trans
            arg = np.argmin(total, axis=1)
            cost = emis + total[np.arange(hi - lo), arg]
            back.append(arg)
        prev_cost, prev_slice = cost, (lo, hi)
        slices.append((lo, hi))
    # backtrack from the best terminal candidate
    c = int(np.argmin(prev_cost))
    for k in range(len(active) - 1, -1, -1):
        lo, hi = slices[k]
        chosen_seg[active[k]] = cand_seg[lo + c]
        chosen_dist[active[k]] = cand_dist[lo + c]
        c = int(back[k][c])
    return chosen_seg, chosen_dist


def viterbi_decode_batch_np(
    cand_fix: np.ndarray,      # int64, candidate -> PARTITION-GLOBAL fix index, fix-major sorted
    cand_seg: np.ndarray,      # int64 segment_id per candidate
    cand_start: np.ndarray,    # int64 start_node_id per candidate
    cand_end: np.ndarray,      # int64 end_node_id per candidate
    cand_dist: np.ndarray,     # float64 point->segment metres per candidate
    n_fix: int,
    trace_starts: np.ndarray,  # int64 first fix index per trace (ascending)
    trace_ends: np.ndarray,    # int64 one-past-last fix index per trace
    k: int,
    sigma_m: float = 25.0,
    trans_adj: float = 1.0,
    trans_jump: float = 10.0,
) -> tuple[np.ndarray, np.ndarray]:
    """`viterbi_decode_np` for EVERY trace of a partition at once.

    The per-trace decode spends its time in Python overhead: ~10 numpy
    calls on <=k-by-k arrays per fix (measured 19.5 s single-threaded for
    8000 bench traces vs ~3 s of actual arithmetic).  This runs the SAME
    recurrence in trace-lockstep — one vectorised step over all traces'
    s-th active fix — with bit-identical results:

    * every elementwise float op (emission, prev_cost + trans, cost
      select) is the same op on the same values in the same order;
    * candidate matrices are padded to width k with +inf emission and a
      -2 id sentinel; an inf-cost column can never win an argmin against
      a real candidate and pads sit AFTER real columns, so every
      first-minimum argmin resolves exactly as in the ragged version;
    * fixes with no candidates are skipped by the chain exactly as in
      the per-trace decode (active fixes of a trace are contiguous rows
      here, so "previous active fix" is literally row-1).

    Pinned equal to the per-trace reference by
    test_viterbi_batch_matches_per_trace.  Returns (chosen_seg[n_fix],
    chosen_dist[n_fix]) with -1 / -1.0 for undecided fixes.
    """
    chosen_seg = np.full(n_fix, -1, dtype=np.int64)
    chosen_dist = np.full(n_fix, -1.0, dtype=np.float64)
    m = len(cand_fix)
    if m == 0:
        return chosen_seg, chosen_dist
    starts_f = np.searchsorted(cand_fix, np.arange(n_fix), side="left")
    ends_f = np.searchsorted(cand_fix, np.arange(n_fix), side="right")
    counts = ends_f - starts_f
    af = np.flatnonzero(counts > 0)  # active fixes, (trace, step) order
    if not len(af):
        return chosen_seg, chosen_dist
    n_af = len(af)
    af_trace = np.searchsorted(trace_starts, af, side="right") - 1
    first_of_trace = np.ones(n_af, dtype=bool)
    first_of_trace[1:] = af_trace[1:] != af_trace[:-1]
    trace_row0 = np.maximum.accumulate(
        np.where(first_of_trace, np.arange(n_af), 0)
    )
    af_step = np.arange(n_af) - trace_row0

    kw = int(min(k, counts[af].max()))
    col = np.arange(kw)
    idx = np.minimum(starts_f[af][:, None] + col[None, :], m - 1)
    valid = col[None, :] < counts[af][:, None]
    segM = np.where(valid, cand_seg[idx], -2)
    startM = np.where(valid, cand_start[idx], -2)
    endM = np.where(valid, cand_end[idx], -3)  # -2 != -3: pads never adjacent
    distM = np.where(valid, cand_dist[idx], 0.0)
    emisM = np.where(valid, (cand_dist[idx] / sigma_m) ** 2 / 2.0, np.inf)

    cost = np.empty((n_af, kw), dtype=np.float64)
    back = np.full((n_af, kw), -1, dtype=np.int64)
    # rows grouped by step (stable: trace order preserved within a step)
    step_order = np.argsort(af_step, kind="stable")
    step_sorted = af_step[step_order]
    step_bounds = np.flatnonzero(
        np.r_[True, step_sorted[1:] != step_sorted[:-1]]
    )
    step_bounds = np.append(step_bounds, n_af)
    for si in range(len(step_bounds) - 1):
        rows = step_order[step_bounds[si] : step_bounds[si + 1]]
        s = int(step_sorted[step_bounds[si]])
        if s == 0:
            cost[rows] = emisM[rows]
            continue
        prev = rows - 1  # previous active fix of the same trace
        same = segM[rows][:, :, None] == segM[prev][:, None, :]
        adj = (
            (startM[rows][:, :, None] == startM[prev][:, None, :])
            | (startM[rows][:, :, None] == endM[prev][:, None, :])
            | (endM[rows][:, :, None] == startM[prev][:, None, :])
            | (endM[rows][:, :, None] == endM[prev][:, None, :])
        )
        trans = np.where(same, 0.0, np.where(adj, trans_adj, trans_jump))
        total = cost[prev][:, None, :] + trans
        arg = np.argmin(total, axis=2)
        cost[rows] = emisM[rows] + np.take_along_axis(
            total, arg[:, :, None], axis=2
        )[:, :, 0]
        back[rows] = arg

    # backtrack: walk each trace's rows last -> first, all traces at once
    last_rows = np.flatnonzero(
        np.r_[first_of_trace[1:], True]
    )  # last af row per trace with >=1 active fix
    trace_len = last_rows - trace_row0[last_rows] + 1
    c = np.argmin(cost[last_rows], axis=1)
    max_len = int(trace_len.max())
    for o in range(max_len):
        live = trace_len > o
        rows_o = last_rows[live] - o
        cl = c[live]
        fx = af[rows_o]
        chosen_seg[fx] = segM[rows_o, cl]
        chosen_dist[fx] = distM[rows_o, cl]
        c[live] = back[rows_o, cl]
    return chosen_seg, chosen_dist
