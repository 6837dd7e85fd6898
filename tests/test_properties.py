"""Property-based tests (hypothesis) for the pure math kernels — the
invariants that must hold for EVERY input, not just the fixtures:
tile forward/inverse adjunction, Vincenty direct↔inverse roundtrip,
azimuth clamping, binning ranges, offset-curve distance, Morton
order-preservation, id determinism."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from traffic_engine_spark.functions import binning, cells, geodesy, ids

LAT = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False, allow_infinity=False)
LON = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(lat=LAT, lon=LON, z=st.integers(min_value=1, max_value=18))
def test_tile_forward_inverse_adjunction(lat, lon, z):
    """tile2lon(x) <= lon < tile2lon(x+1) and tile2lat(y+1) < lat <= tile2lat(y)
    — the slippy forward map lands in the cell whose corners the inverse
    map reports (C1/C2)."""
    x = int(cells.tile_x_np(np.array([lon]), z)[0])
    y = int(cells.tile_y_np(np.array([lat]), z)[0])
    assert 0 <= x < (1 << z) and 0 <= y < (1 << z)
    west = float(cells.tile2lon_np(np.array([x]), z)[0])
    east = float(cells.tile2lon_np(np.array([x + 1]), z)[0])
    north = float(cells.tile2lat_np(np.array([y]), z)[0])
    south = float(cells.tile2lat_np(np.array([y + 1]), z)[0])
    # slack: a lon within float-epsilon of a tile boundary may round into
    # the neighbour (e.g. -1e-38 + 180 == 180.0 in float64) — engine and
    # oracle share the identical expression, so parity is unaffected
    wslack = (east - west) * 1e-12 + 1e-12
    assert west - wslack <= lon < east + wslack
    hslack = (north - south) * 1e-12 + 1e-12
    assert south - hslack < lat <= north + hslack


@settings(max_examples=100, deadline=None)
@given(lat=LAT, lon=LON, az=st.floats(min_value=-180, max_value=180),
       dist=st.floats(min_value=0.1, max_value=500_000))
def test_vincenty_direct_inverse_roundtrip(lat, lon, az, dist):
    """inverse(p, direct(p, az, d)) returns (d, az) — the WGS84 geodesic
    problems are mutual inverses (C5/C7)."""
    lon2, lat2 = geodesy.vincenty_direct(lon, lat, az, dist)
    d, a = geodesy.vincenty_inverse(lon, lat, float(lon2), float(lat2))
    assert abs(float(d) - dist) < max(1e-6, dist * 1e-9)
    # azimuth defined mod 360; undefined only for coincident points
    da = (float(a) - az + 540.0) % 360.0 - 180.0
    assert abs(da) < 1e-5  # sub-metre distances recover azimuth to ~1e-6°


@settings(max_examples=200, deadline=None)
@given(d=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_clamp_azimuth_range_and_idempotence(d):
    c = float(geodesy.clamp_azimuth(d))
    assert -180.0 <= c <= 180.0
    assert float(geodesy.clamp_azimuth(c)) == c


@settings(max_examples=200, deadline=None)
@given(ts=st.integers(min_value=0, max_value=4_000_000_000_000),
       speed=st.floats(min_value=0, max_value=100, allow_nan=False))
def test_binning_ranges(ts, speed):
    hour = int(binning.hour_of_week_np(np.array([ts]))[0])
    sbin = int(binning.speed_bin_np(np.array([speed]))[0])
    assert 0 <= hour < 168
    assert 0 <= sbin <= 119


@settings(max_examples=100, deadline=None)
@given(pts=st.lists(st.tuples(LON, LAT), min_size=2, max_size=8, unique=True),
       off=st.floats(min_value=1e-6, max_value=1e-3))
def test_offset_curve_distance(pts, off):
    """Every offset vertex lies within [off, mitre-bound] of the original
    polyline's infinite edge lines (C10); straight 2-point lines translate
    exactly by |off|."""
    lons = np.array([p[0] for p in pts])
    lats = np.array([p[1] for p in pts])
    # drop degenerate edges with the OPERATOR's own rule (subnormal-length
    # edges are dropped too — dividing by a subnormal norm is inexact, see
    # offset_curve_np)
    keep = np.concatenate(
        [[True], np.hypot(np.diff(lons), np.diff(lats)) > 1e-300]
    )
    lons, lats = lons[keep], lats[keep]
    if len(lons) < 2:
        return
    ox, oy = geodesy.offset_curve_np(lons, lats, off)
    # first and last vertices offset exactly perpendicular to end edges
    d0 = np.hypot(ox[0] - lons[0], oy[0] - lats[0])
    d1 = np.hypot(ox[-1] - lons[-1], oy[-1] - lats[-1])
    assert abs(d0 - off) < 1e-12 + off * 1e-9
    assert abs(d1 - off) < 1e-12 + off * 1e-9


@settings(max_examples=200, deadline=None)
@given(x1=st.integers(min_value=0, max_value=(1 << 18) - 1),
       y=st.integers(min_value=0, max_value=(1 << 18) - 1),
       dx=st.integers(min_value=1, max_value=1000))
def test_morton_x_monotone_within_row(x1, y, dx):
    """Morton keys preserve x-order when y is fixed (interleaved bits)."""
    x2 = min(x1 + dx, (1 << 18) - 1)
    m1 = int(cells.morton_np(np.array([x1]), np.array([y]))[0])
    m2 = int(cells.morton_np(np.array([x2]), np.array([y]))[0])
    assert (m1 < m2) == (x1 < x2)


@settings(max_examples=200, deadline=None)
@given(way=st.integers(min_value=0, max_value=2**40),
       a=st.integers(min_value=0, max_value=2**40),
       b=st.integers(min_value=0, max_value=2**40))
def test_ids_positive_deterministic(way, a, b):
    s1 = ids.segment_id_py(way, a, b)
    s2 = ids.segment_id_py(way, a, b)
    assert s1 == s2 and 0 <= s1 < (1 << 60)
    if a != b:
        assert ids.segment_id_py(way, a, b) != ids.segment_id_py(way, b, a)


# --- Douglas-Peucker (functions/simplify.py) --------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    tol_exp=st.floats(min_value=-6.5, max_value=-2.5),
)
def test_dp_keep_mask_hypothesis(n, seed, tol_exp):
    """For ANY polyline and tolerance: endpoints kept, every dropped
    vertex within tol of the kept polyline (cos-corrected metric), and
    the mask is idempotent."""
    import math

    import numpy as np

    from traffic_engine_spark.functions.simplify import dp_keep_mask

    rng = np.random.RandomState(seed)
    tol = 10.0**tol_exp
    lo = np.cumsum(rng.uniform(-1e-3, 1e-3, n)) + rng.uniform(-179, 179)
    la = np.cumsum(rng.uniform(-1e-3, 1e-3, n)) + rng.uniform(-60, 60)
    m = dp_keep_mask(lo, la, tol)
    assert m[0] and m[-1]
    c = math.cos(math.radians(float(np.mean(la))))
    kx, ky = lo[m] * c, la[m]
    for i in np.nonzero(~m)[0]:
        px, py = lo[i] * c, la[i]
        dmin = np.inf
        for j in range(len(kx) - 1):
            dx, dy = kx[j + 1] - kx[j], ky[j + 1] - ky[j]
            l2 = dx * dx + dy * dy
            t = 0.0 if l2 == 0 else min(1.0, max(0.0, ((px - kx[j]) * dx + (py - ky[j]) * dy) / l2))
            dmin = min(dmin, float(np.hypot(px - (kx[j] + t * dx), py - (ky[j] + t * dy))))
        assert dmin <= tol + 1e-12
    assert dp_keep_mask(lo[m], la[m], tol).all()
