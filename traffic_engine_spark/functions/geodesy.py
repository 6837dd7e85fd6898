"""Vectorised spherical geodesy — the single source of truth for distance,
bearing, destination-point and linear-referencing math.

The reference delegates to geotools' GeodeticCalculator (WGS84 ellipsoid):
  * distance      — osm/OSMDataStore.java:622-628 (getOrthodromicDistance)
  * azimuth probe — osm/OSMDataStore.java:640-662 (getBearing, ε=9e-6)
  * destination   — osm/OSMDataStore.java:594-612 (createTripLine, ±90°, 10 m)
  * azimuth clamp — osm/OSMDataStore.java:669-679

This engine standardises on great-circle (haversine) math with the WGS84
mean radius (documented deviation <0.5%; config.py).  The pytest oracle
imports *these same functions*, so engine↔oracle parity is exact by
construction.  Everything is numpy-vectorised; used from datagen, the
oracle, and inside Arrow-batched pandas UDFs (never per-row Python).
"""

from __future__ import annotations

import numpy as np

from ..config import BEARING_EPSILON_DEG, EARTH_RADIUS_M


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters (vectorised)."""
    lon1, lat1, lon2, lat2 = (np.asarray(a, dtype=np.float64) for a in (lon1, lat1, lon2, lat2))
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = p2 - p1
    dlmb = np.radians(lon2 - lon1)
    a = np.sin(dphi / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def initial_bearing_deg(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Initial great-circle bearing, degrees in (-180, 180] like geotools azimuth."""
    lon1, lat1, lon2, lat2 = (np.asarray(a, dtype=np.float64) for a in (lon1, lat1, lon2, lat2))
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dlmb = np.radians(lon2 - lon1)
    y = np.sin(dlmb) * np.cos(p2)
    x = np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dlmb)
    return np.degrees(np.arctan2(y, x))


def destination_point(lon, lat, bearing_deg, dist_m):
    """Spherical direct problem: destination (lon, lat) from start + bearing + distance."""
    lon, lat, bearing_deg, dist_m = (
        np.asarray(a, dtype=np.float64) for a in (lon, lat, bearing_deg, dist_m)
    )
    p1 = np.radians(lat)
    l1 = np.radians(lon)
    brg = np.radians(bearing_deg)
    dr = dist_m / EARTH_RADIUS_M
    p2 = np.arcsin(np.sin(p1) * np.cos(dr) + np.cos(p1) * np.sin(dr) * np.cos(brg))
    l2 = l1 + np.arctan2(
        np.sin(brg) * np.sin(dr) * np.cos(p1),
        np.cos(dr) - np.sin(p1) * np.sin(p2),
    )
    return np.degrees(l2), np.degrees(p2)


def clamp_azimuth(d):
    """Fold to (-180, 180]; mirrors OSMDataStore.clampAzimuth:669-679
    (Java % keeps the sign of the dividend — np.fmod matches)."""
    d = np.fmod(np.asarray(d, dtype=np.float64), 360.0)
    d = np.where(d > 180.0, d - 360.0, d)
    d = np.where(d < -180.0, d + 360.0, d)
    return d


# ---------------------------------------------------------------------------
# planar (degree-space) linear referencing — JTS LengthIndexedLine parity
# ---------------------------------------------------------------------------
# The reference places triplines with a JTS LengthIndexedLine whose index is
# *planar degree-space* length (osm/OSMDataStore.java:383-390), scaled by
# (planar_total / geodesic_length).  We reproduce exactly: interpolation
# happens in raw lon/lat coordinates.


def planar_lengths(lons: np.ndarray, lats: np.ndarray) -> np.ndarray:
    """Per-vertex cumulative planar length in degree units (index space)."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    seg = np.sqrt(np.diff(lons) ** 2 + np.diff(lats) ** 2)
    return np.concatenate([[0.0], np.cumsum(seg)])


def extract_point(lons: np.ndarray, lats: np.ndarray, index: float) -> tuple[float, float]:
    """JTS LengthIndexedLine.extractPoint for a single index (clamped)."""
    cum = planar_lengths(lons, lats)
    total = cum[-1]
    idx = min(max(index, 0.0), total)
    i = int(np.searchsorted(cum, idx, side="right") - 1)
    i = min(i, len(cum) - 2)
    seg_len = cum[i + 1] - cum[i]
    t = 0.0 if seg_len == 0 else (idx - cum[i]) / seg_len
    return (
        float(lons[i] + t * (lons[i + 1] - lons[i])),
        float(lats[i] + t * (lats[i + 1] - lats[i])),
    )


def bearing_at_index(lons: np.ndarray, lats: np.ndarray, index: float) -> float:
    """Two-point ε-probe bearing; mirrors OSMDataStore.getBearing:640-662."""
    cum = planar_lengths(lons, lats)
    start, end = 0.0, float(cum[-1])
    eps = BEARING_EPSILON_DEG
    if index - eps <= start:
        i0, i1 = start, start + eps
    elif index + eps >= end:
        i1, i0 = end, end - eps
    else:
        i0, i1 = index - eps / 2.0, index + eps / 2.0
    x0, y0 = extract_point(lons, lats, i0)
    x1, y1 = extract_point(lons, lats, i1)
    return float(initial_bearing_deg(x0, y0, x1, y1))


def polyline_length_m(lons: np.ndarray, lats: np.ndarray) -> float:
    """Geodesic length: sum of per-edge great-circle distances
    (mirrors the accumulation in OSMDataStore.getStreetSegments:544-556)."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    if len(lons) < 2:
        return 0.0
    return float(np.sum(haversine_m(lons[:-1], lats[:-1], lons[1:], lats[1:])))
