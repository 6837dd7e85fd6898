"""Planar point-in-polygon (even-odd ray casting), vectorised over points.

Shared by the engine (operators/spatial.pip_assign_winding, the J7 shape of
TimeConverter.getZoneIdForCoord, data/TimeConverter.java:141-170) and the
pytest oracle — identical float code on both sides, so engine↔oracle parity
is exact by construction (same principle as functions/geodesy.py).
"""

from __future__ import annotations

import numpy as np


def even_odd_inside_np(px: np.ndarray, py: np.ndarray,
                       lons: np.ndarray, lats: np.ndarray) -> np.ndarray:
    """Even-odd rule for one simple polygon, vectorised over (px, py)."""
    inside = np.zeros(len(px), dtype=bool)
    j = len(lons) - 1
    for i in range(len(lons)):
        cond = (lats[i] > py) != (lats[j] > py)
        denom = lats[j] - lats[i]
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (lons[j] - lons[i]) * (py - lats[i]) / denom + lons[i]
        inside ^= cond & (px < xint)
        j = i
    return inside


def assign_polys_np(px: np.ndarray, py: np.ndarray,
                    polys: list[tuple[int, np.ndarray, np.ndarray]]) -> np.ndarray:
    """First-match-wins assignment over polygons ordered by poly_id;
    unmatched points get -1 (TimeConverter's null-zone fallthrough)."""
    assign = np.full(len(px), -1, dtype=np.int32)
    for poly_id, lons, lats in sorted(polys, key=lambda p: p[0], reverse=True):
        inside = even_odd_inside_np(px, py, lons, lats)
        assign = np.where(inside, poly_id, assign)
    return assign
