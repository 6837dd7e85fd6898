"""Synthetic OSM grid city (FIXTURES.md §2) — deterministic, seeded.

Produces ``osm_nodes(node_id, lat, lon)`` and
``osm_ways(way_id, nodes: list[int], tags: dict)`` as pandas DataFrames.

Designed to exercise every network-build path of the reference:
  * all highway classes incl. footway (excluded, StreetSegment.java:92-119)
    and a tagless way (NON_ROADWAY);
  * oneway / junction=roundabout (StreetSegment.java:86-90);
  * interior (non-intersection) vertices → multi-point segments;
  * dense columns spaced < MIN_SEGMENT_LEN → jumpers, incl. chains that
    must merge (JumperDataStore.java:59-111);
  * a way referencing a missing node → skipped (OSMUtils.java:40-42);
  * the city straddles a z11 tile boundary in longitude.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

M_PER_DEG_LAT = 111_320.0

# city origin: placed exactly on a z11 tile boundary so traces span two
# z11 areas (FIXTURES §3).  z11 x=329 boundary: lon = 329/2048*360-180.
CITY_LAT0 = 37.760
CITY_LON0 = 329.0 / 2048.0 * 360.0 - 180.0  # = -122.16796875


def _m_to_deg(lat: float, dx_m: float, dy_m: float) -> tuple[float, float]:
    return (
        dx_m / (M_PER_DEG_LAT * np.cos(np.radians(lat))),
        dy_m / M_PER_DEG_LAT,
    )


def generate_city(seed: int = 42, n_rows: int = 8, n_cols: int = 8):
    """Returns (nodes_df, ways_df, meta) for an n_rows×n_cols grid city."""
    rng = np.random.default_rng(seed)

    # column x-offsets in meters: mostly 180 m blocks, with a dense run of
    # 40 m spacings (columns 3..5) for the jumper/short-segment paths
    col_gaps = []
    for c in range(n_cols - 1):
        col_gaps.append(40.0 if c in (2, 3, 4) else 180.0 + 20.0 * float(rng.integers(0, 3)))
    col_x = np.concatenate([[0.0], np.cumsum(col_gaps)])
    row_gaps = [170.0 + 20.0 * float(rng.integers(0, 3)) for _ in range(n_rows - 1)]
    row_y = np.concatenate([[0.0], np.cumsum(row_gaps)])
    # centre the grid on the z11 boundary so ~half the city is in each tile
    col_x = col_x - col_x[-1] / 2.0

    # intersection nodes
    node_rows = []
    node_id = np.zeros((n_rows, n_cols), dtype=np.int64)
    nid = 1000
    for r in range(n_rows):
        for c in range(n_cols):
            dlon, dlat = _m_to_deg(CITY_LAT0, col_x[c], row_y[r])
            node_rows.append((nid, CITY_LAT0 + dlat, CITY_LON0 + dlon))
            node_id[r, c] = nid
            nid += 1

    # midpoint (interior) nodes on horizontal edges — gives ways interior
    # vertices so segments are multi-point polylines
    mid_id = {}
    for r in range(n_rows):
        for c in range(n_cols - 1):
            dlon, dlat = _m_to_deg(
                CITY_LAT0, (col_x[c] + col_x[c + 1]) / 2.0, row_y[r]
            )
            mid_id[(r, c)] = nid
            node_rows.append((nid, CITY_LAT0 + dlat, CITY_LON0 + dlon))
            nid += 1

    highway_cycle = [
        "primary", "residential", "secondary", "tertiary",
        "motorway", "residential", "service", "primary",
        "trunk", "unclassified",
    ]

    ways = []
    wid = 100
    # horizontal ways (with midpoints)
    for r in range(n_rows):
        nodes = []
        for c in range(n_cols):
            nodes.append(int(node_id[r, c]))
            if c < n_cols - 1:
                nodes.append(int(mid_id[(r, c)]))
        tags = {"highway": highway_cycle[r % len(highway_cycle)]}
        if r == 1:
            tags["oneway"] = "yes"
        if r == 5:
            tags["junction"] = "roundabout"
        ways.append((wid, nodes, tags))
        wid += 1
    # vertical ways (intersection nodes only)
    for c in range(n_cols):
        nodes = [int(node_id[r, c]) for r in range(n_rows)]
        tags = {"highway": highway_cycle[(c + 3) % len(highway_cycle)]}
        if c == 2:
            tags["oneway"] = "yes"
        ways.append((wid, nodes, tags))
        wid += 1
    # excluded ways: footway + tagless (NON_ROADWAY) + missing-node way
    ways.append((wid, [int(node_id[0, 0]), int(node_id[1, 1])], {"highway": "footway"}))
    wid += 1
    ways.append((wid, [int(node_id[2, 0]), int(node_id[3, 1])], {}))
    wid += 1
    ways.append((wid, [int(node_id[0, 0]), 99_999_999], {"highway": "primary"}))
    wid += 1

    nodes_df = pd.DataFrame(node_rows, columns=["node_id", "lat", "lon"]).astype(
        {"node_id": np.int64, "lat": np.float64, "lon": np.float64}
    )
    ways_df = pd.DataFrame(ways, columns=["way_id", "nodes", "tags"])
    ways_df["way_id"] = ways_df["way_id"].astype(np.int64)

    meta = {
        "node_id": node_id,
        "mid_id": mid_id,
        "col_x": col_x,
        "row_y": row_y,
        "n_rows": n_rows,
        "n_cols": n_cols,
        "nodes_xy": {int(i): (float(lat), float(lon)) for i, lat, lon in node_rows},
    }
    return nodes_df, ways_df, meta
