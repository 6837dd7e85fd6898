"""OSM area clustering (J9) + area metadata dims.

The reference clusters loaded z11 OSM areas into named city clusters:
  * an area joins an existing cluster whose bounds *contain* its envelope
    (OSMDataStore.buildOSMClusters, OSMDataStore.java:170-237);
  * clusters merge transitively when their 5%-expanded envelopes intersect
    or they share a name (OSMCluster.overlaps/mergeCluster,
    OSMCluster.java:31-53);
  * cluster name = max-population place within bounds (J8 — the reference
    forgets to track maxPop and returns the *last* overlapping place,
    PopulationCenters.java:118-132; reproduced under strict_parity, fixed
    by default).

Areas are a tiny metadata dimension (one row per loaded z11 tile), so the
fixpoint merge runs driver-side over pandas, exactly as SURVEY §2.3 plans.
The result is broadcast back as a dim table (area_id → cluster_id, name).
"""

from __future__ import annotations

import pandas as pd


def _expand(env, fx=0.05, fy=0.05):
    w, h = env[2] - env[0], env[3] - env[1]
    return (env[0] - w * fx, env[1] - h * fy, env[2] + w * fx, env[3] + h * fy)


def _contains(a, b) -> bool:
    return a[0] <= b[0] and a[1] <= b[1] and a[2] >= b[2] and a[3] >= b[3]


def _intersects(a, b) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def _union(a, b):
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def name_for_bounds(places: pd.DataFrame, env, strict_parity: bool = False):
    """J8 — name of the populated place within bounds.  Default: true
    arg-max by population; strict_parity reproduces the last-overlapping
    quirk (PopulationCenters.java:118-132)."""
    inside = places[
        (places.lon >= env[0]) & (places.lon <= env[2])
        & (places.lat >= env[1]) & (places.lat <= env[3])
    ]
    if inside.empty:
        return None
    if strict_parity:
        return str(inside.iloc[-1]["name"])  # last overlapping, not max
    return str(inside.sort_values(["population", "name"]).iloc[-1]["name"])


def build_clusters(
    areas: pd.DataFrame, places: pd.DataFrame | None = None, strict_parity: bool = False
) -> pd.DataFrame:
    """areas: (area_id, min_lon, min_lat, max_lon, max_lat) → one row per
    area with (area_id, cluster_id, cluster_name, c_min_lon, ..)."""
    clusters: dict[int, dict] = {}
    area_cluster: dict[int, int] = {}
    next_id = 0

    def update_name(c):
        if places is not None:
            c["name"] = name_for_bounds(places, c["env"], strict_parity)

    for r in areas.itertuples():
        env = (float(r.min_lon), float(r.min_lat), float(r.max_lon), float(r.max_lat))
        placed = False
        for cid in sorted(clusters):
            c = clusters[cid]
            if _contains(c["env"], env):
                c["env"] = _union(c["env"], env)
                c["areas"].append(int(r.area_id))
                update_name(c)
                area_cluster[int(r.area_id)] = cid
                placed = True
                break
        if not placed:
            c = {"env": env, "areas": [int(r.area_id)], "name": None}
            update_name(c)
            clusters[next_id] = c
            area_cluster[int(r.area_id)] = next_id
            next_id += 1

    # fixpoint merge (5 %-expanded intersection OR same non-null name)
    merged = True
    while merged:
        merged = False
        ids = sorted(clusters)
        for i in ids:
            for jj in ids:
                if i == jj or i not in clusters or jj not in clusters:
                    continue
                a, b = clusters[i], clusters[jj]
                same_name = a["name"] is not None and a["name"] == b["name"]
                if _intersects(_expand(a["env"]), _expand(b["env"])) or same_name:
                    a["env"] = _union(a["env"], b["env"])
                    a["areas"].extend(b["areas"])
                    update_name(a)
                    for aid in b["areas"]:
                        area_cluster[aid] = i
                    del clusters[jj]
                    merged = True
                    break
            if merged:
                break

    rows = []
    for aid, cid in sorted(area_cluster.items()):
        c = clusters[cid]
        rows.append((aid, cid, c["name"], *c["env"]))
    return pd.DataFrame(
        rows,
        columns=["area_id", "cluster_id", "cluster_name",
                 "c_min_lon", "c_min_lat", "c_max_lon", "c_max_lat"],
    )
