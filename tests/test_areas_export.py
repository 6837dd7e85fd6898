"""J9 cluster merge, S6 GeoJSON export, A7 t-crit lookup."""

import json

import pandas as pd
from pyspark.sql import functions as F

from traffic_engine_spark.plans import areas as AR
from traffic_engine_spark.plans import stats as S
from traffic_engine_spark.sources import export as EX


def test_cluster_merge_fixpoint():
    # three areas: A and B overlap after 5% expansion; C is far away
    areas = pd.DataFrame(
        {
            "area_id": [1, 2, 3],
            "min_lon": [0.0, 1.05, 10.0],
            "min_lat": [0.0, 0.0, 10.0],
            "max_lon": [1.0, 2.0, 11.0],
            "max_lat": [1.0, 1.0, 11.0],
        }
    )
    out = AR.build_clusters(areas)
    cid = dict(zip(out.area_id, out.cluster_id))
    assert cid[1] == cid[2] != cid[3]
    # same-name merge: give C the same name as cluster AB via a place
    places = pd.DataFrame(
        {"name": ["X", "X"], "population": [100, 100],
         "lon": [0.5, 10.5], "lat": [0.5, 10.5]}
    )
    out2 = AR.build_clusters(areas, places=places)
    cid2 = dict(zip(out2.area_id, out2.cluster_id))
    assert cid2[1] == cid2[2] == cid2[3]  # merged by shared name


def test_name_for_bounds_maxpop_vs_quirk():
    places = pd.DataFrame(
        {"name": ["small", "big"], "population": [10, 1000],
         "lon": [0.5, 0.6], "lat": [0.5, 0.6]}
    )
    env = (0.0, 0.0, 1.0, 1.0)
    assert AR.name_for_bounds(places, env) == "big"  # fixed: true argmax
    # quirk: last overlapping wins regardless of population (J8)
    assert AR.name_for_bounds(places.iloc[::-1], env, strict_parity=True) == "small"


def test_geojson_export(spark, spark_network, tmp_path):
    segs, _, _ = spark_network
    doc = json.loads(EX.segments_to_geojson(segs.limit(5)))
    assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 5
    f = doc["features"][0]
    assert f["geometry"]["type"] == "LineString"
    assert len(f["geometry"]["coordinates"][0]) == 2
    EX.segments_to_geojson_files(segs, str(tmp_path / "gj"))
    loaded = spark.read.text(str(tmp_path / "gj"))
    assert loaded.count() == segs.count()
    one = json.loads(loaded.first().value)
    assert one["properties"]["segment_id"]


def test_welch_t_crit_lookup(spark):
    import pandas as pd

    s1 = spark.createDataFrame(
        pd.DataFrame({"segment_id": [1], "count": [10.0], "mean_ms": [12.0], "stddev_ms": [2.0]})
    )
    s2 = spark.createDataFrame(
        pd.DataFrame({"segment_id": [1], "count": [10.0], "mean_ms": [9.0], "stddev_ms": [2.0]})
    )
    out = S.welch_t_test(s1, s2).toPandas().iloc[0]
    # Satterthwaite df = 18 → index 17 → p95 col = 1.734 (NIST table)
    assert abs(out["df"] - 18.0) < 1e-6
    assert abs(out["t_crit"] - 1.734) < 1e-9
    assert out["t_stat"] > out["t_crit"] and bool(out["significant"])
    # negative t ⇒ always true (reference quirk, reproduced)
    out2 = S.welch_t_test(s2, s1).toPandas().iloc[0]
    assert out2["t_stat"] < 0 and bool(out2["significant"])
