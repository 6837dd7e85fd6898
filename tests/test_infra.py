"""Checkpoint/resume, skew salting, streaming kernel, and operator tests
beyond the core parity suite."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from traffic_engine_spark.operators import relational, spatial
from traffic_engine_spark.plans import checkpoint as CP
from traffic_engine_spark.plans import match as M
from traffic_engine_spark.plans import network as N
from traffic_engine_spark.plans import skew as SK
from traffic_engine_spark.plans import stats as S


@pytest.fixture(scope="module")
def pipeline_inputs(spark, spark_network, images_pd):
    segs, tls, jumpers = spark_network
    return spark.createDataFrame(images_pd), segs, tls, jumpers


def test_checkpoint_resume_identical(tmp_path, spark, pipeline_inputs):
    """North rule: kill-after-stage-N resume reproduces identical outputs
    and the lineage row counts sum to table counts."""
    images, segs, tls, jumpers = pipeline_inputs
    root = str(tmp_path / "cp")

    hist1, res1 = CP.run_checkpointed_pipeline(
        spark, images, tls, segs, jumpers, root, fingerprint="v1"
    )
    out1 = hist1.toPandas().sort_values(["segment_id", "week", "hour_of_week", "speed_bin"]).reset_index(drop=True)
    assert not any(r.skipped for r in res1)
    assert all(sum(r.per_partition.values()) == r.rows for r in res1)

    # resume: same fingerprint ⇒ all stages read back, byte-identical
    hist2, res2 = CP.run_checkpointed_pipeline(
        spark, images, tls, segs, jumpers, root, fingerprint="v1"
    )
    out2 = hist2.toPandas().sort_values(["segment_id", "week", "hour_of_week", "speed_bin"]).reset_index(drop=True)
    assert all(r.skipped for r in res2)
    pd.testing.assert_frame_equal(out1, out2, check_exact=True)

    # changed input fingerprint ⇒ stages recompute
    hist3, res3 = CP.run_checkpointed_pipeline(
        spark, images, tls, segs, jumpers, root, fingerprint="v2"
    )
    assert not any(r.skipped for r in res3)

    manifest = CP.CheckpointedPipeline(spark, root).manifest()
    assert len(manifest) == 9  # 3 stages × 3 runs


def test_salted_join_matches_plain_join(spark, images_pd):
    images = spark.createDataFrame(images_pd)
    fixes = M.decode_fixes(images)
    from traffic_engine_spark.functions.cells import tile_x_col, tile_y_col

    pts = fixes.select(
        "image_id",
        tile_x_col(F.col("lon"), 14).alias("cx"),
        tile_y_col(F.col("lat"), 14).alias("cy"),
    )
    build = pts.select(F.col("image_id").alias("other_id"), "cx", "cy")
    plain = pts.join(build, ["cx", "cy"]).groupBy("image_id").count().toPandas()
    salted = (
        SK.salted_join(pts, build, ["cx", "cy"], probe_key="image_id")
        .groupBy("image_id").count().toPandas()
    )
    a = plain.sort_values("image_id").reset_index(drop=True)
    b = salted.sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_repartition_by_morton_orders_spatially(spark, images_pd):
    fixes = M.decode_fixes(spark.createDataFrame(images_pd))
    out = SK.repartition_by_morton(fixes, num_partitions=4)
    # morton ranges must not overlap across partitions
    parts = (
        out.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.min("_morton").alias("lo"), F.max("_morton").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for a, b in zip(parts, parts[1:]):
        assert a.hi <= b.lo


def test_streaming_kernel_matches_batch(spark, spark_network, fixes, images_pd, oracle_net):
    """The applyInPandasWithState kernel on a rate-limited stream must emit
    exactly the batch pipeline's speed samples."""
    import tempfile

    from traffic_engine_spark.streaming.match_stream import (
        network_to_dicts,
        stream_speed_samples,
    )

    segs, tls, jumpers_pd = spark_network
    dicts = network_to_dicts(segs.toPandas(), tls.toPandas(), jumpers_pd)

    images = spark.createDataFrame(images_pd)
    batch_samples = (
        M.speed_samples(spark, M.find_crossings(M.pair_fixes(M.decode_fixes(images)),
                                                M.tripline_cell_index(tls)), segs, jumpers_pd)
        .toPandas()
    )

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        M.decode_fixes(images).write.mode("overwrite").parquet(src)
        fixes_stream = spark.readStream.schema(
            "image_id string, trace_id long, ts long, lat double, lon double"
        ).parquet(src)
        out = stream_speed_samples(fixes_stream, dicts)
        q = (
            out.writeStream.format("memory").queryName("stream_samples")
            .outputMode("append").option("checkpointLocation", os.path.join(d, "ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(180)
        q.stop()
        got = spark.sql("select * from stream_samples").toPandas()

    key = ["trace_id", "segment_id", "time", "speed", "source"]
    a = batch_samples[key].sort_values(key).reset_index(drop=True)
    b = got[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()), check_exact=True)


def test_pip_winding_matches_convex_on_convex_polygons(spark, images_pd):
    from traffic_engine_spark.queries import _POLYGONS

    pts = M.decode_fixes(spark.createDataFrame(images_pd)).select("image_id", "lat", "lon")
    conv = spatial.pip_assign_convex(pts, _POLYGONS).toPandas()
    polys_pd = pd.DataFrame(
        [
            {"poly_id": p["poly_id"], "lons": [c[0] for c in p["coords"]],
             "lats": [c[1] for c in p["coords"]]}
            for p in _POLYGONS
        ]
    )
    wind = spatial.pip_assign_winding(pts, polys_pd).toPandas()
    m = conv.merge(wind, on="image_id", suffixes=("_c", "_w"))
    # boundary points may differ (>= vs strict ray casting); interior match
    inner = m[m.poly_id_c == m.poly_id_w]
    assert len(inner) >= 0.99 * len(m)


def test_knn_cells_matches_broadcast(spark, images_pd):
    fixes = M.decode_fixes(spark.createDataFrame(images_pd))
    pts = fixes.select(F.col("image_id").alias("point_id"), "lat", "lon")
    stations = fixes.limit(20).select(F.col("image_id").alias("station_id"), "lat", "lon")
    bc = spatial.knn_join_broadcast(pts, stations, k=2).toPandas()
    cells = spatial.knn_join_cells(pts, stations, zoom=11, ring=2, k=2).toPandas()
    key = ["point_id", "rank"]
    a = bc.sort_values(key).reset_index(drop=True)
    b = cells.sort_values(key).reset_index(drop=True)
    # ring=2 at z11 covers the whole city ⇒ exact agreement
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_asof_join_operator(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "ts": [10, 20, 10], "lid": [1, 2, 3]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "ts": [5, 15, 30], "rv": [100, 200, 300]})
    )
    out = relational.asof_join(left, right, on="k").toPandas().sort_values("lid")
    assert list(out["rv_asof"]) == [100, 200, None] or list(out["rv_asof"].fillna(-1)) == [100, 200, -1]
