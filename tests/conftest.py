"""Shared fixtures: one SparkSession per test run + the synthetic city."""

from __future__ import annotations

import pytest

from traffic_engine_spark.datagen.images_gen import images_from_fixes_pd
from traffic_engine_spark.datagen.osm_gen import generate_city
from traffic_engine_spark.datagen.trace_gen import generate_traces
from traffic_engine_spark.oracle import pyoracle as O
from traffic_engine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def city():
    nodes, ways, meta = generate_city(seed=42)
    return nodes, ways, meta


@pytest.fixture(scope="session")
def oracle_net(city):
    nodes, ways, _ = city
    return O.build_network(nodes, ways)


@pytest.fixture(scope="session")
def fixes(city):
    _, _, meta = city
    return generate_traces(meta, seed=42)


@pytest.fixture(scope="session")
def images_pd(fixes):
    return images_from_fixes_pd(fixes)


@pytest.fixture(scope="session")
def spark_network(spark, city):
    from traffic_engine_spark.plans import network as N

    nodes, ways, _ = city
    return N.build_network_tables(
        spark, spark.createDataFrame(ways), spark.createDataFrame(nodes)
    )
