"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship query (the traffic histogram pipeline spine) on
sf0.001.  ``queries``/``oracle_sql``: one entry per implemented operator
from SURVEY.md §2 plus the training-data family — see
traffic_engine_spark/queries.py for the registry (each Spark plan sits
next to its DuckDB oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from traffic_engine_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: decode → pair → cell join → refine → kernel → histogram
    summary on the synthetic image table + z18 histogram of sf0.001 events.

    Returns the per-segment hour-of-week speed summary (SURVEY §7.2)."""
    from traffic_engine_spark.plans import stats as S

    samples = Q.traffic_speed_samples(spark, "/root/testdata/sf0.001")
    hist = S.histograms(samples)
    return S.summary_stats(hist, by_hour=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
