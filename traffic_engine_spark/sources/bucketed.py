"""Bucketed table layout — co-located joins and aggregations without
exchanges (the Spark-native analogue of Iceberg's bucket partition
transform; SURVEY §4 optimizer notes).

The reference's stores are keyed K/V maps (segment id → statistics,
StatsDataStore.java; segment id → geometry, StreetDataStore.java), so
every read-side operation is a key-local lookup.  The warehouse-scale
recast: persist the fact tables BUCKETED (and sorted) by the store key —
`spark.read.table` then exposes the hash-partitioned layout to Catalyst,
and any equi-join or groupBy on the bucket key is planned WITHOUT a
shuffle on the bucketed side(s):

  * samples ⋈ segment dim on segment_id       (both bucketed → zero
    Exchange, sort-merge over co-located buckets)
  * histogram rollups groupBy(segment_id, …)  (partial agg stays local;
    the final agg reuses the bucket partitioning)

At 10¹² rows the win is not the one shuffle — it is that EVERY downstream
consumer of the table skips it, forever (the reference pays zero
shuffles for the same reason: its store IS the bucketing).

Asserted by tests/test_infra.py::test_bucketed_join_is_exchange_free
(executed-plan Exchange count == 0 with broadcast disabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) parquet table in
    the session catalog.  ``num_buckets`` must MATCH across tables meant
    to co-join (Spark only elides the exchange for equal bucket counts);
    pick it once per subject area and size so a bucket ≈ one task's worth
    of rows at the target scale.  Iceberg twin:
    ``ALTER TABLE ... ADD PARTITION FIELD bucket(N, col)``."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for the bucket layout to reach the
    optimizer (`spark.read.parquet(path)` on the same files loses the
    bucket spec and re-plans the exchanges)."""
    return spark.read.table(table)
