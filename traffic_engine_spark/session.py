"""SparkSession factory with scale-oriented defaults.

Local-mode testing stands in for the multi-executor cluster; every setting
here is the one we'd ship in spark-submit --conf for the 1000-executor run
(AQE on, skew-join on, Arrow on, sane shuffle partitioning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "traffic_engine_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    # Shuffle spill dir: this sandbox's /tmp sits on a throttled virtual
    # disk that serialises concurrent shuffle writers (measured: local[32]
    # slower than local[8]).  Use tmpfs when present — on a real cluster
    # this is the usual NVMe-backed spark.local.dir provisioning.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dir and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing: 32k rows balances per-batch Python overhead
        # against memory; with multi-MB image payloads set
        # SPARK_ARROW_BATCH smaller (SURVEY §4 physical notes)
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_ARROW_BATCH", "32768"),
        )
        # Scan split size: the bench inputs are single ~5-125 MB parquet
        # files, which the 128 MB default plans as 1-2 splits — scans then
        # run on 1-2 of the 32 cores (measured: tpch_q1 0.55 s → 0.31 s at
        # 16m).  Env-parameterised: a production cluster reading TB-scale
        # tables should set 128m-1g (guide §6) — more splits there only
        # adds scheduling overhead and map-task count (§2.2).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Streaming state store backend (stateful medallion queries): the
    # default HDFS-backed provider keeps every version of every key on
    # the JVM heap per maintenance interval; RocksDB moves state off-heap
    # with changelog checkpointing.  Env-switchable for A/B.
    state_provider = os.environ.get("SPARK_GRAFT_STATESTORE", "")
    if state_provider:
        if state_provider in ("rocksdb", "RocksDB"):
            state_provider = (
                "org.apache.spark.sql.execution.streaming."
                "state.RocksDBStateStoreProvider"
            )
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", state_provider
        )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
