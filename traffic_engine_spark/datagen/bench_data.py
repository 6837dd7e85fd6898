"""Bench-scale input generation: the images table at ≥10⁶ rows, built *in
parallel with Spark itself* — per-trace seeding makes every partition's
output independent of scheduling, so the table is byte-deterministic for a
given (seed, n_traces) regardless of parallelism (SURVEY §7.4.4).

Cached as parquet under .bench_data/ — generation cost is paid once, not
per bench run.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .images_gen import images_from_fixes_pd
from .osm_gen import generate_city
from .trace_gen import BASE_TS_MS, _sample_fixes, _walk_polyline

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def gen_trace_fixes(meta, seed: int, trace_id: int, n_moves_lo: int, n_moves_hi: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed * 1_000_003 + trace_id)
    n_rows, n_cols = meta["n_rows"], meta["n_cols"]
    start = (int(rng.integers(0, n_rows)), int(rng.integers(0, n_cols)))
    n_moves = int(rng.integers(n_moves_lo, n_moves_hi))
    week = int(rng.integers(0, 2))
    hour = int(rng.integers(0, 7 * 24))
    t0 = BASE_TS_MS + week * 7 * 86_400_000 + hour * 3_600_000
    fixes = _sample_fixes(meta, rng, _walk_polyline(meta, rng, start, n_moves), t0)
    return pd.DataFrame(
        {
            "trace_id": np.int64(trace_id),
            "seq": np.arange(len(fixes), dtype=np.int32),
            "ts": np.array([f[0] for f in fixes], dtype=np.int64),
            "lat": np.array([f[1] for f in fixes], dtype=np.float64),
            "lon": np.array([f[2] for f in fixes], dtype=np.float64),
        }
    )


def ensure_bench_images(
    spark: SparkSession,
    path: str,
    n_traces: int = 8000,
    seed: int = 7,
    grid: int = 16,
    n_moves_lo: int = 60,
    n_moves_hi: int = 100,
    partitions: int = 64,
    trace_offset: int = 0,
) -> str:
    """Generate (once) and return the path of the bench images table.

    ``trace_offset`` selects a disjoint trace-id slice: per-trace seeding
    means slice [k·N, (k+1)·N) is byte-identical to the corresponding rows
    of the full [0, 4N) table — so 4 offset slices form an exact partition
    of the 4× input (the multi-executor weak-scaling protocol)."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    _, _, meta = generate_city(seed=42, n_rows=grid, n_cols=grid)
    # meta is small (few hundred nodes) — ships in the task closure
    ids = spark.range(trace_offset, trace_offset + n_traces, 1, partitions)

    def gen(batches):
        for pdf in batches:
            frames = [
                gen_trace_fixes(meta, seed, int(tid), n_moves_lo, n_moves_hi)
                for tid in pdf["id"]
            ]
            if frames:
                yield images_from_fixes_pd(pd.concat(frames, ignore_index=True))

    ids.mapInPandas(gen, schema=IMAGES_SCHEMA).write.mode("overwrite").parquet(path)
    return path


def bench_network(spark: SparkSession, grid: int = 16):
    nodes, ways, _ = generate_city(seed=42, n_rows=grid, n_cols=grid)
    return spark.createDataFrame(ways), spark.createDataFrame(nodes)
