#!/usr/bin/env python
"""Streaming-medallion throughput at bench scale: the two planet queries
(pairing kernel + declarative J1/J2 → silver; crossing kernel +
declarative J4 → samples) over the ~0.83M-row bench fix set.

    python tools/stream_bench.py [--traces 8000] [--batches 4] [--sequential]

Prints ONE JSON line: per-query wall, rows, rows/sec.  `--batches`
splits the input into that many time-ordered files consumed one per
trigger (state round-trips between microbatches, the continuous-operation
shape); 1 = a single catch-up batch.

Default mode runs the two queries CONCURRENTLY — the deployed medallion
shape (both queries are always-on; q2 tails the silver sink's
_spark_metadata commit log, so it consumes exactly the batches q1
commits, as they commit).  `--sequential` restores the old
drain-q1-then-run-q2 measurement for comparison; its end-to-end number
double-counts wall the deployment overlaps."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/root/repo/.bench_data")


def drain(q, done, timeout=600):
    """Drain an availableNow query: stateful queries with processing-time
    timeouts never self-terminate, so poll until ``done()`` (the output
    has everything) AND the last batch was idle; raise on query failure
    or timeout instead of silently reporting partial counts."""
    t0 = time.time()
    while q.isActive and time.time() - t0 < timeout:
        p = q.recentProgress
        if p and p[-1]["numInputRows"] == 0 and done():
            break
        time.sleep(0.5)
    else:
        if q.isActive:
            q.stop()
            raise TimeoutError(f"stream bench query did not drain in {timeout}s")
    if q.exception() is not None:
        raise RuntimeError(f"stream bench query failed: {q.exception()}")
    q.stop()


def main():
    traces = 8000
    if "--traces" in sys.argv:
        traces = int(sys.argv[sys.argv.index("--traces") + 1])
    batches = 4
    if "--batches" in sys.argv:
        batches = int(sys.argv[sys.argv.index("--batches") + 1])
    sequential = "--sequential" in sys.argv

    from traffic_engine_spark import get_spark
    from traffic_engine_spark.datagen.bench_data import bench_network, ensure_bench_images
    from traffic_engine_spark.plans import match as M
    from traffic_engine_spark.plans import network as N
    from traffic_engine_spark.streaming.match_stream import (
        CROSSING_SCHEMA,
        FIX_SCHEMA,
        jumper_samples_stream,
        stream_crossings,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # State-partition count: BOTH medallion queries' only exchange is the
    # stateful groupBy(trace_id), so shuffle.partitions here sets the
    # state-store partition count, not join parallelism (J1/J4 are
    # stream-static broadcast joins).  The per-microbatch fixed cost is
    # ~0.6 s + ~15 ms/state-partition (measured, floor probe in BENCH.md):
    # cpus/2 halves that tax while the post-state stages stay wide enough
    # to keep the cores busy at bench batch sizes.
    sp = int(os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", str(max(cpus // 2, 4))))
    spark = get_spark(app_name="stream-bench", cores=cpus, shuffle_partitions=sp)
    ensure_bench_images(spark, os.path.join(BENCH_DIR, f"images_{traces}"), n_traces=traces)
    images = spark.read.parquet(os.path.join(BENCH_DIR, f"images_{traces}"))
    ways, nodes = bench_network(spark)
    segs, tls, jumpers = N.build_network_tables(spark, ways, nodes)
    segs, tls = segs.localCheckpoint(), tls.localCheckpoint()
    # python worker warmup (same as bench.py)
    spark.range(1000, numPartitions=cpus).mapInPandas(lambda it: it, schema="id long").count()

    # sink/checkpoint dirs follow the same policy as spark.local.dir
    # (session.py): this sandbox's /tmp is a throttled virtual disk; on a
    # real cluster these sit on NVMe/object storage
    tmp_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="stream_bench_", dir=tmp_base)
    try:
        fixes_pd = M.decode_fixes(images).toPandas()
        n_fixes = len(fixes_pd)
        src = os.path.join(d, "src")
        os.makedirs(src)
        if batches <= 1:
            fixes_pd.to_parquet(os.path.join(src, "all.parquet"), index=False)
        else:
            cuts = fixes_pd["ts"].quantile(
                [i / batches for i in range(1, batches)]
            ).tolist()
            bounds = [-float("inf")] + cuts + [float("inf")]
            for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
                p = os.path.join(src, f"slice_{i:03d}.parquet")
                fixes_pd[(fixes_pd.ts > lo) & (fixes_pd.ts <= hi)].to_parquet(p, index=False)
                os.utime(p, (1_000_000 + i, 1_000_000 + i))
        silver = os.path.join(d, "silver")
        reader = spark.readStream.schema(FIX_SCHEMA)
        if batches > 1:
            reader = reader.option("maxFilesPerTrigger", 1)
        t0 = time.time()
        q1 = (
            stream_crossings(reader.parquet(src), tls)
            .writeStream.format("parquet").option("path", silver)
            .option("checkpointLocation", os.path.join(d, "ck1"))
            .outputMode("append").trigger(availableNow=True).start()
        )
        def q1_done():
            # all fix rows consumed: sum of input rows across progress
            return sum(p["numInputRows"] for p in q1.recentProgress) >= n_fixes

        def start_q2(throttle: str | None = None, catch_up: bool = False):
            # concurrent mode: continuous trigger (availableNow would
            # freeze the file listing at start, before q1 has committed
            # anything), throttled so q2 consumes ~one q1-batch chunks.
            # sequential mode (catch_up): availableNow + per-trigger file
            # cap — the ORIGINAL multi-microbatch state-round-trip
            # measurement, preserved for cross-round comparison.
            cr = spark.readStream.schema(CROSSING_SCHEMA)
            if catch_up and batches > 1:
                # one q1 microbatch writes ~cpus part files; consume a
                # batch-equivalent per trigger
                cr = cr.option("maxFilesPerTrigger", cpus)
            w = (
                jumper_samples_stream(spark, cr.parquet(silver), segs, jumpers)
                .writeStream.format("parquet").option("path", os.path.join(d, "gold"))
                .option("checkpointLocation", os.path.join(d, "ck2"))
                .outputMode("append")
            )
            if catch_up:
                w = w.trigger(availableNow=True)
            elif throttle:
                w = w.trigger(processingTime=throttle)
            return w.start()

        if sequential:
            drain(q1, q1_done)
            q1_wall = round(time.time() - t0, 3)
            n_cross = spark.read.parquet(silver).count()
            t1 = time.time()
            q2 = start_q2(catch_up=True)
            def q2_done():
                return sum(p["numInputRows"] for p in q2.recentProgress) >= n_cross
            drain(q2, q2_done)
            q2_wall = round(time.time() - t1, 3)
            e2e_wall = q1_wall + q2_wall
        else:
            # CONCURRENT: start q2 as soon as q1's sink exists (the first
            # committed batch creates _spark_metadata; starting earlier
            # would make the file source treat the dir as a plain listing
            # and read uncommitted files)
            while not os.path.isdir(os.path.join(silver, "_spark_metadata")):
                if not q1.isActive:
                    raise RuntimeError(f"q1 died before first commit: {q1.exception()}")
                time.sleep(0.1)
            q2 = start_q2(throttle="2 seconds")
            drain(q1, q1_done)
            q1_wall = round(time.time() - t0, 3)
            n_cross = spark.read.parquet(silver).count()
            def q2_done():
                return sum(p["numInputRows"] for p in q2.recentProgress) >= n_cross
            drain(q2, q2_done)
            e2e_wall = round(time.time() - t0, 3)
            q2_wall = e2e_wall  # q2 ran from (almost) t0 until drain
        n_samples = spark.read.parquet(os.path.join(d, "gold")).count()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    print(json.dumps({
        "metric": "streaming medallion throughput (fixes -> crossings -> samples)",
        "fixes": n_fixes, "batches": batches,
        "mode": "sequential" if sequential else "concurrent",
        "q1_crossings_wall_sec": q1_wall, "crossings": n_cross,
        "q1_fixes_per_sec": int(n_fixes / q1_wall),
        "q2_samples_wall_sec": q2_wall, "samples": n_samples,
        "end_to_end_wall_sec": round(e2e_wall, 3),
        "end_to_end_fixes_per_sec": int(n_fixes / e2e_wall),
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
