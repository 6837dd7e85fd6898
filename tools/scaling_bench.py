"""Two-parallelism scaling run (BASELINE.json north rule, sandbox protocol
per SURVEY.md §6): the identical headline job — decode → pair → cell join →
refine → kernel → histogram + tile assignment — on the identical input at
local[8] and local[32]; reports rows/sec at both and scaling efficiency
(T_8 / T_32) / 4, target ≥ 0.8.  Each level runs in its own subprocess
(fresh JVM) so nothing is shared but the on-disk input.

Usage: python tools/scaling_bench.py [--traces 16000]  → writes BENCH.md
       python tools/scaling_bench.py --child N --traces M  (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/root/repo/.bench_data")


def run_child(cpus: int, traces: int) -> dict:
    from traffic_engine_spark import get_spark
    from traffic_engine_spark.datagen.bench_data import bench_network, ensure_bench_images
    from traffic_engine_spark.plans import match as M
    from traffic_engine_spark.plans import network as N
    from traffic_engine_spark.plans import stats as S
    from traffic_engine_spark.plans import tiles as TI

    spark = get_spark(app_name=f"scaling-{cpus}", cores=cpus, shuffle_partitions=cpus)
    images_path = ensure_bench_images(
        spark, os.path.join(BENCH_DIR, f"images_{traces}"), n_traces=traces
    )
    images = spark.read.parquet(images_path)
    n_images = images.count()
    ways, nodes = bench_network(spark)
    segs, tls, jumpers = N.build_network_tables(spark, ways, nodes)
    tls.count()
    # warm python workers so both levels pay the same fixed cost
    spark.range(1000, numPartitions=cpus).mapInPandas(lambda it: it, schema="id long").count()

    t0 = time.time()
    crossings, samples = M.run_pipeline(spark, images, tls, segs, jumpers)
    n_hist = S.histograms(samples).count()
    n_tiles = TI.assign_tiles(images).count()
    wall = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "wall_sec": round(wall, 3),
        "rows": n_images + n_tiles,
        "rows_per_sec": int((n_images + n_tiles) / wall),
        "hist_rows": n_hist,
    }


def main():
    traces = 16000
    if "--traces" in sys.argv:
        traces = int(sys.argv[sys.argv.index("--traces") + 1])
    if "--gen" in sys.argv:
        from traffic_engine_spark import get_spark
        from traffic_engine_spark.datagen.bench_data import ensure_bench_images

        spark = get_spark(app_name="scaling-gen", cores=32)
        path = ensure_bench_images(
            spark, os.path.join(BENCH_DIR, f"images_{traces}"), n_traces=traces
        )
        n = spark.read.parquet(path).count()
        spark.stop()
        print(f"{path} rows={n}")
        return

    if "--child" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--child") + 1])
        print(json.dumps(run_child(cpus, traces)))
        return

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # pre-generate the input in its own session so no timed child pays
    # (or is memory-polluted by) generation
    gen = subprocess.run(
        [sys.executable, __file__, "--gen", "--traces", str(traces)],
        capture_output=True, text=True, cwd=repo,
    )
    if gen.returncode != 0:
        print(gen.stderr[-3000:], file=sys.stderr)
        sys.exit(1)
    print(f"input ready: {gen.stdout.strip()}", file=sys.stderr)

    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(cpus), "--traces", str(traces)],
            capture_output=True, text=True, cwd=repo,
        )
        if out.returncode != 0:
            print(out.stderr[-3000:], file=sys.stderr)
            sys.exit(1)
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"local[{cpus}]: {results[cpus]}", file=sys.stderr)

    eff = (results[8]["wall_sec"] / results[32]["wall_sec"]) / 4.0
    summary = {
        "job": "traffic pipeline (decode→pair→cell join→refine→kernel→histogram) + tile assignment",
        "input_rows": results[32]["rows"],
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency_8_to_32": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    with open("BENCH.md", "w") as f:
        f.write(
            f"""# BENCH — two-parallelism scaling evidence (north rule)

Sandbox protocol (no real cluster): the identical headline job on the
identical input at two parallelism levels, per SURVEY.md §6.

Job: images decode → per-trace pairing → z18 cell join (±1 ring) →
exact refine → per-trace state-machine kernel → histogram aggregation,
plus tile assignment over every image row.  Input: deterministic synthetic
images table, {results[32]['rows']:,} processed rows ({traces} traces;
byte-identical across runs and parallelism levels).

| level | wall (s) | rows/sec |
|---|---|---|
| local[8]  (N)  | {results[8]['wall_sec']} | {results[8]['rows_per_sec']:,} |
| local[32] (4N) | {results[32]['wall_sec']} | {results[32]['rows_per_sec']:,} |

**Scaling efficiency (T_N / T_4N) / 4 = {eff:.3f}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"}).

Output parity across levels is asserted separately
(tests/test_scaling_determinism.py): byte-identical histograms at
local[8] vs local[32].

Reproduce: `python tools/scaling_bench.py`
"""
        )
    print("wrote BENCH.md", file=sys.stderr)


if __name__ == "__main__":
    main()
