"""Two-parallelism scaling runs (BASELINE.json north rule, sandbox protocol
per SURVEY.md §6): the identical headline job — decode → pair → cell join →
refine → kernel → histogram + tile assignment — at N and 4N cores, each
level in its own taskset-pinned subprocess (fresh JVM; nothing shared but
the on-disk input).

Reports BOTH scaling modes (results recorded in BENCH.md):
  * weak   (primary): N cores on D rows vs 4N cores on 4D rows —
           T_N(D) / T_4N(4D); the "4× executors handle 4× data in the
           same wall time" cluster-growth claim.
  * strong: N vs 4N cores on identical 4D input — (T_N / T_4N) / 4;
           on this single VM it is capped by shared memory bandwidth and
           the fixed per-stage costs (see BENCH.md analysis).

Usage: python tools/scaling_bench.py [--traces 256000]  (~12 min)
       python tools/scaling_bench.py --executors [--traces N]  (weak, executor JVMs)
       taskset -c 0-1 python tools/scaling_bench.py --strong-union --traces N
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

# /proc/vmstat counters that expose the reclaim/compaction stall paths no
# other channel records (iowait misses direct reclaim; steal misses THP
# compaction; the membw canary runs OUTSIDE the stalled cgroup): if the
# multi-executor phase is slow because 4x16g pre-touched heaps + the 4x
# parquet working set push the box into memory pressure, these deltas say
# so directly.
_VMSTAT_KEYS = (
    "allocstall_normal", "allocstall_movable", "compact_stall",
    "pgscan_kswapd", "pgscan_direct", "pgsteal_kswapd", "pgsteal_direct",
    "pgmajfault", "thp_collapse_alloc_failed",
)


def vm_snap() -> dict:
    out = {}
    try:
        with open("/proc/vmstat") as f:
            for line in f:
                k, _, v = line.partition(" ")
                if k in _VMSTAT_KEYS:
                    out[k] = int(v)
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith(("MemAvailable:", "Cached:")):
                    out[line.split(":")[0]] = int(line.split()[1]) // 1024  # MiB
    except OSError:
        pass
    return out


def vm_delta(a: dict, b: dict) -> dict:
    d = {k: b[k] - a[k] for k in _VMSTAT_KEYS if k in a and k in b}
    for k in ("MemAvailable", "Cached"):
        if k in a and k in b:
            d[k + "_mib"] = [a[k], b[k]]
    return d


def run_child(cpus: int, traces: int, offset: int = 0, paths: list | None = None) -> dict:
    """One measured executor.  Default: a single generated slice
    (traces, offset).  With ``paths``, read the given parquet dirs as one
    input (the --strong-union baseline) — SAME warmup + timing protocol
    either way, so weak children and the strong baseline always measure
    identically."""
    from traffic_engine_spark import get_spark
    from traffic_engine_spark.datagen.bench_data import bench_network, ensure_bench_images
    from traffic_engine_spark.plans import match as M
    from traffic_engine_spark.plans import network as N
    from traffic_engine_spark.plans import stats as S
    from traffic_engine_spark.plans import tiles as TI

    # Pre-touch the heap (same protocol as bench.py): the host throttles
    # cold per-process page allocation (hostload.fault_ramp), and a fresh
    # executor JVM otherwise faults its working set through that cold
    # credit INSIDE the timed section — with four concurrent JVMs this
    # alone produced 4-5x multi-phase walls (ledger #19).  AlwaysPreTouch
    # moves the fault storm into the un-timed startup window, where it
    # also serves as the ramp.  Heap size is env-tunable so K concurrent
    # children fit in RAM (the --executors parent shrinks it for K=8:
    # 8 x 16g would exceed this box's 125 GiB).
    heap_gb = int(os.environ.get("SPARK_GRAFT_CHILD_HEAP_GB", "16"))
    os.environ.setdefault("SPARK_DRIVER_MEM", f"{heap_gb}g")
    spark = get_spark(
        app_name=f"scaling-{cpus}", cores=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.extraJavaOptions":
                f"-Xms{heap_gb}g -XX:+AlwaysPreTouch"
        },
    )
    if paths is None:
        suffix = f"_off{offset}" if offset else ""
        paths = [ensure_bench_images(
            spark, os.path.join(BENCH_DIR, f"images_{traces}{suffix}"),
            n_traces=traces, trace_offset=offset,
        )]
    images = spark.read.parquet(*paths)
    n_images = images.count()
    # warm the OS page cache for the columns the job reads (count() alone
    # touches only row-group stats): N executors on a real cluster each
    # read their own disks — a single shared virtual disk would otherwise
    # dominate the measurement with first-touch I/O noise
    images.selectExpr("sum(length(caption))", "sum(length(image_id))").collect()
    ways, nodes = bench_network(spark)
    segs, tls, jumpers = N.build_network_tables(spark, ways, nodes)
    tls.count()
    # Warm python workers so both levels pay the same fixed cost — and
    # RAMP each worker's page-allocation credit while we are at it.  The
    # host throttle is per-process and reactive (hostload.fault_ramp /
    # fault_probe_fresh): AlwaysPreTouch ramps the JVM, but pyspark
    # workers fork fresh and allocate Arrow/pandas buffers continuously
    # INSIDE the timed section; in a throttle phase a cold worker faults
    # at 0.02-0.06 GiB/s, which alone reproduces the observed 1.5-2x
    # wall inflation on CPU-clean windows.  Bounded: each worker
    # allocates 32 MiB slabs until its rate recovers or the budget runs
    # out, in the UN-timed window (clean window: one slab, <0.1 s).
    ramp_min = float(os.environ.get("SPARK_GRAFT_FAULT_MIN", "1.0"))
    ramp_budget = float(os.environ.get("SPARK_GRAFT_WORKER_RAMP", "60"))

    def _worker_ramp(it):
        import time as _t

        import numpy as _np
        import pandas as _pd

        t0 = _t.time()
        rate = 0.0
        while _t.time() - t0 < ramp_budget:
            s = _t.time()
            buf = _np.ones(32 * 1024 * 1024 // 8, dtype=_np.int64)
            rate = 32 / 1024.0 / max(_t.time() - s, 1e-9)
            del buf
            if rate >= ramp_min:
                break
        for _ in it:
            pass
        yield _pd.DataFrame({"gibs": [round(rate, 3)]})

    ramp_rates = sorted(
        r["gibs"]
        for r in spark.range(cpus, numPartitions=cpus)
        .mapInPandas(_worker_ramp, schema="gibs double")
        .collect()
    )

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
        "worker_ramp_gibs": ramp_rates,
    }


def main():
    traces = 256000
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

    if "--strong-union" in sys.argv:
        # Strong baseline companion to --executors: ONE 2-core executor on
        # the union of the 4 disjoint slices (the exact 4D input the 4
        # executors share), read as multiple parquet paths — no 4D file
        # generation needed.  Run under `taskset -c 0-1`.  strong
        # efficiency = (this wall / slowest 4x wall) / 4.  Same warmup +
        # timing protocol as the weak children (shared run_child).
        from traffic_engine_spark import get_spark
        from traffic_engine_spark.datagen.bench_data import ensure_bench_images

        d = traces // 4
        gen = get_spark(app_name="strong-union-gen", cores=2, shuffle_partitions=2)
        paths = [
            ensure_bench_images(
                gen,
                os.path.join(BENCH_DIR, f"images_{d}" + (f"_off{i*d}" if i else "")),
                n_traces=d, trace_offset=i * d,
            )
            for i in range(4)
        ]
        gen.stop()
        print(json.dumps(run_child(2, d, paths=paths)))
        return

    if "--child" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--child") + 1])
        offset = 0
        if "--offset" in sys.argv:
            offset = int(sys.argv[sys.argv.index("--offset") + 1])
        print(json.dumps(run_child(cpus, traces, offset)))
        return

    if "--multi-only" in sys.argv:
        # Diagnostic: JUST the K-concurrent-executor phase (no single, no
        # union) with vmstat stall deltas — built to decide whether the
        # repeated 512k 4x-phase slowdowns (model ratios 0.51-0.67 while
        # every load/steal/iowait/fault channel reads clean, ledger
        # 2026-08-18) are a time-varying host phase or a SIZE-DEPENDENT
        # protocol artifact (4x16g pre-touched heaps + 4x parquet working
        # set -> reclaim/compaction stalls).  Run back-to-back at two
        # sizes in one window: host phase hits both, size artifact hits
        # only the larger.
        nexec = 4
        if "--nexec" in sys.argv:
            nexec = int(sys.argv[sys.argv.index("--nexec") + 1])
        if "SPARK_GRAFT_CHILD_HEAP_GB" not in os.environ:
            mem_kb = 0
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemTotal:"):
                        mem_kb = int(line.split()[1])
                        break
            cap = max(4, int(mem_kb / 1024 / 1024 * 0.55 / nexec))
            os.environ["SPARK_GRAFT_CHILD_HEAP_GB"] = str(min(16, cap))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = traces // 4
        for i in range(nexec):
            subprocess.run(
                [sys.executable, "-c",
                 "import sys; sys.path.insert(0, %r);"
                 "from traffic_engine_spark import get_spark;"
                 "from traffic_engine_spark.datagen.bench_data import ensure_bench_images;"
                 "s = get_spark(cores=16);"
                 "ensure_bench_images(s, %r, n_traces=%d, trace_offset=%d); s.stop()"
                 % (repo, os.path.join(BENCH_DIR, f"images_{d}" + (f"_off{i*d}" if i else "")), d, i * d)],
                cwd=repo, capture_output=True, text=True)
        vm0 = vm_snap()
        procs = [
            subprocess.Popen(
                ["taskset", "-c", f"{i*2}-{i*2+1}", sys.executable, __file__,
                 "--child", "2", "--traces", str(d), "--offset", str(i * d)],
                stdout=subprocess.PIPE, text=True, cwd=repo)
            for i in range(nexec)
        ]
        outs = [json.loads(p.communicate()[0].strip().splitlines()[-1]) for p in procs]
        vm1 = vm_snap()
        model = [
            round((12.0 + 31.3 * o["rows"] / 13.3e6) / o["wall_sec"], 3)
            for o in outs
        ]
        print(json.dumps({
            "mode": "multi_only", "n_executors": nexec, "traces": traces,
            "heap_gb": os.environ["SPARK_GRAFT_CHILD_HEAP_GB"],
            "walls": [o["wall_sec"] for o in outs],
            "model_ratios": model,
            "vmstat": vm_delta(vm0, vm1),
        }))
        return

    if "--executors" in sys.argv:
        # Multi-executor weak scaling: N=1 executor (2 pinned cores) on D
        # traces vs K executor PROCESSES (2 pinned cores each, disjoint
        # core sets, own JVMs) on K disjoint D-trace slices — exactly the
        # "N and 4N executors" cluster shape (spark-submit deploys
        # executors as separate JVMs; a single local[8] JVM under-reports
        # scaling because GC/locks are shared).  Weak efficiency =
        # T_1exec(D) / max_i T_i(D).  K defaults to 4; --nexec 8 extends
        # the evidence to a third cluster size (16 pinned cores).
        nexec = 4
        if "--nexec" in sys.argv:
            nexec = int(sys.argv[sys.argv.index("--nexec") + 1])
        assert 2 * nexec <= os.cpu_count(), "not enough cores to pin"
        # Size the pre-touched child heaps so ALL phases fit in RAM with
        # headroom for /dev/shm shuffle dirs and the page cache: cap the
        # K-JVM aggregate at ~55% of MemTotal (8 x 16g on a 125 GiB box
        # would otherwise OOM or swap, voiding the measurement).
        if "SPARK_GRAFT_CHILD_HEAP_GB" not in os.environ:
            mem_kb = 0
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemTotal:"):
                        mem_kb = int(line.split()[1])
                        break
            cap = max(4, int(mem_kb / 1024 / 1024 * 0.55 / nexec))
            os.environ["SPARK_GRAFT_CHILD_HEAP_GB"] = str(min(16, cap))
        print(f"child heap: {os.environ['SPARK_GRAFT_CHILD_HEAP_GB']}g x "
              f"{nexec} executors", file=sys.stderr)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = traces // 4

        def spawn(core_lo, core_hi, offset):
            cmd = ["taskset", "-c", f"{core_lo}-{core_hi}", sys.executable,
                   __file__, "--child", "2", "--traces", str(d),
                   "--offset", str(offset)]
            return subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True, cwd=repo)

        # pre-generate all slices (cached)
        for i in range(nexec):
            subprocess.run(
                [sys.executable, "-c",
                 "import sys; sys.path.insert(0, %r);"
                 "from traffic_engine_spark import get_spark;"
                 "from traffic_engine_spark.datagen.bench_data import ensure_bench_images;"
                 "s = get_spark(cores=16);"
                 "ensure_bench_images(s, %r, n_traces=%d, trace_offset=%d); s.stop()"
                 % (repo, os.path.join(BENCH_DIR, f"images_{d}" + (f"_off{i*d}" if i else "")), d, i * d)],
                cwd=repo, capture_output=True, text=True)

        # host-load attribution per phase (tools/hostload.py): the round-4
        # stall phases degrade exactly this measurement — outside-VM CPU
        # competing for memory bandwidth hits the K-executor phase hardest
        # (single-exec walls barely move).  external_frac > ~2% during a
        # phase means the efficiency number reflects the window, not the
        # engine; re-run in a calm window.
        from hostload import (
            LoadMonitor,
            fault_probe,
            fault_probe_fresh,
            fault_ramp,
            membw_probe,
        )

        def wait_fault_calm(
            tag: str,
            min_gibs: float = float(os.environ.get("SPARK_GRAFT_FAULT_MIN", "1.0")),
            budget_s: float = float(os.environ.get("SPARK_GRAFT_FAULT_WAIT", "180")),
        ) -> float:
            """RAMP the host's page-allocation credit before the phase
            starts: the throttle is reactive (hostload.fault_ramp), so
            allocating through it lifts it where passive waiting would
            preserve it.  Bounded + disclosed, same contract as
            bench.py's gate."""
            fr, spent, loops = fault_ramp(min_gibs, budget_s)
            if fr < min_gibs:
                print(f"{tag}: fault ramp budget exhausted at {fr} GiB/s "
                      f"after {spent} s / {loops} loops — proceeding "
                      "throttled", file=sys.stderr)
            elif loops > 1:
                print(f"{tag}: fault rate ramped to {fr} GiB/s in {spent} s "
                      f"({loops} loops)", file=sys.stderr)
            return fr

        def wait_membw(
            tag: str,
            min_gibs: float = float(os.environ.get("SPARK_GRAFT_MEMBW_MIN", "30")),
            budget_s: float = float(os.environ.get("SPARK_GRAFT_MEMBW_WAIT", "900")),
        ) -> float:
            """Hold the phase until the memory-bandwidth canary reads
            clean.  Unlike the reactive allocation throttle (which must be
            ramped through), the bandwidth phase is external — waiting IS
            the correct response; a phase started at membw 20-27 GiB/s
            measures the host, not the plan (ledger: attempts 1-2 flapped
            mid-run).  Bounded + disclosed like every other gate."""
            t0 = time.time()
            while True:
                bw = membw_probe()
                if bw >= min_gibs or time.time() - t0 >= budget_s:
                    if bw < min_gibs:
                        print(f"{tag}: membw wait budget exhausted at "
                              f"{bw:.1f} GiB/s — proceeding degraded",
                              file=sys.stderr)
                    return round(bw, 2)
                time.sleep(20)

        mon = LoadMonitor()
        fault_fresh_pre = fault_probe_fresh()
        membw_pre = wait_membw("single_phase")
        fault_pre = wait_fault_calm("single_phase")
        vm0 = vm_snap()
        h0 = mon.snapshot()
        single = json.loads(
            subprocess.run(["taskset", "-c", "0-1", sys.executable, __file__,
                            "--child", "2", "--traces", str(d)],
                           capture_output=True, text=True, cwd=repo).stdout.strip().splitlines()[-1])
        h1 = mon.snapshot()
        vm1 = vm_snap()
        membw_mid = wait_membw("multi_phase")
        fault_mid = wait_fault_calm("multi_phase")
        vm2 = vm_snap()
        procs = [spawn(i * 2, i * 2 + 1, i * d) for i in range(nexec)]
        outs = [json.loads(p.communicate()[0].strip().splitlines()[-1]) for p in procs]
        h2 = mon.snapshot()
        vm3 = vm_snap()
        fault_post = round(fault_probe(), 3)
        fault_fresh_post = fault_probe_fresh()
        membw_end = round(membw_probe(), 2)
        load = {"single_phase": mon.window(h0, h1), "multi_phase": mon.window(h1, h2),
                # first-touch page-fault rate (GiB/s) around each phase —
                # the host-throttle discriminator CPU attribution misses
                # (hostload.fault_probe; clean = several GiB/s, throttle
                # phase = 0.02-0.04)
                "fault_gibs": [fault_pre, fault_mid, fault_post],
                # COLD-credit probes: the per-process throttle means the
                # in-parent numbers above read the parent's earned credit,
                # not what freshly spawned JVMs/workers experience
                # (hostload.fault_probe_fresh) — these are the window
                # classifiers; the in-child worker ramps are the mitigation
                "fault_fresh_gibs": [fault_fresh_pre, fault_fresh_post],
                "membw_gibs": [membw_pre, membw_mid, membw_end],
                # reclaim/compaction stall deltas per phase (vm_snap doc)
                "vmstat_single": vm_delta(vm0, vm1),
                "vmstat_multi": vm_delta(vm2, vm3)}
        slowest = max(o["wall_sec"] for o in outs)
        weak = single["wall_sec"] / slowest
        agg_rows = sum(o["rows"] for o in outs)
        print(json.dumps({
            "protocol": f"1 executor (2 cores) on D vs {nexec} executor JVMs (2 cores each, disjoint pins) on {nexec} disjoint D slices",
            "n_executors": nexec,
            "single_executor": single,
            "executors_4x": outs,
            "weak_scaling_efficiency": round(weak, 3),
            "aggregate_rows_per_sec_4x": int(agg_rows / slowest),
            "host_load": load,
            "target": 0.8,
            "weak_pass": weak >= 0.8,
        }))
        return

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def child(cpus, tr):
        # taskset pins the whole process: local[N]'s JVM background threads
        # (GC, netty, parquet) would otherwise use extra machine cores and
        # understate the small-N walls
        cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, __file__,
               "--child", str(cpus), "--traces", str(tr)]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=repo)
        if out.returncode != 0:
            print(out.stderr[-3000:], file=sys.stderr)
            sys.exit(1)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"local[{cpus}] traces={tr}: {r}", file=sys.stderr)
        return r

    for tr in (traces // 4, traces):
        gen = subprocess.run(
            [sys.executable, __file__, "--gen", "--traces", str(tr)],
            capture_output=True, text=True, cwd=repo)
        if gen.returncode != 0:
            print(gen.stderr[-3000:], file=sys.stderr)
            sys.exit(1)
        print(f"input ready: {gen.stdout.strip()}", file=sys.stderr)

    n_small = child(2, traces // 4)   # N cores, D rows      (weak baseline)
    n_big = child(2, traces)          # N cores, 4D rows     (strong baseline)
    n4_big = child(8, traces)         # 4N cores, 4D rows

    strong = (n_big["wall_sec"] / n4_big["wall_sec"]) / 4.0
    weak = n_small["wall_sec"] / n4_big["wall_sec"]
    summary = {
        "job": "traffic pipeline (decode->pair->cell join->refine->kernel->histogram) + tile assignment",
        "N2_smallD": n_small, "N2_bigD": n_big, "N8_bigD": n4_big,
        "strong_scaling_efficiency": round(strong, 3),
        "weak_scaling_efficiency": round(weak, 3),
        "target": 0.8,
        "weak_pass": weak >= 0.8,
    }
    print(json.dumps(summary))
    print("update BENCH.md with these numbers", file=sys.stderr)


if __name__ == "__main__":
    main()
