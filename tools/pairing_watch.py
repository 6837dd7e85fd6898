"""Clean-window watcher for the scaling pairing (BENCH.md round-5).

The host alternates between clean windows and degradation phases with
distinct mechanisms, each with a matching probe (tools/hostload.py):

- CPU competition / steal        -> LoadMonitor (external_frac, steal)
- page-allocation throttle       -> fault_probe_fresh (cold credit);
                                    mitigated in-run by the per-worker
                                    ramps (scaling_bench.run_child)
- memory-bandwidth degradation   -> membw_probe: clean ~35 GiB/s, the
                                    2026-08-17 evening phase read 15-25
                                    while CPU + fault probes stayed
                                    clean and every wall inflated
                                    1.5-2.3x

A 25-minute pairing launched into a degraded window wastes the window
AND records numbers that measure the host.  This watcher probes the two
cheap canaries (~15 s) and only launches the full pairing — weak
(--executors) + strong-union baseline, same window, back-to-back — when
both read clean.  Canaries are re-read after each phase; a pairing whose
end canaries degraded is recorded to the attempts ledger and retried.

Usage: python tools/pairing_watch.py [--max-hours 4] [--traces 256000]
                                     [--out-suffix NAME]
Writes: scaling_r5_exec_{suffix}.json / strong_union_r5_{suffix}.json on
        a clean pass (default suffix "watch" — never reuse a suffix that
        already names a recorded attempt: the 2026-08-18 512k run
        clobbered the voided-attempt raws BENCH.md cited),
        one ledger line per attempt to scaling_r5_attempts.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from hostload import cpu_probe, fault_probe_fresh, membw_probe  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEMBW_MIN = float(os.environ.get("SPARK_GRAFT_MEMBW_MIN", "30"))
FRESH_MIN = float(os.environ.get("SPARK_GRAFT_FAULT_MIN", "1.0"))

# Fixed-cost model of the measured job itself, validated in the clean
# 256k window (every phase within +-3%, BENCH.md): one 2-pinned-core
# executor runs a slice of R rows in ~12 s fixed + 31.3 s per 13.3M
# rows.  MODEL_RATIO_MIN gates each phase's model_wall/actual_wall —
# the strongest window classifier we have: the 2026-08-18 06:48Z
# attempt read every probe canary clean yet its 4x phases ran at
# ratio 0.58-0.60 (weak 0.576), and the 08:03Z attempt (builder pytest
# raced in) at 0.25-0.27, while genuinely clean phases sit at
# 1.00-1.03.  The gate is symmetric — a slow SINGLE phase (which would
# inflate weak efficiency) voids the attempt exactly the same way —
# and every voided attempt still lands in the ledger.
MODEL_FIXED_S = 12.0
MODEL_S_PER_13M = 31.3


def model_ratio(rows: int, wall_sec: float) -> float:
    return round((MODEL_FIXED_S + MODEL_S_PER_13M * rows / 13.3e6) / wall_sec, 3)


MODEL_RATIO_MIN = float(os.environ.get("SPARK_GRAFT_MODEL_RATIO_MIN", "0.85"))


def probes() -> tuple[float, float]:
    """(membw GiB/s, fresh-process fault GiB/s).  The fresh probe is
    taken twice and the max kept: the first fresh process in a while
    often reads the un-ramped shared credit (0.015) that one 256 MiB
    allocation lifts — the second reading is what the pairing's
    pre-ramped children will actually see."""
    bw = membw_probe()
    ff = max(fault_probe_fresh(), fault_probe_fresh())
    return round(bw, 2), round(ff, 3)


def cpu_diag() -> float:
    """Ramped CPU-speed reading (GFLOP/s), max of two — the CPU credit
    is reactive like the fault credit (0.8 cold → 4.7 after one
    probe, 2026-08-18).  DIAGNOSTIC ONLY: logged per attempt so windows
    become comparable across days; not a gate until a clean-window
    reference range exists."""
    return round(max(cpu_probe(), cpu_probe()), 2)


def ledger(entry: dict) -> None:
    entry["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(os.path.join(REPO, "scaling_r5_attempts.jsonl"), "a") as f:
        f.write(json.dumps(entry) + "\n")


def run_pairing(traces: int) -> dict:
    # sentinel so a co-located operator/agent can avoid launching heavy
    # work while a measurement is in flight (removed in main())
    open(os.path.join(REPO, ".pairing_running"), "w").write(str(os.getpid()))
    # UNION FIRST: it is the longest phase (~292 s at 512k) and the one
    # whose slowdown INFLATES strong efficiency (strong = union/(4 x
    # slowest)), so it gets the freshest just-verified window.  Residual
    # decay then lands in the short single/4x phases, where it deflates
    # both gates — measurement drift becomes conservative instead of
    # flattering (attempt 3, 09:18Z: every exec phase at model 0.99-1.06
    # but the trailing union ran 0.899 in the decay tail and would have
    # inflated strong to 0.966 vs the ~0.87 a clean union gives).
    r2 = subprocess.run(
        ["taskset", "-c", "0-1", sys.executable, "tools/scaling_bench.py",
         "--strong-union", "--traces", str(traces)],
        capture_output=True, text=True, cwd=REPO)
    u = json.loads(r2.stdout.strip().splitlines()[-1])
    # hold the exec pairing until the bandwidth canary recovers (bounded):
    # waiting is correct for the external membw phase
    t_wait = time.time()
    while time.time() - t_wait < 900:
        bw_mid, ff_mid = probes()
        if bw_mid >= MEMBW_MIN and ff_mid >= FRESH_MIN:
            break
        time.sleep(20)
    r1 = subprocess.run(
        [sys.executable, "tools/scaling_bench.py", "--executors",
         "--traces", str(traces)],
        capture_output=True, text=True, cwd=REPO)
    e = json.loads(r1.stdout.strip().splitlines()[-1])
    bw_end, ff_end = probes()
    slowest = max(o["wall_sec"] for o in e["executors_4x"])
    ratios = {"single": model_ratio(e["single_executor"]["rows"],
                                    e["single_executor"]["wall_sec"]),
              "union": model_ratio(u["rows"], u["wall_sec"])}
    for i, o in enumerate(e["executors_4x"]):
        ratios[f"x{i}"] = model_ratio(o["rows"], o["wall_sec"])
    return {
        "exec": e, "union": u,
        "weak": e["weak_scaling_efficiency"],
        "strong": round(u["wall_sec"] / slowest / 4, 3),
        "canaries": {"mid": [bw_mid, ff_mid], "end": [bw_end, ff_end]},
        "model_ratios": ratios,
    }


def main() -> None:
    max_hours = 4.0
    traces = 256000
    suffix = "watch"
    if "--max-hours" in sys.argv:
        max_hours = float(sys.argv[sys.argv.index("--max-hours") + 1])
    if "--traces" in sys.argv:
        traces = int(sys.argv[sys.argv.index("--traces") + 1])
    if "--out-suffix" in sys.argv:
        suffix = sys.argv[sys.argv.index("--out-suffix") + 1]
    t0 = time.time()
    attempt = 0
    while time.time() - t0 < max_hours * 3600:
        if os.path.exists(os.path.join(REPO, ".builder_busy")):
            # the build session is running its own Spark work — its load
            # would void the attempt exactly like external load does
            print("builder busy — sleeping", flush=True)
            time.sleep(120)
            continue
        bw, ff = probes()
        if bw < MEMBW_MIN or ff < FRESH_MIN:
            print(f"window dirty (membw {bw}, fresh {ff}) — sleeping",
                  flush=True)
            time.sleep(300)
            continue
        attempt += 1
        cpu0 = cpu_diag()
        # the probes + cpu ramp take ~20 s — re-check the builder sentinel
        # at the last instant (a build-session Spark job launched inside
        # that gap once contaminated a full attempt, 2026-08-18 07:28Z)
        if os.path.exists(os.path.join(REPO, ".builder_busy")):
            print("builder busy (post-probe) — sleeping", flush=True)
            time.sleep(120)
            continue
        print(f"attempt {attempt}: clean start (membw {bw}, fresh {ff}, "
              f"cpu {cpu0} GFLOP/s)", flush=True)
        try:
            res = run_pairing(traces)
        finally:
            try:
                os.remove(os.path.join(REPO, ".pairing_running"))
            except OSError:
                pass
        mid_bw, end_bw = res["canaries"]["mid"][0], res["canaries"]["end"][0]
        # Absolute floor AND bounded drift: the 2026-08-18 512k attempt
        # decayed 36.7 -> 33.5 -> 31.4 GiB/s — every sample above the
        # floor, yet the concurrent phases ran 33% slow.  A window whose
        # bandwidth moves >10% across the run is not one window.
        drift_ok = min(mid_bw, end_bw) >= 0.90 * bw
        ratio_ok = min(res["model_ratios"].values()) >= MODEL_RATIO_MIN
        clean = (
            mid_bw >= MEMBW_MIN and end_bw >= MEMBW_MIN and drift_ok
            and ratio_ok
            and res["exec"]["host_load"]["single_phase"]["clean"]
            and res["exec"]["host_load"]["multi_phase"]["clean"]
        )
        res["start_canaries"] = [bw, ff]
        res["cpu_gflops"] = {"start": cpu0, "end": cpu_diag()}
        res["window_clean"] = clean
        note = {
            "note": "pairing_watch attempt %d: weak %.3f strong %.3f, "
                    "canaries start(%s,%s) mid%s end%s cpu%s ratios%s -> %s"
                    % (attempt, res["weak"], res["strong"], bw, ff,
                       res["canaries"]["mid"], res["canaries"]["end"],
                       [res["cpu_gflops"]["start"], res["cpu_gflops"]["end"]],
                       sorted(res["model_ratios"].items()),
                       "CLEAN — recorded" if clean
                       else ("model-ratio floor — window decayed in-phase"
                             if not ratio_ok else "degraded mid-run")),
        }
        ledger(note)
        if not clean:
            # keep the FULL raws of voided attempts too (exec host_load,
            # vmstat deltas, per-child walls): the 2026-08-18 morning
            # series showed the void diagnosis needs the in-run channels,
            # and ledger one-liners lose them
            ts = time.strftime("%H%M%S", time.gmtime())
            with open(os.path.join(
                    REPO, f"scaling_r5_void_{suffix}_{ts}.json"), "w") as f:
                json.dump(res, f)
        if clean:
            with open(os.path.join(
                    REPO, f"scaling_r5_exec_{suffix}.json"), "w") as f:
                json.dump(res["exec"], f)
            with open(os.path.join(
                    REPO, f"strong_union_r5_{suffix}.json"), "w") as f:
                json.dump(res["union"], f)
            print(json.dumps({k: res[k] for k in
                              ("weak", "strong", "canaries", "window_clean")}),
                  flush=True)
            return
        print(f"attempt {attempt} degraded mid-run "
              f"(mid {res['canaries']['mid']}, end {res['canaries']['end']})",
              flush=True)
    print("budget exhausted without a clean window", flush=True)


if __name__ == "__main__":
    main()
