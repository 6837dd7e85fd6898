"""Host-load attribution for benchmark windows.

The box this engine is benchmarked on shows minutes-long phases where
CPU load 10-20 appears from OUTSIDE the benchmark (no local process of
ours consuming it) and every Spark job runs 1.6-5x slower (BENCH.md
round-4 note).  To stop those phases silently contaminating recorded
numbers, each timed bench entry samples:

- /proc/stat totals       -> whole-box busy + steal jiffies
- our own process tree    -> jiffies attributable to the bench itself
  (driver python + JVM + pyspark workers), accumulated by a background
  sampler thread so processes that EXIT inside the window still count

and computes, over the entry's wall window:

    external_frac = (box_busy - our_tree) / box_capacity
    steal_frac    = steal / box_capacity

Why a sampler and not a point-in-time tree walk + cutime rollups: the
scaling bench's measured work runs in taskset-pinned child processes
whose py4j JVM (and its pyspark daemon workers) is not reliably
wait()ed before the child exits — at the closing snapshot the whole
job's CPU had left the tree unreaped and was misattributed as
EXTERNAL.  The signature was unmistakable: single-executor phases read
external ~= 2/32 cores and 4-executor phases ~= 7-8/32, bit-stable
across wildly different real load windows (scaling_r5_attempts.jsonl:
0.2228/0.2231/0.225).  The sampler polls the live descendant tree
(utime+stime only, keyed by (pid, starttime) against pid reuse) every
``sample_interval`` seconds, so each process's burn is captured while
it lives; only the final < interval of a dying process is lost, which
undercounts *us* by at most interval x its cores (conservative: errs
toward flagging contamination, never toward hiding it).  cutime is no
longer read at all — mixing rollups with live samples double-counts.

An entry is CONTAMINATED when either exceeds its threshold: someone
else was using the machine (or the hypervisor was stealing cycles)
while the stopwatch ran.  bench.py re-runs contaminated entries and
annotates every attempt in the output JSON, so cross-round comparisons
no longer depend on prose disclaimers about noisy windows.
"""

from __future__ import annotations

import os
import threading
import time

_CLK = os.sysconf("SC_CLK_TCK")


def membw_probe(threads: int = 4, mb: int = 512, seconds: float = 2.5) -> float:
    """Aggregate memory-copy bandwidth (GiB/s) sustained by ``threads``
    concurrent numpy copies of ``mb``-MiB buffers for ~``seconds``.

    Why this exists: this VM has throttle phases where memory bandwidth
    drops sharply with ZERO signal in CPU accounting — no steal, no
    external busy jiffies; our own processes just retire fewer
    instructions per cycle (BENCH.md round-5 scaling notes: identical
    code+input, externally-clean windows, 4x2-core walls 47.8-108 s).
    A 2-3 s copy probe with a working set far beyond the 260 MiB L3
    reads the CURRENT bandwidth directly, so benchmark harnesses can
    classify the phase before/after a timed section instead of
    inferring it from inflated walls.  Counted bytes are buffer size
    per copy (each copy moves 2x that through DRAM; the figure is a
    relative phase indicator, not a STREAM-comparable absolute)."""
    import threading as _threading

    import numpy as np

    moved = [0] * threads
    # allocate + fault the buffers BEFORE the clock starts: first-touch
    # page faults are not the bandwidth being measured (and in a
    # throttled phase they can eat the whole window)
    bufs = []
    for _ in range(threads):
        src = np.ones(mb * 1024 * 1024 // 8, dtype=np.int64)
        dst = np.empty_like(src)
        np.copyto(dst, src)
        bufs.append((src, dst))

    stop_at = time.time() + seconds

    def worker(i: int) -> None:
        src, dst = bufs[i]
        while True:
            np.copyto(dst, src)  # releases the GIL
            moved[i] += src.nbytes
            if time.time() >= stop_at:
                break

    ts = [_threading.Thread(target=worker, args=(i,)) for i in range(threads)]
    t0 = time.time()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return sum(moved) / (time.time() - t0) / (1 << 30)


def cpu_probe(threads: int = 4, seconds: float = 1.5) -> float:
    """Aggregate compute rate (GFLOP/s) of ``threads`` concurrent
    cache-resident matmuls — DRAM-independent by construction (the
    192-KiB working set lives in L2), so it discriminates CPU-SPEED
    throttling (frequency caps, scheduler quantum starvation) from the
    bandwidth phase ``membw_probe`` reads.  Motivated by the 2026-08-18
    window where all canaries read clean (membw 32-36, fresh-fault 3.6+,
    zero external CPU) yet identical pipeline runs retired ~2.1-2.4x
    slower than the round-4 clean reference — a phase NO
    allocation/bandwidth probe can see.  Relative indicator, same caveat
    as membw_probe."""
    import threading as _threading

    import numpy as np

    n = 128  # 3 × 128² × 8 B = 384 KiB total across a/b/c — L2-resident
    flops = [0.0] * threads

    def work(i: int) -> None:
        a = np.ones((n, n)); b = np.ones((n, n))
        stop_at = time.time() + seconds
        done = 0
        while time.time() < stop_at:
            for _ in range(8):
                np.dot(a, b)
            done += 8
        flops[i] = done * 2.0 * n**3

    t0 = time.time()
    ts = [_threading.Thread(target=work, args=(i,)) for i in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return sum(flops) / (time.time() - t0) / 1e9


def fault_probe(mb: int = 256) -> float:
    """First-touch page-fault throughput (GiB/s): allocate ``mb`` MiB and
    write every page once (np.ones), return MiB faulted per second.

    THE discriminator for this VM's throttle phases: during the
    2026-08-17 deep phase the 4-thread copy rate still read a clean-level
    30 GiB/s while first-touch ran at 0.02-0.04 GiB/s (100-500x below
    the multi-GiB/s clean rate) — i.e. the host throttles page
    ALLOCATION (ballooning / overcommit reclaim), not the bandwidth of
    already-resident memory.  That is exactly the resource a Spark job
    consumes continuously (shuffle buffers, Arrow batches, Python
    workers, page cache), which is why identical code ran 2-6x slower
    with external CPU ~0 and steal under 2%.  Clean windows on this box
    fault at several GiB/s; anything under ~0.5 is a throttle phase."""
    import numpy as np

    t0 = time.time()
    buf = np.ones(mb * 1024 * 1024 // 8, dtype=np.int64)
    dt = max(time.time() - t0, 1e-9)
    del buf
    return mb / 1024.0 / dt


def fault_probe_fresh(mb: int = 256) -> float:
    """First-touch fault rate (GiB/s) measured in a FRESH subprocess.

    The throttle credit is per-process (fault_ramp docstring), so an
    in-process probe after any ramp reads the CALLER's earned credit —
    which is not what a newly spawned executor JVM or forked pyspark
    worker will experience.  Measured 2026-08-17 (this round): parent
    probes read 2.5-4 GiB/s in the same minute a fresh `np.ones(200MB)`
    subprocess ran at 0.056 GiB/s and scaling walls inflated 1.5-2x
    with CPU attribution clean.  This is the cold-credit discriminator:
    clean windows read several GiB/s fresh; under ~0.5 is a throttle
    phase that will hit every process the benchmark spawns."""
    import subprocess
    import sys

    code = (
        f"import time, numpy as np\n"
        f"t0 = time.time()\n"
        f"buf = np.ones({mb} * 1024 * 1024 // 8, dtype=np.int64)\n"
        f"print({mb} / 1024.0 / max(time.time() - t0, 1e-9))\n"
    )
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=600)
    return round(float(out.stdout.strip()), 3)


def fault_ramp(min_gibs: float = 1.0, budget_s: float = 120.0,
               mb: int = 256) -> tuple[float, float, int]:
    """Actively ramp the host's page-allocation throughput and return
    (final rate GiB/s, seconds spent, probe loops).

    Measured 2026-08-17: the throttle is REACTIVE — a cold allocator
    faults at 0.02-0.05 GiB/s, ~45 s of sustained first-touches ramps
    the same process to 3-4 GiB/s, and 20 s of idleness drops it back
    to ~0.1 (credit is mostly per-process: a fresh process after the
    ramp reads ~0.36).  Passively sleeping between probes therefore
    PRESERVES the throttle; allocating through it lifts it.  This
    hot-loops the probe (each probe IS 256 MiB of pressure) until the
    rate recovers or the budget runs out."""
    t0 = time.time()
    loops = 0
    while True:
        rate = fault_probe(mb=mb)
        loops += 1
        if rate >= min_gibs or time.time() - t0 >= budget_s:
            return rate, round(time.time() - t0, 1), loops


def _stat_totals() -> tuple[int, int, int, int]:
    """(busy, steal, iowait, ncpu) jiffies from /proc/stat cpu line.

    busy excludes idle+iowait; steal is reported separately (it is time
    the whole VM lost, not time someone inside used); iowait is
    annotation-only (our own first-touch I/O also produces it, so it
    does not gate — but a nonzero value flags disk stalls the CPU
    attribution cannot see)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    v = [int(x) for x in parts[1:]]
    # user nice system idle iowait irq softirq steal guest guest_nice —
    # guest/guest_nice are ALREADY included in user/nice by the kernel,
    # so sum only the first 8 fields or sibling-VM guest time would be
    # double-counted into busy (spurious contamination on VM hosts)
    idle = v[3] + v[4]
    steal = v[7] if len(v) > 7 else 0
    busy = sum(v[:8]) - idle - steal
    return busy, steal, v[4], os.cpu_count() or 1


def _tree_cpu_jiffies(root_pid: int) -> int:
    """utime+stime summed over root_pid's live descendant tree, plus
    cutime+cstime (reaped children) of every tree member.  One pass over
    /proc; processes that vanish mid-walk are skipped."""
    procs: dict[int, tuple[int, int]] = {}  # pid -> (ppid, self+reaped jiffies)
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        # comm may contain spaces/parens: split after the LAST ')'
        rest = raw.rsplit(")", 1)[1].split()
        # rest[1]=ppid, rest[11..14]=utime stime cutime cstime
        try:
            ppid = int(rest[1])
            jiff = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        except (IndexError, ValueError):
            continue
        procs[int(entry)] = (ppid, jiff)
    total = 0
    for pid, (ppid, jiff) in procs.items():
        p = pid
        while p > 1:
            if p == root_pid:
                total += jiff
                break
            p = procs.get(p, (0, 0))[0]
    return total


def _walk_tree_self(root_pid: int) -> dict[tuple[int, int], int]:
    """{(pid, starttime): utime+stime} over root_pid's live descendant
    tree (root included).  Self time only — no cutime/cstime, the
    sampler accounts for children directly while they live.  starttime
    (jiffies since boot, stat field 22) keys out pid reuse."""
    procs: dict[int, tuple[int, int, int]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        rest = raw.rsplit(")", 1)[1].split()
        try:
            ppid = int(rest[1])
            jiff = int(rest[11]) + int(rest[12])
            start = int(rest[19])
        except (IndexError, ValueError):
            continue
        procs[int(entry)] = (ppid, jiff, start)
    out: dict[tuple[int, int], int] = {}
    for pid, (ppid, jiff, start) in procs.items():
        p = pid
        while p > 1:
            if p == root_pid:
                out[(pid, start)] = jiff
                break
            p = procs.get(p, (0, 0, 0))[0]
    return out


class LoadMonitor:
    """Samples box-vs-us CPU attribution around a timed window.

    A daemon thread polls the descendant tree every ``sample_interval``
    seconds and accumulates, per (pid, starttime), the growth of that
    process's own utime+stime since it was first seen — processes born
    after the monitor started count from zero (their birth is dated via
    starttime), processes alive at monitor start count from their
    first-sample baseline.  ``snapshot()['tree']`` is the accumulated
    total at that instant (with a forced fresh sample), so differencing
    two snapshots attributes every descendant's burn inside the window
    even if the process exited mid-window."""

    def __init__(
        self,
        root_pid: int | None = None,
        external_frac_limit: float = 0.125,
        steal_frac_limit: float = 0.02,
        sample_interval: float = 0.5,
    ):
        self.root_pid = root_pid or os.getpid()
        self.external_frac_limit = external_frac_limit
        self.steal_frac_limit = steal_frac_limit
        self.sample_interval = sample_interval
        # jiffies-since-boot now: processes whose starttime is after this
        # were born under monitoring and count from 0
        with open("/proc/uptime") as f:
            self._t0_boot = float(f.read().split()[0]) * _CLK
        self._acc: dict[tuple[int, int], list[int]] = {}  # key -> [first, last]
        self._lock = threading.Lock()
        self._stop_evt = threading.Event()
        self._sample_once()
        self._thr = threading.Thread(
            target=self._loop, daemon=True, name="hostload-sampler"
        )
        self._thr.start()

    def _loop(self) -> None:
        while not self._stop_evt.wait(self.sample_interval):
            self._sample_once()

    def _sample_once(self) -> None:
        snap = _walk_tree_self(self.root_pid)
        with self._lock:
            for key, jiff in snap.items():
                entry = self._acc.get(key)
                if entry is None:
                    born_under_us = key[1] >= self._t0_boot
                    self._acc[key] = [0 if born_under_us else jiff, jiff]
                elif jiff > entry[1]:
                    entry[1] = jiff

    def _tree_total(self) -> int:
        self._sample_once()
        with self._lock:
            return sum(last - first for first, last in self._acc.values())

    def close(self) -> None:
        self._stop_evt.set()

    def snapshot(self) -> dict:
        busy, steal, iowait, ncpu = _stat_totals()
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        return {
            "t": time.time(),
            "busy": busy,
            "steal": steal,
            "iowait": iowait,
            "ncpu": ncpu,
            "load1": load1,
            "tree": self._tree_total(),
        }

    def window(self, before: dict, after: dict) -> dict:
        """Attribution over [before, after].  capacity = ncpu * elapsed
        jiffies; external = box busy minus our own tree's growth,
        floored at 0 (tree enumeration races can undercount us)."""
        elapsed = max(after["t"] - before["t"], 1e-9)
        capacity = after["ncpu"] * elapsed * _CLK
        ext = max(
            (after["busy"] - before["busy"]) - (after["tree"] - before["tree"]), 0
        )
        ext_frac = ext / capacity
        steal_frac = (after["steal"] - before["steal"]) / capacity
        iowait_frac = (after["iowait"] - before["iowait"]) / capacity
        return {
            "external_frac": round(ext_frac, 4),
            "steal_frac": round(steal_frac, 4),
            "iowait_frac": round(iowait_frac, 4),
            "load1": [before["load1"], after["load1"]],
            "clean": bool(
                ext_frac <= self.external_frac_limit
                and steal_frac <= self.steal_frac_limit
            ),
        }
