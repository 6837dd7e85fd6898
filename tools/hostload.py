"""Host-load attribution for benchmark windows.

The box this engine is benchmarked on shows minutes-long phases where
CPU load 10-20 appears from OUTSIDE the benchmark (no local process of
ours consuming it) and every Spark job runs 1.6-5x slower (BENCH.md
round-4 note).  To stop those phases silently contaminating recorded
numbers, each timed bench entry samples:

- /proc/stat totals       -> whole-box busy + steal jiffies
- our own process tree    -> jiffies attributable to the bench itself
  (driver python + JVM + pyspark workers; reaped children roll up via
  cutime/cstime)

and computes, over the entry's wall window:

    external_frac = (box_busy - our_tree) / box_capacity
    steal_frac    = steal / box_capacity

An entry is CONTAMINATED when either exceeds its threshold: someone
else was using the machine (or the hypervisor was stealing cycles)
while the stopwatch ran.  bench.py re-runs contaminated entries and
annotates every attempt in the output JSON, so cross-round comparisons
no longer depend on prose disclaimers about noisy windows.
"""

from __future__ import annotations

import os
import time

_CLK = os.sysconf("SC_CLK_TCK")


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


class LoadMonitor:
    """Samples box-vs-us CPU attribution around a timed window."""

    def __init__(
        self,
        root_pid: int | None = None,
        external_frac_limit: float = 0.125,
        steal_frac_limit: float = 0.02,
    ):
        self.root_pid = root_pid or os.getpid()
        self.external_frac_limit = external_frac_limit
        self.steal_frac_limit = steal_frac_limit

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
            "tree": _tree_cpu_jiffies(self.root_pid),
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
