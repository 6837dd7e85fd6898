#!/usr/bin/env python
"""Deterministic extra-scale testdata generator (VERDICT r4 #8).

The driver ships sf0.001/0.01/0.1; the tri-scale oracle sweep over those
caught a density-dependent kNN bug in round 4, so round 5 adds one more
octave for the spatial family.  The spatial queries derive every
coordinate from `events.event_id` arithmetic (queries.PTS_CTE), so a
bigger `events` table with the same schema is sufficient — and because
the oracle comparison is engine-vs-DuckDB ON THE SAME PARQUET, the
generator only has to match the driver's schema and value shapes, not
its exact rows.  Seeded numpy → identical bytes every run.

    python tools/gen_scale.py [--sf 0.3] [--out .bench_data/sf0.3]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

EVENT_TYPES = np.array(["click", "view", "purchase", "signup", "error"])


def gen_events(sf: float, out_dir: str) -> str:
    n = int(1_000_000 * sf)
    rng = np.random.RandomState(42)
    ts0 = pd.Timestamp("2024-01-01").value // 1000  # µs
    span = (pd.Timestamp("2024-01-31").value - pd.Timestamp("2024-01-01").value) // 1000
    offs = np.sort(rng.randint(0, span, size=n))
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            # µs precision: pandas' default ns timestamps write
            # TIMESTAMP(NANOS) parquet, which Spark's reader rejects
            "ts": pd.to_datetime((ts0 + offs), unit="us").astype("datetime64[us]"),
            "user_id": rng.randint(0, max(int(15_000 * sf), 10), size=n).astype(np.int64),
            "event_type": EVENT_TYPES[rng.randint(0, len(EVENT_TYPES), size=n)],
            "value": np.round(rng.uniform(0, 500, size=n), 2),
            "props": [f'{{"k": {int(v)}}}' for v in rng.randint(0, 100, size=n)],
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "events.parquet")
    df.to_parquet(path, index=False)
    return path


if __name__ == "__main__":
    sf = 0.3
    if "--sf" in sys.argv:
        sf = float(sys.argv[sys.argv.index("--sf") + 1])
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_data", f"sf{sf}",
    )
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    p = gen_events(sf, out)
    print(p)
