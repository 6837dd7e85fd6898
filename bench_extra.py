#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver's measurement; this file exists so the optimization round can
isolate queries per guide §1.4 without touching it).

Times named registry/yardstick queries at $SPARK_GRAFT_SF_DIR with BOTH
the bench.py methodology (.count()) and the noop sink (computes every
column, guide §1.4), and optionally writes .explain("formatted") to
plans/r06/<name>_<tag>.txt.

Usage:
    python bench_extra.py [--explain-tag before|after] [--repeat N] name...

Prints one JSON line: {"sf": ..., "queries": {name: {"count_sec": ...,
"noop_sec": ..., "rows": ...}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--explain-tag", default=None)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--no-noop", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from traffic_engine_spark import get_spark
    from traffic_engine_spark.queries import REGISTRY, YARDSTICKS

    spark = get_spark(app_name="bench_extra", cores=cpus, shuffle_partitions=cpus)
    out = {}
    for name in args.names:
        fn = (REGISTRY.get(name) or YARDSTICKS[name])[0]
        rec: dict = {}
        if args.explain_tag:
            os.makedirs("plans/r06", exist_ok=True)
            import io
            from contextlib import redirect_stdout

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"plans/r06/{name}_{args.explain_tag}.txt", "w") as f:
                f.write(buf.getvalue())
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} count #{i}")
            t0 = time.time()
            rows = fn(spark, sf_dir).count()
            rec.setdefault("count_sec", []).append(round(time.time() - t0, 3))
            rec["rows"] = rows
            if not args.no_noop:
                spark.sparkContext.setJobDescription(f"{name} noop #{i}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                rec.setdefault("noop_sec", []).append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(f"{name}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps({"sf": sf_dir, "cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
