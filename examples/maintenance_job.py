#!/usr/bin/env python
"""Periodic table-maintenance job (Iceberg ``rewrite_data_files`` twin,
`sources/maintenance.py`) — run it on a schedule against any engine
output or ingest table that accretes small files:

    sh tools/package_pyfiles.sh
    spark-submit \
        --py-files dist/traffic_engine_spark.zip \
        --num-executors $N --executor-cores 2 --executor-memory 8g \
        examples/maintenance_job.py \
        --table s3://bucket/images/ \
        --out   s3://bucket/images_rw/ \
        --target-file-mb 128 \
        [--cluster lat,lon] [--zoom 15]

With ``--cluster`` the rewrite range-partitions on the Morton key of the
two named columns so every output file owns a DISJOINT key range —
spatial predicates (packed-cell probes, tile queries) then skip whole
files off parquet footer stats.  Without it, a pure narrow binpack.

The rewrite lands in ``--out`` (NEW directory); at warehouse scale the
swap is the catalog commit — never rewrite a directory a reader may be
scanning.  Emits the stats JSON on stdout for the scheduler's log.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

try:
    from traffic_engine_spark import get_spark
    from traffic_engine_spark.sources.maintenance import compact_table
except ModuleNotFoundError:  # local run without --py-files: repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from traffic_engine_spark import get_spark
    from traffic_engine_spark.sources.maintenance import compact_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="parquet table path to rewrite")
    ap.add_argument("--out", required=True, help="destination directory (new)")
    ap.add_argument("--target-file-mb", type=float, default=128.0)
    ap.add_argument(
        "--cluster", default=None,
        help="lat,lon column pair for the Morton-clustered rewrite",
    )
    ap.add_argument("--zoom", type=int, default=None,
                    help="Morton key zoom (default: engine Z_ITEM)")
    args = ap.parse_args()

    spark = get_spark(app_name="table-maintenance")
    try:
        kwargs = {}
        if args.cluster:
            lat_col, lon_col = (c.strip() for c in args.cluster.split(","))
            kwargs["cluster"] = (lat_col, lon_col)
        if args.zoom is not None:
            kwargs["zoom"] = args.zoom
        stats = compact_table(
            spark, args.table, args.out,
            target_file_mb=args.target_file_mb, **kwargs,
        )
        print(json.dumps(stats))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
