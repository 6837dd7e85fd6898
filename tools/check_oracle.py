"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 in Spark AND its oracle_sql() in DuckDB, compare row
count + schema + order-insensitive values.  Usage:

    python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def main():
    import __spark_entry__ as E
    from traffic_engine_spark import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        # extra-scale dirs (tools/gen_scale.py) carry only the tables the
        # family under test reads — register what exists
        if os.path.exists(f"{SF_DIR}/{t}.parquet"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, osql = E.queries(), E.oracle_sql()
    if "--yardsticks" in only:
        # also gate the pytest-only yardsticks (retired from the driver's
        # capped window; see REGISTRY_MANIFEST.json) against their SQL
        only.discard("--yardsticks")
        from traffic_engine_spark.queries import YARDSTICKS

        for yname, (yfn, ysql) in YARDSTICKS.items():
            qs[yname] = yfn
            if ysql is not None:
                osql[yname] = ysql
        if not only:
            only = set(YARDSTICKS)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error {str(ex)[:300]}")
            continue
        if name not in osql:
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only)")
            continue
        try:
            ddf = con.sql(osql[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {str(ex)[:300]}")
            continue
        a, b = normalize(sdf), normalize(ddf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            continue
        # the driver hashes values as-is: an int64 Spark column vs a
        # HUGEINT/float DuckDB column hash-mismatches even when the values
        # coerce equal, so a dtype-KIND mismatch must fail here too.
        def _kind(dt):
            k = dt.kind
            return "i" if k in "iu" else k
        kind_bad = [
            (c, str(a[c].dtype), str(b[c].dtype))
            for c in a.columns
            if _kind(a[c].dtype) != _kind(b[c].dtype)
        ]
        if kind_bad:
            failures.append(name)
            print(f"FAIL  {name}: dtype kind mismatch {kind_bad}")
            continue
        try:
            pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()), check_exact=False, rtol=0, atol=1e-9)
            print(f"OK    {name}: {len(a)} rows")
        except Exception as ex:
            failures.append(name)
            diff_msg = str(ex).splitlines()[:6]
            print(f"FAIL  {name}: value mismatch {' | '.join(diff_msg)}")
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
