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


BIG_ROWS = int(os.environ.get("SPARK_GRAFT_ORACLE_BIG_ROWS", "200000"))


def _duck_kind(t: str) -> str:
    t = t.upper()
    if "INT" in t:
        return "i"
    if any(x in t for x in ("DOUBLE", "FLOAT", "REAL", "DECIMAL")):
        return "f"
    if "TIMESTAMP" in t or "DATE" in t:
        return "M"
    if "BOOL" in t:
        return "b"
    return "O"


def _arrow_kind(t) -> str:
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "i"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "f"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "M"
    if pa.types.is_boolean(t):
        return "b"
    return "O"


def _proj(cols_kinds: list[tuple[str, str]], src: str) -> str:
    """Normalizing projection mirroring normalize(): sorted columns,
    floats rounded to 9 dp, timestamps at µs, ints widened to BIGINT."""
    parts = []
    for c, k in sorted(cols_kinds):
        if k == "f":
            parts.append(f'round(CAST("{c}" AS DOUBLE), 9) AS "{c}"')
        elif k == "M":
            parts.append(f'CAST("{c}" AS TIMESTAMP) AS "{c}"')
        elif k == "i":
            parts.append(f'CAST("{c}" AS BIGINT) AS "{c}"')
        else:
            parts.append(f'"{c}"')
    return f"SELECT {', '.join(parts)} FROM {src}"


def compare_big(con, name: str, spark_df, sql: str, n_spark: int) -> str | None:
    """Set-engine compare for outputs too large for single-threaded pandas
    sorts (the sf1 sweep's 10M-row entries): register the Spark result as
    Arrow, materialise the oracle, and let DuckDB prove multiset equality
    (equal counts + empty bag-difference both ways).  Returns an error
    string or None on match.  Same normalisation semantics as the pandas
    path: column order by name, floats at 9 dp, µs timestamps; dtype
    KINDS must agree (the driver hashes values as-is)."""
    tbl = spark_df.toArrow()
    con.register("_te_spark_res", tbl)
    con.sql(f"CREATE OR REPLACE TEMP TABLE _te_oracle_res AS {sql}")
    try:
        a_kinds = [(f.name, _arrow_kind(f.type)) for f in tbl.schema]
        b_kinds = [
            (r[0], _duck_kind(r[1]))
            for r in con.sql("DESCRIBE _te_oracle_res").fetchall()
        ]
        if sorted(c for c, _ in a_kinds) != sorted(c for c, _ in b_kinds):
            return (
                f"columns {sorted(c for c, _ in a_kinds)} vs "
                f"{sorted(c for c, _ in b_kinds)}"
            )
        if sorted(a_kinds) != sorted(b_kinds):
            return f"dtype kind mismatch {sorted(a_kinds)} vs {sorted(b_kinds)}"
        n_oracle = con.sql("SELECT count(*) FROM _te_oracle_res").fetchone()[0]
        if n_spark != n_oracle:
            return f"rows {n_spark} vs {n_oracle}"
        sa = _proj(a_kinds, "_te_spark_res")
        sb = _proj(b_kinds, "_te_oracle_res")
        n_diff = con.sql(
            f"SELECT count(*) FROM (({sa} EXCEPT ALL {sb}) "
            f"UNION ALL ({sb} EXCEPT ALL {sa}))"
        ).fetchone()[0]
        if n_diff:
            return f"value mismatch: {n_diff} rows differ (bag difference)"
        return None
    finally:
        con.unregister("_te_spark_res")
        con.sql("DROP TABLE IF EXISTS _te_oracle_res")


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
        from traffic_engine_spark.oracle.materialize import ensure_yardstick_oracles
        from traffic_engine_spark.queries import YARDSTICKS

        ymat = ensure_yardstick_oracles()
        for yname, (yfn, ysql) in YARDSTICKS.items():
            qs[yname] = yfn
            if ysql is not None:
                osql[yname] = ysql
            elif yname in ymat:
                osql[yname] = ymat[yname]
        if not only:
            only = set(YARDSTICKS)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_df = fn(spark, SF_DIR)
            n_spark = spark_df.count()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error {str(ex)[:300]}")
            continue
        if name not in osql:
            print(f"rows  {name}: {n_spark} rows (no oracle — rows-only)")
            continue
        if n_spark > BIG_ROWS:
            try:
                err = compare_big(con, name, spark_df, osql[name], n_spark)
            except Exception as ex:
                err = f"big-compare error {str(ex)[:300]}"
            if err:
                failures.append(name)
                print(f"FAIL  {name}: {err}")
            else:
                print(f"OK    {name}: {n_spark} rows (set-engine compare)")
            continue
        try:
            sdf = spark_df.toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error {str(ex)[:300]}")
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
