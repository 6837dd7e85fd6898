"""Real-Iceberg write path for the store interface (VERDICT r4 #7).

`SnapshotStore` (sources/store.py) reproduces the Iceberg semantics the
engine needs on plain parquet because this sandbox has no Iceberg runtime
jar.  This module is the branch a real cluster takes WITHOUT editing call
sites: `SnapshotStore(..., table="cat.db.t")` probes the session for an
Iceberg catalog class and, when present, delegates every write to
`IcebergStoreBackend`, which emits the canonical Iceberg SQL:

  overwrite               CREATE OR REPLACE TABLE t USING iceberg AS ...
  merge_insert_if_absent  MERGE INTO t ... WHEN NOT MATCHED THEN INSERT *
  merge_sum               MERGE INTO t ... WHEN MATCHED THEN UPDATE
                          SET c = t.c + s.c ... WHEN NOT MATCHED INSERT *
  read(snapshot_id)       SELECT * FROM t VERSION AS OF <id>

op_id replay idempotence uses a companion `<t>_ops` table (op_id per
applied merge).  NOTE the companion insert is a second commit: a crash
between the MERGE and the op-log INSERT can replay one batch.  On real
Iceberg prefer writing the op_id as a snapshot summary property inside
the same commit (CommitMetadata.withCommitProperties in the Java API);
the SQL-only form here keeps the backend engine-portable and matches the
at-least-once contract the streaming sink already documents.

The SQL strings are unit-tested in-sandbox by capturing `run_sql`
(tests/test_infra.py::test_iceberg_backend_sql_shapes); the true
integration test is skip-marked on `iceberg_catalog_available`.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def iceberg_catalog_available(spark: SparkSession) -> bool:
    """Capability probe: True when the Iceberg Spark catalog class is
    loadable in this session's JVM (i.e. the runtime jar is on the
    classpath and `spark.sql.catalog.*` can point at it)."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergStoreBackend:
    """SQL-emitting twin of SnapshotStore against a real Iceberg table.

    ``run_sql`` defaults to ``spark.sql``; tests pass a capturing stub to
    assert the emitted statements without an Iceberg runtime."""

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        key_cols: list[str],
        run_sql=None,
    ):
        self.spark = spark
        self.table = table
        self.key_cols = list(key_cols)
        self.run_sql = run_sql if run_sql is not None else spark.sql

    # -- helpers ------------------------------------------------------------

    def _with_view(self, df: DataFrame, fn):
        """Register df as a temp view, run fn(view_name), drop the view.
        Dropping matters: the streaming store sink merges once per
        microbatch, and leaked per-call views would pin their DataFrames
        in the session catalog for the life of the stream."""
        name = f"_te_src_{uuid.uuid4().hex[:12]}"
        df.createOrReplaceTempView(name)
        try:
            return fn(name)
        finally:
            try:
                self.spark.catalog.dropTempView(name)
            except Exception:
                pass

    def _on(self) -> str:
        return " AND ".join(f"t.{k} = s.{k}" for k in self.key_cols)

    # -- reads --------------------------------------------------------------

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        if snapshot_id is None:
            return self.run_sql(f"SELECT * FROM {self.table}")
        return self.run_sql(
            f"SELECT * FROM {self.table} VERSION AS OF {int(snapshot_id)}"
        )

    def snapshots(self) -> DataFrame:
        """Iceberg's own metadata table — the log SnapshotStore keeps in
        metadata.json."""
        return self.run_sql(
            f"SELECT snapshot_id, parent_id, operation, summary "
            f"FROM {self.table}.snapshots ORDER BY committed_at"
        )

    # -- writes -------------------------------------------------------------

    def overwrite(self, df: DataFrame):
        return self._with_view(df, lambda v: self.run_sql(
            f"CREATE OR REPLACE TABLE {self.table} USING iceberg "
            f"AS SELECT * FROM {v}"
        ))

    def merge_insert_if_absent(self, df: DataFrame):
        """StreetDataStore.save semantics: existing key wins, within-batch
        duplicates keep the first in deterministic order (the same window
        SnapshotStore.merge_insert_if_absent applies)."""
        keys = ", ".join(self.key_cols)
        order = ", ".join(df.columns)

        def go(v):
            dedup = (
                f"SELECT * FROM (SELECT *, ROW_NUMBER() OVER "
                f"(PARTITION BY {keys} ORDER BY {order}) AS _rn FROM {v}) "
                f"WHERE _rn = 1"
            )
            return self.run_sql(
                f"MERGE INTO {self.table} t USING ({dedup}) s ON {self._on()} "
                f"WHEN NOT MATCHED THEN INSERT ({order}) "
                f"VALUES ({', '.join('s.' + c for c in df.columns)})"
            )

        return self._with_view(df, go)

    def merge_sum(self, df: DataFrame, sum_cols: list[str], op_id: str | None = None):
        """StatsDataStore.save accumulate: matched keys ADD sum_cols,
        unmatched insert.  Rewrites only touched data files — the scale
        reason this branch exists (the parquet stand-in rewrites the whole
        table per commit)."""
        if op_id is not None and self._op_id_seen(op_id):
            return None  # replay-skip: caller surfaces it in `operation`
        keys = ", ".join(self.key_cols)
        sums = ", ".join(f"SUM({c}) AS {c}" for c in sum_cols)
        updates = ", ".join(f"t.{c} = t.{c} + s.{c}" for c in sum_cols)
        cols = self.key_cols + list(sum_cols)

        def go(v):
            agg = f"SELECT {keys}, {sums} FROM {v} GROUP BY {keys}"
            return self.run_sql(
                f"MERGE INTO {self.table} t USING ({agg}) s ON {self._on()} "
                f"WHEN MATCHED THEN UPDATE SET {updates} "
                f"WHEN NOT MATCHED THEN INSERT ({', '.join(cols)}) "
                f"VALUES ({', '.join('s.' + c for c in cols)})"
            )

        result = self._with_view(df, go)
        if op_id is not None:
            self._record_op_id(op_id)
        return result if result is not None else True

    # -- lifecycle ------------------------------------------------------------

    def _catalog(self) -> str:
        # `catalog.db.table` -> `catalog`; a bare `db.table` name runs the
        # procedure against the session catalog (`spark_catalog`), which is
        # Iceberg's own default for unqualified CALLs
        parts = self.table.split(".")
        return parts[0] if len(parts) >= 3 else "spark_catalog"

    def expire_snapshots(
        self, retain_last: int = 1, older_than_ts: float | None = None
    ):
        """Canonical `CALL catalog.system.expire_snapshots(...)` — Iceberg
        removes the expired snapshots' metadata AND any data files only
        they reference."""
        args = [f"table => '{self.table}'", f"retain_last => {int(retain_last)}"]
        if older_than_ts is not None:
            stamp = time.strftime(
                "%Y-%m-%d %H:%M:%S", time.gmtime(older_than_ts)
            )
            args.append(f"older_than => TIMESTAMP '{stamp}'")
        return self.run_sql(
            f"CALL {self._catalog()}.system.expire_snapshots({', '.join(args)})"
        )

    def remove_orphan_files(self):
        return self.run_sql(
            f"CALL {self._catalog()}.system.remove_orphan_files"
            f"(table => '{self.table}')"
        )

    def changes(self, start_snapshot_id: int, end_snapshot_id: int | None = None):
        """Iceberg changelog scan via the create_changelog_view procedure
        (reads only the data files the commits between the two snapshots
        touched), then selects the standard CDC columns.  The `_change_type`
        vocabulary matches SnapshotStore.changes exactly."""
        opts = [f"'start-snapshot-id', '{int(start_snapshot_id)}'"]
        if end_snapshot_id is not None:
            opts.append(f"'end-snapshot-id', '{int(end_snapshot_id)}'")
        view = f"_te_changes_{uuid.uuid4().hex[:12]}"
        self.run_sql(
            f"CALL {self._catalog()}.system.create_changelog_view("
            f"table => '{self.table}', options => map({', '.join(opts)}), "
            f"changelog_view => '{view}')"
        )
        return self.run_sql(f"SELECT * FROM {view}")

    # -- op_id replay log ----------------------------------------------------

    def _ops_table(self) -> str:
        return f"{self.table}_ops"

    def _op_id_seen(self, op_id: str) -> bool:
        self.run_sql(
            f"CREATE TABLE IF NOT EXISTS {self._ops_table()} "
            f"(op_id STRING) USING iceberg"
        )
        hit = self.run_sql(
            f"SELECT 1 FROM {self._ops_table()} WHERE op_id = '{op_id}' LIMIT 1"
        )
        try:
            return len(hit.take(1)) > 0
        except AttributeError:  # capturing stub in tests
            return False

    def _record_op_id(self, op_id: str):
        self.run_sql(
            f"INSERT INTO {self._ops_table()} VALUES ('{op_id}')"
        )
