"""Small shared utilities with no intra-package dependencies."""

from __future__ import annotations

from pyspark.sql import DataFrame


def memo_rowcount(df: DataFrame) -> int:
    """Plan-time row count memoised on the DataFrame (the engine's CBO
    substitute for stats-less relations; one count() per DataFrame object,
    shared by every size-gated broadcast decision)."""
    n = getattr(df, "_te_rowcount", None)
    if n is None:
        n = df.count()
        df._te_rowcount = n
    return n
