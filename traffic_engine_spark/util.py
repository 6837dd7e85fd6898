"""Small shared utilities with no intra-package dependencies."""

from __future__ import annotations

from pyspark.sql import DataFrame


def over_rowcount(df: DataFrame, cap: int) -> bool:
    """True when df has more than ``cap`` rows.  Uses the memoised exact
    count when one exists; otherwise a limit probe — `limit(cap+1)` stops
    the scan early instead of executing the full lineage the way a bare
    count() would (the gate only needs the threshold bit, not the
    number), and the inexact result is deliberately NOT memoised."""
    n = getattr(df, "_te_rowcount", None)
    if n is not None:
        return n > cap
    return df.limit(cap + 1).count() > cap


def memo_rowcount(df: DataFrame) -> int:
    """Plan-time row count memoised on the DataFrame (the engine's CBO
    substitute for stats-less relations; one count() per DataFrame object,
    shared by every size-gated broadcast decision)."""
    n = getattr(df, "_te_rowcount", None)
    if n is None:
        n = df.count()
        df._te_rowcount = n
    return n
