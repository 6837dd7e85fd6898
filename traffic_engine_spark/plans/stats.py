"""Statistics plans (SURVEY §2.4): histogram accumulation, rollups,
summary statistics, type statistics, Welch t-test — all native Spark SQL
aggregation (partial+final for free), zero UDFs.

The reference's sparse per-(segment, week) histogram map
(data/stats/SegmentStatistics.java) becomes *rows* of a
``speed_histograms`` table: (segment_id, week, hour_of_week, speed_bin, n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.binning import bin_mean_col, hour_of_week_col, speed_bin_col, week_col


def histograms(samples: DataFrame) -> DataFrame:
    """A2 — StatsDataStore.save binning (StatsDataStore.java:140-162):
    one hash aggregation."""
    return (
        samples.select(
            "segment_id",
            week_col(F.col("time")).alias("week"),
            hour_of_week_col(F.col("time")).alias("hour_of_week"),
            speed_bin_col(F.col("speed")).alias("speed_bin"),
        )
        .groupBy("segment_id", "week", "hour_of_week", "speed_bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cumulative_rollup(hist: DataFrame) -> DataFrame:
    """A3 — all-weeks rollup (StatsDataStore.loadSegmentStats:164-173).
    The reference's 60-min Caffeine cache becomes a materialised table."""
    return hist.groupBy("segment_id", "hour_of_week", "speed_bin").agg(
        F.sum("n").alias("n")
    )


def summary_stats(
    hist: DataFrame,
    by_hour: bool = False,
    weeks: list[int] | None = None,
    hours: list[int] | None = None,
    normalize: bool = False,
) -> DataFrame:
    """A4/A5 — SummaryStatistics (data/stats/SummaryStatistics.java:69-162):
    weighted mean over bin means, *population* stddev, optional hour filter
    and per-segment count normalisation, as one agg over histogram rows.

    bin mean = (bin - 0.5)/3.6 m/s (SegmentStatistics.java:61-63).
    """
    df = hist
    if weeks:
        df = df.filter(F.col("week").isin(weeks))
    if hours:
        df = df.filter(F.col("hour_of_week").isin(hours))

    w = F.col("n").cast("double")
    if normalize:
        # weight n / count(segment) (SummaryStatistics.java:46-50)
        seg_tot = df.groupBy("segment_id").agg(F.sum("n").alias("seg_n"))
        df = df.join(seg_tot, "segment_id")
        w = F.col("n").cast("double") / F.col("seg_n").cast("double")

    mean_speed = bin_mean_col(F.col("speed_bin"))
    keys = ["segment_id"] + (["hour_of_week"] if by_hour else [])
    return (
        df.withColumn("w", w)
        .withColumn("ws", mean_speed * F.col("w"))
        .groupBy(*keys)
        .agg(
            F.sum("w").alias("count"),
            (F.sum("ws") / F.sum("w")).alias("mean_ms"),
            F.sqrt(
                (F.sum(mean_speed * mean_speed * F.col("w")) / F.sum("w"))
                - F.pow(F.sum("ws") / F.sum("w"), F.lit(2.0))
            ).alias("stddev_ms"),
        )
    )


def type_stats(samples_with_type: DataFrame) -> DataFrame:
    """A6 — TypeStatistics (data/stats/TypeStatistics.java:7-48)."""
    return samples_with_type.groupBy("street_type").agg(
        F.count(F.lit(1)).alias("count"),
        F.sum("speed").alias("sum_speed"),
        F.avg("speed").alias("avg_speed"),
    )


def welch_t_test(
    stats1: DataFrame, stats2: DataFrame, strict_parity: bool = False
) -> DataFrame:
    """A7 — SummaryStatisticsComparison (SummaryStatisticsComparison.java:19-244).

    Joined on segment_id; emits mean difference, % difference, combined
    stddev sqrt(s1²/n1 + s2²/n2), and Satterthwaite df.  The reference has
    two bugs (stats1 used for both sides, :75-81 and :117-118,133-134);
    ``strict_parity=True`` reproduces them, default fixes them
    (SURVEY §7.4.2).
    """
    a = stats1.select(
        "segment_id",
        F.col("count").alias("n1"),
        F.col("mean_ms").alias("mean1"),
        F.col("stddev_ms").alias("sd1"),
    )
    b = stats2.select(
        "segment_id",
        F.col("count").alias("n2"),
        F.col("mean_ms").alias("mean2"),
        F.col("stddev_ms").alias("sd2"),
    )
    j = a.join(b, "segment_id")
    sd2_eff = F.col("sd1") if strict_parity else F.col("sd2")
    n2_eff = F.col("n1") if strict_parity else F.col("n2")
    v1 = F.pow(F.col("sd1"), F.lit(2.0)) / F.col("n1")
    v2 = F.pow(sd2_eff, F.lit(2.0)) / n2_eff
    combined = F.sqrt(v1 + v2)
    df_sw = F.pow(v1 + v2, F.lit(2.0)) / (
        F.pow(v1, F.lit(2.0)) / (F.col("n1") - 1)
        + F.pow(v2, F.lit(2.0)) / (n2_eff - 1)
    )
    return j.select(
        "segment_id",
        (F.col("mean1") - F.col("mean2")).alias("mean_diff"),
        ((F.col("mean1") - F.col("mean2")) / F.col("mean2") * 100.0).alias("pct_diff"),
        combined.alias("combined_stddev"),
        df_sw.alias("df"),
        ((F.col("mean1") - F.col("mean2")) / combined).alias("t_stat"),
    )


def percentiles_from_histogram(hist: DataFrame, ps: list[float] = (0.25, 0.5, 0.75)) -> DataFrame:
    """Quartile queries implied by the protobuf export schema (SURVEY
    Appendix A) — cumulative-sum over speed bins per segment."""
    from pyspark.sql import Window

    agg = hist.groupBy("segment_id", "speed_bin").agg(F.sum("n").alias("n"))
    w = Window.partitionBy("segment_id").orderBy("speed_bin")
    tot = Window.partitionBy("segment_id")
    cum = agg.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(tot)
    )
    exprs = [
        F.min(
            F.when(F.col("cum") >= F.col("total") * F.lit(p), F.col("speed_bin"))
        ).alias(f"p{int(p * 100)}")
        for p in ps
    ]
    return cum.groupBy("segment_id").agg(*exprs)
