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


# Student's t critical values (one-sided), NIST/SEMATECH e-Handbook of
# Statistical Methods §3.6.7.2 (the same public table the reference cites,
# SummaryStatisticsComparison.java:6).  Rows: df 1..35; cols: p90, p95,
# p97.5, p99, p99.5, p99.9.
T_CRIT = [
    [3.078, 6.314, 12.706, 31.821, 63.657, 318.313],
    [1.886, 2.920, 4.303, 6.965, 9.925, 22.327],
    [1.638, 2.353, 3.182, 4.541, 5.841, 10.215],
    [1.533, 2.132, 2.776, 3.747, 4.604, 7.173],
    [1.476, 2.015, 2.571, 3.365, 4.032, 5.893],
    [1.440, 1.943, 2.447, 3.143, 3.707, 5.208],
    [1.415, 1.895, 2.365, 2.998, 3.499, 4.782],
    [1.397, 1.860, 2.306, 2.896, 3.355, 4.499],
    [1.383, 1.833, 2.262, 2.821, 3.250, 4.296],
    [1.372, 1.812, 2.228, 2.764, 3.169, 4.143],
    [1.363, 1.796, 2.201, 2.718, 3.106, 4.024],
    [1.356, 1.782, 2.179, 2.681, 3.055, 3.929],
    [1.350, 1.771, 2.160, 2.650, 3.012, 3.852],
    [1.345, 1.761, 2.145, 2.624, 2.977, 3.787],
    [1.341, 1.753, 2.131, 2.602, 2.947, 3.733],
    [1.337, 1.746, 2.120, 2.583, 2.921, 3.686],
    [1.333, 1.740, 2.110, 2.567, 2.898, 3.646],
    [1.330, 1.734, 2.101, 2.552, 2.878, 3.610],
    [1.328, 1.729, 2.093, 2.539, 2.861, 3.579],
    [1.325, 1.725, 2.086, 2.528, 2.845, 3.552],
    [1.323, 1.721, 2.080, 2.518, 2.831, 3.527],
    [1.321, 1.717, 2.074, 2.508, 2.819, 3.505],
    [1.319, 1.714, 2.069, 2.500, 2.807, 3.485],
    [1.318, 1.711, 2.064, 2.492, 2.797, 3.467],
    [1.316, 1.708, 2.060, 2.485, 2.787, 3.450],
    [1.315, 1.706, 2.056, 2.479, 2.779, 3.435],
    [1.314, 1.703, 2.052, 2.473, 2.771, 3.421],
    [1.313, 1.701, 2.048, 2.467, 2.763, 3.408],
    [1.311, 1.699, 2.045, 2.462, 2.756, 3.396],
    [1.310, 1.697, 2.042, 2.457, 2.750, 3.385],
    [1.309, 1.696, 2.040, 2.453, 2.744, 3.375],
    [1.309, 1.694, 2.037, 2.449, 2.738, 3.365],
    [1.308, 1.692, 2.035, 2.445, 2.733, 3.356],
    [1.307, 1.691, 2.032, 2.441, 2.728, 3.348],
    [1.306, 1.690, 2.030, 2.438, 2.724, 3.340],
]

P_VALUE_COLS = {"p90": 1, "p95": 2, "p975": 3, "p99": 4, "p995": 5, "p999": 6}


def welch_t_test(
    stats1: DataFrame, stats2: DataFrame, strict_parity: bool = False,
    p_value: str = "p95",
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
    # The reference's single bug is in combinedStdDev ONLY
    # (SummaryStatisticsComparison.java:117-118): stdDev2 reads
    # stats1.getStdDev() while the divisor stays stats2.count, so the
    # strict branch substitutes sd1 in the combined-stddev/t-stat term and
    # NOWHERE else; tCrit (:173-177) uses the true sd2 and n2.
    sd2_comb = F.col("sd1") if strict_parity else F.col("sd2")
    v1 = F.pow(F.col("sd1"), F.lit(2.0)) / F.col("n1")
    v2_comb = F.pow(sd2_comb, F.lit(2.0)) / F.col("n2")
    combined = F.sqrt(v1 + v2_comb)
    # Satterthwaite df from the true variances (tCrit has no sd-swap bug)
    v2 = F.pow(F.col("sd2"), F.lit(2.0)) / F.col("n2")
    df_sw = F.pow(v1 + v2, F.lit(2.0)) / (
        F.pow(v1, F.lit(2.0)) / (F.col("n1") - 1)
        + F.pow(v2, F.lit(2.0)) / (F.col("n2") - 1)
    )
    # broadcast T_CRIT column lookup: df index = round(Satterthwaite) - 1
    # clamped to [0, 34] (SummaryStatisticsComparison.java:184-189; Java
    # Math.round = floor(x+0.5)); counts > 35 on BOTH sides short-circuit
    # to the last row (:167-168)
    crit_col = F.array(*[F.lit(row[P_VALUE_COLS[p_value] - 1]) for row in T_CRIT])
    df_idx = F.greatest(
        F.least(F.floor(df_sw + F.lit(0.5)).cast("int") - 1, F.lit(34)), F.lit(0)
    )
    df_idx = F.when((F.col("n1") > 35) & (F.col("n2") > 35), F.lit(34)).otherwise(df_idx)
    t_stat = (F.col("mean1") - F.col("mean2")) / combined
    t_crit = F.element_at(crit_col, df_idx + 1)
    # one-sided test; negative t always "true" (SummaryStatisticsComparison
    # .java:230-244 — a reference quirk, reproduced)
    significant = F.when(t_stat > 0, t_stat > t_crit).otherwise(F.lit(True))
    return j.select(
        "segment_id",
        (F.col("mean1") - F.col("mean2")).alias("mean_diff"),
        # differenceAsPercent (:90-95) divides by mean1 and returns a
        # FRACTION (no ×100) — reference semantics, reproduced as-is
        ((F.col("mean1") - F.col("mean2")) / F.col("mean1")).alias("pct_diff"),
        combined.alias("combined_stddev"),
        df_sw.alias("df"),
        t_stat.alias("t_stat"),
        t_crit.alias("t_crit"),
        significant.alias("significant"),
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
