"""Distribution-drift checks: histograms, KL divergence, quantile sketches.

No reference analog — these are the Spark-scale additions the north rule
requires (column stats + distribution-drift checks). Everything is
built-in Catalyst aggregation:

- histogram: fixed-width clamped bins via floor(), a hash aggregate with
  partial+final combine — one shuffle of at most n_bins rows per column.
- KL divergence: joined bin tables with Laplace smoothing, a few-row
  computation after the aggregates; deterministic at any parallelism.
- quantiles: percentile_approx — Spark's built-in distributed quantile
  sketch (the t-digest role); mergeable across partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(df: DataFrame, col: str, lo: float, width: float,
              n_bins: int) -> DataFrame:
    """(bin, n) fixed-width histogram, clamped to [0, n_bins-1]."""
    b = F.greatest(
        F.least(F.floor((F.col(col) - lo) / width), F.lit(n_bins - 1)),
        F.lit(0)).cast("bigint")
    return (df.where(F.col(col).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n")))


def kl_divergence(p_bins: DataFrame, q_bins: DataFrame, bin_col: str,
                  n_bins: int, smooth: float = 0.5) -> DataFrame:
    """KL(P||Q) over pre-binned columns. Input: DataFrames with a `bin`
    (or bin_col) column, one row per observation OR pre-counted (see
    kl_from_counts). Laplace smoothing `smooth` per bin so empty bins
    don't produce infinities."""
    spark = p_bins.sparkSession
    pc = p_bins.groupBy(F.col(bin_col).alias("bin")).agg(
        F.count(F.lit(1)).cast("double").alias("pc"))
    qc = q_bins.groupBy(F.col(bin_col).alias("bin")).agg(
        F.count(F.lit(1)).cast("double").alias("qc"))
    bins = spark.range(n_bins).select(F.col("id").alias("bin"))
    return kl_from_counts(bins, pc, qc, n_bins, smooth)


def _smoothed_pmfs(bins: DataFrame, pc: DataFrame, qc: DataFrame,
                   n_bins: int, smooth: float):
    """Shared scaffolding for the divergence metrics: join counts onto
    the bin grid, Laplace-smooth, return (joined_df, p_pmf, q_pmf).
    Sum over bins of (c + smooth) = total + smooth*n_bins -> proper
    pmf."""
    joined = (bins.join(pc, on="bin", how="left")
                  .join(qc, on="bin", how="left")
                  .select("bin",
                          F.coalesce("pc", F.lit(0.0)).alias("pc"),
                          F.coalesce("qc", F.lit(0.0)).alias("qc")))
    tot = joined.agg(F.sum("pc").alias("pt"), F.sum("qc").alias("qt"))
    j = joined.crossJoin(F.broadcast(tot))
    p = (F.col("pc") + smooth) / (F.col("pt") + smooth * n_bins)
    q = (F.col("qc") + smooth) / (F.col("qt") + smooth * n_bins)
    return j, p, q


def kl_from_counts(bins: DataFrame, pc: DataFrame, qc: DataFrame,
                   n_bins: int, smooth: float = 0.5) -> DataFrame:
    j, p, q = _smoothed_pmfs(bins, pc, qc, n_bins, smooth)
    return j.agg(F.sum(p * F.log(p / q)).alias("kl"))


def quantile_sketch(df: DataFrame, cols: list[str],
                    quantiles: list[float],
                    accuracy: int = 10000) -> DataFrame:
    """Distributed quantile sketch per column (percentile_approx — the
    t-digest role: mergeable per-partition sketches, bounded error
    1/accuracy). Returns (col, quantile, value)."""
    aggs = [F.percentile_approx(c, quantiles, accuracy).alias(c) for c in cols]
    row = df.agg(*aggs)
    stacked = None
    for c in cols:
        qdf = row.select(
            F.lit(c).alias("col"),
            F.posexplode(F.col(c)).alias("qi", "value"),
        )
        stacked = qdf if stacked is None else stacked.unionByName(qdf)
    qarr = F.array(*[F.lit(q) for q in quantiles])
    return stacked.select("col",
                          F.element_at(qarr, F.col("qi") + 1).alias("quantile"),
                          "value")


def drift_report(cur: DataFrame, ref: DataFrame, cols: list[str],
                 n_bins: int = 32, kl_threshold: float = 0.05) -> DataFrame:
    """Per-column KL(cur || ref) with shared binning derived from ref's
    min/max (stable binning => deterministic, comparable across runs)."""
    spark = cur.sparkSession
    bounds = ref.agg(*[f for c in cols for f in
                       (F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max"))]
                     ).collect()[0]
    out = None
    for c in cols:
        lo = float(bounds[f"{c}_min"] or 0.0)
        hi = float(bounds[f"{c}_max"] or 1.0)
        width = (hi - lo) / n_bins or 1.0
        cb = histogram(cur, c, lo, width, n_bins) \
            .select("bin", F.col("n").cast("double").alias("pc"))
        rb = histogram(ref, c, lo, width, n_bins) \
            .select("bin", F.col("n").cast("double").alias("qc"))
        bins = spark.range(n_bins).select(F.col("id").alias("bin"))
        kl = kl_from_counts(bins, cb, rb, n_bins) \
            .select(F.lit(c).alias("col"), F.round("kl", 6).alias("kl"),
                    (F.col("kl") > kl_threshold).alias("drifted"))
        out = kl if out is None else out.unionByName(kl)
    return out


def js_from_counts(bins: DataFrame, pc: DataFrame, qc: DataFrame,
                   n_bins: int, smooth: float = 0.5) -> DataFrame:
    """Jensen-Shannon divergence from pre-counted bins: symmetric and
    bounded by ln(2), so thresholds transfer across column scales
    (KL(P||Q) is unbounded and direction-dependent). Same smoothing and
    physical shape as kl_from_counts — one few-row join after the
    aggregates."""
    j, p, q = _smoothed_pmfs(bins, pc, qc, n_bins, smooth)
    m = (p + q) / 2
    return j.agg(F.sum(0.5 * p * F.log(p / m)
                       + 0.5 * q * F.log(q / m)).alias("js"))


def js_divergence(p_bins: DataFrame, q_bins: DataFrame, bin_col: str,
                  n_bins: int, smooth: float = 0.5) -> DataFrame:
    """JS divergence over per-observation binned inputs (see
    kl_divergence for the counting shape)."""
    spark = p_bins.sparkSession
    pc = p_bins.groupBy(F.col(bin_col).alias("bin")).agg(
        F.count(F.lit(1)).cast("double").alias("pc"))
    qc = q_bins.groupBy(F.col(bin_col).alias("bin")).agg(
        F.count(F.lit(1)).cast("double").alias("qc"))
    bins = spark.range(n_bins).select(F.col("id").alias("bin"))
    return js_from_counts(bins, pc, qc, n_bins, smooth)
