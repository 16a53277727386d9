"""Descriptive / distribution statistics operators (SURVEY §2.4).

Reference parity:
- A6 time-of-day seasonality: EDA_initial.ipynb cell 7
- A7 daily sums: EDA_initial.ipynb cells 8,34
- A8 describe() battery: EDA_final_alltickers.py:78-110
- A11 Sharpe/PPT moment stats: single_strategy_statistics.ipynb cell 12
  — the reference uses scipy skew (g1) and kurtosis(fisher=False)
  (population moments). Spark's skewness/kurtosis are population too but
  DuckDB's are bias-corrected sample statistics, so for oracle parity we
  compute moments explicitly from power sums — the formula is then
  engine-independent.
- A12 correlation: time_series_OI.py:35-37
- A15 cumulative sums: single_strategy_statistics.ipynb cells 9-11
- P6 quantile filter: order_imbalance.py:233-237

Scale notes: every operator here is a one-pass partial+final aggregate
(power sums combine associatively). The quantile filter uses an exact
percentile for oracle parity at test scale; at 100 TB swap in
approxQuantile (same call shape, documented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def moment_stats(
    df: DataFrame, value_col: str, group_cols: list[str], annualize: float = 252.0
) -> DataFrame:
    """n/mean/std(ddof=1)/skew(g1)/excess-kurtosis(g2)/Sharpe from power
    sums (engine-independent closed forms)."""
    x = F.col(value_col)
    g = df.groupBy(*group_cols).agg(
        F.count(x).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * F.col("s2") / n + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * F.col("s3") / n
        + 6 * mu * mu * F.col("s2") / n
        - 3 * mu * mu * mu * mu
    )
    var_samp = (F.col("s2") - n * mu * mu) / (n - 1)
    std = F.sqrt(var_samp)
    sharpe = mu / std * F.lit(float(annualize) ** 0.5)
    return g.select(
        *group_cols,
        F.col("n"),
        F.round(mu, 6).alias("mean_val"),
        F.round(std, 6).alias("std_val"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skew_g1"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("kurt_g2"),
        F.round(sharpe, 6).alias("sharpe_ann"),
    )


def moment_stats_sql(table_sql: str, value_col: str, group_cols: list[str]) -> str:
    """DuckDB mirror of :func:`moment_stats` (identical formula path)."""
    gc = ", ".join(group_cols)
    ann = 252.0**0.5
    return f"""
WITH g AS (
  SELECT {gc}, count({value_col}) AS n,
         sum({value_col}) AS s1,
         sum({value_col}*{value_col}) AS s2,
         sum({value_col}*{value_col}*{value_col}) AS s3,
         sum({value_col}*{value_col}*{value_col}*{value_col}) AS s4
  FROM ({table_sql}) GROUP BY {gc}
)
SELECT {gc}, n,
  round(s1/n, 6) AS mean_val,
  round(sqrt((s2 - n*(s1/n)*(s1/n))/(n-1)), 6) AS std_val,
  round((s3/n - 3*(s1/n)*s2/n + 2*(s1/n)*(s1/n)*(s1/n))
        / pow(s2/n - (s1/n)*(s1/n), 1.5), 6) AS skew_g1,
  round((s4/n - 4*(s1/n)*s3/n + 6*(s1/n)*(s1/n)*s2/n - 3*pow(s1/n, 4))
        / pow(s2/n - (s1/n)*(s1/n), 2) - 3, 6) AS kurt_g2,
  round((s1/n)/sqrt((s2 - n*(s1/n)*(s1/n))/(n-1)) * {ann!r}, 6) AS sharpe_ann
FROM g
"""


def quantile_filter(
    df: DataFrame, value_col: str, lo: float = 0.025, hi: float = 0.975
) -> DataFrame:
    """Keep rows with value in [q_lo, q_hi] (exact percentiles).

    Implemented as a broadcast join against the 1-row quantile frame —
    no driver collect, so the same plan works on a cluster.
    """
    q = df.agg(
        F.expr(f"percentile({value_col}, {lo})").alias("__qlo"),
        F.expr(f"percentile({value_col}, {hi})").alias("__qhi"),
    )
    return (
        df.join(F.broadcast(q))
        .filter(F.col(value_col).between(F.col("__qlo"), F.col("__qhi")))
        .drop("__qlo", "__qhi")
    )


def cumulative_sum(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_cols: list[str],
    out_col: str = "cum_sum",
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))
