"""M8 rolling-window refit + A14 distribution test, Spark-first.

The reference's rolling refit (trading_strategy.py:138-245) re-derives
five days of OI from raw archives and re-fits sklearn per day — a
driver loop over the whole pipeline. Here the same semantics become
ONE distributed pass: per-day OLS sufficient statistics (Gram sums are
associative) + a window sum over the trailing training days + the
closed-form solve — no iteration, no re-reads, fully SQL-expressible
(so the whole M8 path is oracle-checked). Integer-cents sums make the
fitted coefficients bit-identical across engines.

A14 (anderson/mannwhitney across groups, direction_analysis.ipynb
cells 75-80): scipy is not distributed; instead the Mann-Whitney U
statistic with normal approximation is computed from average ranks —
rank sums ARE distributable window/agg expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dissertation_iceberg_spark.io import load_table
from dissertation_iceberg_spark.queries.registry import register

TRAIN_DAYS = 5

_DAILY_SQL = """
SELECT user_id, date_trunc('day', ts) AS day,
       sum(CAST(round(value * 100) AS BIGINT)) AS x
FROM events GROUP BY 1, 2
"""

_ROLLING_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
xy AS (
  SELECT *, lead(x) OVER (PARTITION BY user_id ORDER BY day) AS y
  FROM daily),
day_gram AS (
  SELECT day,
         count(y) AS n,
         sum(CASE WHEN y IS NOT NULL THEN x ELSE 0 END) AS sx,
         sum(CASE WHEN y IS NOT NULL THEN y ELSE 0 END) AS sy,
         sum(CASE WHEN y IS NOT NULL THEN x * y ELSE 0 END) AS sxy,
         sum(CASE WHEN y IS NOT NULL THEN x * x ELSE 0 END) AS sxx
  FROM xy GROUP BY day),
trail AS (
  SELECT day,
         sum(n)   OVER w AS tn,
         sum(sx)  OVER w AS tsx,
         sum(sy)  OVER w AS tsy,
         sum(sxy) OVER w AS tsxy,
         sum(sxx) OVER w AS tsxx
  FROM day_gram
  WINDOW w AS (ORDER BY day ROWS BETWEEN {TRAIN_DAYS} PRECEDING AND 1 PRECEDING)),
beta AS (
  SELECT day,
         CAST(tn AS BIGINT) AS n_train,
         (tsxy - CAST(tsx AS DOUBLE) * tsy / tn)
           / (tsxx - CAST(tsx AS DOUBLE) * tsx / tn) AS slope,
         (tsy - (tsxy - CAST(tsx AS DOUBLE) * tsy / tn)
                / (tsxx - CAST(tsx AS DOUBLE) * tsx / tn) * tsx) / tn AS intercept
  FROM trail
  WHERE tn >= 2 AND (tsxx - CAST(tsx AS DOUBLE) * tsx / tn) <> 0)
SELECT d.day, d.user_id,
       round(b.slope, 6) AS slope,
       round((b.intercept + b.slope * d.x) / 100.0, 6) AS signal_hat,
       b.n_train
FROM daily d JOIN beta b ON d.day = b.day
"""


@register("rolling_refit_signal", oracle=_ROLLING_ORACLE)
def rolling_refit_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8: per-day model refit on the trailing {TRAIN_DAYS}-day window,
    predicting today's signal — associative Gram-sum formulation (one
    aggregation + one window; no driver loop, no data re-reads)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
    wl = Window.partitionBy("user_id").orderBy("day")
    xy = daily.withColumn("y", F.lead("x", 1).over(wl))
    has_y = F.col("y").isNotNull()
    day_gram = xy.groupBy("day").agg(
        F.count("y").alias("n"),
        F.sum(F.when(has_y, F.col("x")).otherwise(F.lit(0))).alias("sx"),
        F.sum(F.when(has_y, F.col("y")).otherwise(F.lit(0))).alias("sy"),
        F.sum(F.when(has_y, F.col("x") * F.col("y")).otherwise(F.lit(0))).alias("sxy"),
        F.sum(F.when(has_y, F.col("x") * F.col("x")).otherwise(F.lit(0))).alias("sxx"),
    )
    wt = Window.orderBy("day").rowsBetween(-TRAIN_DAYS, -1)
    trail = day_gram.select(
        "day",
        F.sum("n").over(wt).alias("tn"),
        F.sum("sx").over(wt).alias("tsx"),
        F.sum("sy").over(wt).alias("tsy"),
        F.sum("sxy").over(wt).alias("tsxy"),
        F.sum("sxx").over(wt).alias("tsxx"),
    )
    tn = F.col("tn")
    ssx = F.col("tsxx") - F.col("tsx").cast("double") * F.col("tsx") / tn
    sxy_c = F.col("tsxy") - F.col("tsx").cast("double") * F.col("tsy") / tn
    slope = sxy_c / ssx
    intercept = (F.col("tsy") - slope * F.col("tsx")) / tn
    beta = (
        trail.filter((tn >= 2) & (ssx != 0))
        .select(
            "day",
            tn.cast("long").alias("n_train"),
            slope.alias("slope"),
            intercept.alias("intercept"),
        )
    )
    return daily.join(F.broadcast(beta), "day").select(
        "day",
        "user_id",
        F.round("slope", 6).alias("slope"),
        F.round((F.col("intercept") + F.col("slope") * F.col("x")) / 100.0, 6).alias(
            "signal_hat"
        ),
        "n_train",
    )


# --------------------------------------------------------------------------
# A14: Mann-Whitney U via distributed average ranks
# --------------------------------------------------------------------------

_GROUP_A, _GROUP_B = "click", "error"

_MWU_ORACLE = f"""
WITH s AS (
  SELECT value, event_type FROM events
  WHERE event_type IN ('{_GROUP_A}', '{_GROUP_B}')),
r AS (
  SELECT event_type,
         rank() OVER (ORDER BY value)
           + (count(*) OVER (PARTITION BY value) - 1) / 2e0 AS avg_rank
  FROM s),
agg AS (
  SELECT
    sum(CASE WHEN event_type = '{_GROUP_A}' THEN avg_rank ELSE 0 END) AS r1,
    sum(CASE WHEN event_type = '{_GROUP_A}' THEN 1 ELSE 0 END) AS n1,
    sum(CASE WHEN event_type = '{_GROUP_B}' THEN 1 ELSE 0 END) AS n2
  FROM r)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  round(r1 - n1 * (n1 + 1) / 2e0, 6) AS u_stat,
  round((r1 - n1 * (n1 + 1) / 2e0 - n1 * n2 / 2e0)
        / sqrt(n1 * n2 * (n1 + n2 + 1) / 12e0), 6) AS z_score
FROM agg
"""


@register("mann_whitney_u", oracle=_MWU_ORACLE)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: Mann-Whitney U between two classes' value distributions with
    normal approximation (no tie correction; spec pinned on both
    engines) — rank sums as window aggregates, so the test statistic
    distributes instead of collecting samples to scipy."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_GROUP_A, _GROUP_B)
    )
    avg_rank = (
        F.rank().over(Window.orderBy("value"))
        + (F.count(F.lit(1)).over(Window.partitionBy("value")) - 1) / 2.0
    )
    r = e.select("event_type", avg_rank.alias("avg_rank"))
    agg = r.agg(
        F.sum(
            F.when(F.col("event_type") == _GROUP_A, F.col("avg_rank")).otherwise(0.0)
        ).alias("r1"),
        F.sum(F.when(F.col("event_type") == _GROUP_A, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("event_type") == _GROUP_B, 1).otherwise(0)).alias("n2"),
    )
    n1, n2, r1 = F.col("n1"), F.col("n2"), F.col("r1")
    u = r1 - n1 * (n1 + 1) / 2.0
    z = (u - n1 * n2 / 2.0) / F.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    return agg.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.round(u, 6).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
    )
