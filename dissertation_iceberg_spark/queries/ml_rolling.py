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


# --------------------------------------------------------------------------
# M8 multi-feature rolling refit: y ~ x + momentum + 1, exact Gram path
# --------------------------------------------------------------------------

# Cramer formulas shared verbatim with the ols2_gram kernel: the stats
# frame exposes columns a..r (Gram upper triangle + moments) and both
# engines evaluate the SAME strings.
from dissertation_iceberg_spark.queries.regression import _BETA  # noqa: E402

MOM_DAYS = 3

_MGRAM_COLS = {
    "a": "txx", "b": "txm", "c": "tx", "d": "tmm", "e2": "tm",
    "f": "tn", "p": "txy", "q": "tmy", "r": "ty",
}

_MULTI_SQL_STATS = """
daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         sum(CAST(round(value * 100) AS BIGINT)) AS x
  FROM events GROUP BY 1, 2),
dm AS (
  SELECT *, sum(x) OVER (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN {mom} PRECEDING AND 1 PRECEDING) AS m,
         lead(x) OVER (PARTITION BY user_id ORDER BY day) AS y
  FROM daily),
rows_ok AS (SELECT * FROM dm WHERE m IS NOT NULL AND y IS NOT NULL),
day_gram AS (
  SELECT day, count(*) AS n,
         sum(x * x) AS sxx, sum(x * m) AS sxm, sum(x) AS sx,
         sum(m * m) AS smm, sum(m) AS sm,
         sum(x * y) AS sxy, sum(m * y) AS smy, sum(y) AS sy
  FROM rows_ok GROUP BY day),
trail AS (
  SELECT day,
         CAST(sum(n)   OVER w AS DOUBLE) AS tn,
         CAST(sum(sxx) OVER w AS DOUBLE) AS txx,
         CAST(sum(sxm) OVER w AS DOUBLE) AS txm,
         CAST(sum(sx)  OVER w AS DOUBLE) AS tx,
         CAST(sum(smm) OVER w AS DOUBLE) AS tmm,
         CAST(sum(sm)  OVER w AS DOUBLE) AS tm,
         CAST(sum(sxy) OVER w AS DOUBLE) AS txy,
         CAST(sum(smy) OVER w AS DOUBLE) AS tmy,
         CAST(sum(sy)  OVER w AS DOUBLE) AS ty
  FROM day_gram
  WINDOW w AS (ORDER BY day ROWS BETWEEN {train} PRECEDING AND 1 PRECEDING))
""".format(mom=MOM_DAYS, train=TRAIN_DAYS)


def _multi_oracle() -> str:
    renames = ", ".join(f"{src} AS {dst}" for dst, src in _MGRAM_COLS.items())
    betas = ", ".join(f"{expr} AS {k}" for k, expr in _BETA.items())
    det = "(a*(d*f - e2*e2) - b*(b*f - e2*c) + c*(b*e2 - d*c))"
    return f"""
WITH {_MULTI_SQL_STATS},
g AS (SELECT day, {renames} FROM trail WHERE tn >= 4),
s AS (SELECT *, {betas} FROM g WHERE {det} <> 0)
SELECT d.day, d.user_id,
       round(s.beta1, 6) AS beta_x,
       round(s.beta2, 6) AS beta_mom,
       round((s.intercept + s.beta1 * d.x + s.beta2 * d.m) / 1e2, 6)
           AS signal_hat,
       CAST(s.f AS BIGINT) AS n_train
FROM (SELECT user_id, day, x, m FROM dm WHERE m IS NOT NULL) d
JOIN s ON d.day = s.day
"""


@register("rolling_refit_multi", oracle=_multi_oracle())
def rolling_refit_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 with the reference's momentum control (A19): per-day refit of
    y ~ x + momentum + 1 over the trailing window — per-day Gram sums
    (integer-exact), trailing window sums, shared Cramer formula
    strings. One aggregation + one window; zero iteration. Long-sum
    headroom: |Σ trailing x·y| < ~2e18 at sf0.1 (5× margin); beyond
    that, scale to DECIMAL(38) sums."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
    wl = Window.partitionBy("user_id").orderBy("day")
    dm = daily.withColumn(
        "m", F.sum("x").over(wl.rowsBetween(-MOM_DAYS, -1))
    ).withColumn("y", F.lead("x", 1).over(wl))
    rows_ok = dm.filter(F.col("m").isNotNull() & F.col("y").isNotNull())
    x, m_, y = F.col("x"), F.col("m"), F.col("y")
    day_gram = rows_ok.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x * x).alias("sxx"), F.sum(x * m_).alias("sxm"),
        F.sum(x).alias("sx"), F.sum(m_ * m_).alias("smm"),
        F.sum(m_).alias("sm"), F.sum(x * y).alias("sxy"),
        F.sum(m_ * y).alias("smy"), F.sum(y).alias("sy"),
    )
    wt = Window.orderBy("day").rowsBetween(-TRAIN_DAYS, -1)
    trail = day_gram.select(
        "day",
        *[
            F.sum(src_col).over(wt).cast("double").alias(dst)
            for dst, src_col in [
                ("tn", "n"), ("txx", "sxx"), ("txm", "sxm"), ("tx", "sx"),
                ("tmm", "smm"), ("tm", "sm"), ("txy", "sxy"),
                ("tmy", "smy"), ("ty", "sy"),
            ]
        ],
    )
    g = trail.filter(F.col("tn") >= 4).select(
        "day", *[F.col(src).alias(dst) for dst, src in _MGRAM_COLS.items()]
    )
    det = "(a*(d*f - e2*e2) - b*(b*f - e2*c) + c*(b*e2 - d*c))"
    s = g.filter(F.expr(det) != 0).select(
        "day", *[F.expr(expr).alias(k) for k, expr in _BETA.items()], F.col("f")
    )
    d = dm.filter(F.col("m").isNotNull()).select("user_id", "day", "x", "m")
    return d.join(F.broadcast(s), "day").select(
        "day",
        "user_id",
        F.round("beta1", 6).alias("beta_x"),
        F.round("beta2", 6).alias("beta_mom"),
        F.round(
            (F.col("intercept") + F.col("beta1") * F.col("x")
             + F.col("beta2") * F.col("m")) / F.lit(1e2),
            6,
        ).alias("signal_hat"),
        F.col("f").cast("long").alias("n_train"),
    )


# --------------------------------------------------------------------------
# A14 stratified: per-day Mann-Whitney U (no global sort)
# --------------------------------------------------------------------------

_MWU_STRAT_ORACLE = f"""
WITH s AS (
  SELECT date_trunc('day', ts) AS day, value, event_type FROM events
  WHERE event_type IN ('{_GROUP_A}', '{_GROUP_B}')),
r AS (
  SELECT day, event_type,
         rank() OVER (PARTITION BY day ORDER BY value)
           + (count(*) OVER (PARTITION BY day, value) - 1) / 2e0 AS avg_rank
  FROM s),
agg AS (
  SELECT day,
    sum(CASE WHEN event_type = '{_GROUP_A}' THEN avg_rank ELSE 0 END) AS r1,
    sum(CASE WHEN event_type = '{_GROUP_A}' THEN 1 ELSE 0 END) AS n1,
    sum(CASE WHEN event_type = '{_GROUP_B}' THEN 1 ELSE 0 END) AS n2
  FROM r GROUP BY day)
SELECT day, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  round(r1 - n1 * (n1 + 1) / 2e0, 6) AS u_stat,
  round((r1 - n1 * (n1 + 1) / 2e0 - n1 * n2 / 2e0)
        / sqrt(n1 * n2 * (n1 + n2 + 1) / 12e0), 6) AS z_score
FROM agg WHERE n1 > 0 AND n2 > 0
"""


@register("mann_whitney_u_stratified", oracle=_MWU_STRAT_ORACLE)
def mann_whitney_u_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 at scale: per-stratum (per-day) U statistics — the rank sort
    partitions by day, so no operator ever needs a global ordering
    (the scale fix promised in SCALE.md)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_GROUP_A, _GROUP_B)
    ).withColumn("day", F.date_trunc("day", F.col("ts")))
    avg_rank = (
        F.rank().over(Window.partitionBy("day").orderBy("value"))
        + (F.count(F.lit(1)).over(Window.partitionBy("day", "value")) - 1) / 2.0
    )
    r = e.select("day", "event_type", avg_rank.alias("avg_rank"))
    agg = r.groupBy("day").agg(
        F.sum(
            F.when(F.col("event_type") == _GROUP_A, F.col("avg_rank")).otherwise(0.0)
        ).alias("r1"),
        F.sum(F.when(F.col("event_type") == _GROUP_A, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("event_type") == _GROUP_B, 1).otherwise(0)).alias("n2"),
    )
    n1, n2, r1 = F.col("n1"), F.col("n2"), F.col("r1")
    u = r1 - n1 * (n1 + 1) / 2.0
    z = (u - n1 * n2 / 2.0) / F.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    return agg.filter((n1 > 0) & (n2 > 0)).select(
        "day",
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.round(u, 6).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
    )
