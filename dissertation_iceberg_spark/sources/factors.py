"""Factor-file source (SURVEY S8) + trading-calendar dim (replaces
exchange_calendars, trading_strategy.py:114-120).

The reference reads the Fama-French daily file with
``read_csv(skiprows=[0,1,2])`` and drops a trailing junk row
(order_imbalance.py:116-129). Spark's CSV reader has no skip-N-lines;
the declarative equivalent is: read as text, keep only rows matching
the data shape (8-digit date prefix), then parse with ``from_csv`` and
an explicit schema. This is scan+filter+project — no driver-side
preprocessing, no RDD.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

FF_COLUMNS = ("mkt_rf", "smb", "hml", "rmw", "cma", "rf")


def read_ff_factors(
    spark: SparkSession, path: str, min_date: str = "2018-01-01"
) -> DataFrame:
    """Headerless-ish FF file -> (date, Mkt-RF, SMB, HML, RMW, CMA, RF).

    Junk header/footer lines are dropped by the data-shape predicate
    (rows must start with an 8-digit date) — skiprows without row
    numbers, so the same plan works on a multi-split file at scale.
    """
    schema = "date_raw STRING, mkt_rf DOUBLE, smb DOUBLE, hml DOUBLE, rmw DOUBLE, cma DOUBLE, rf DOUBLE"
    lines = spark.read.text(path)
    parsed = (
        lines.filter(F.col("value").rlike(r"^\s*\d{8}\s*,"))
        .select(F.from_csv(F.col("value"), schema).alias("r"))
        .select("r.*")
        .withColumn("date", F.to_date("date_raw", "yyyyMMdd"))
        .drop("date_raw")
    )
    return parsed.filter(F.col("date") >= F.lit(min_date)).select("date", *FF_COLUMNS)


def trading_days(
    spark: SparkSession, start: str, end: str
) -> DataFrame:
    """Deterministic weekday calendar dim (date, is_trading_day) with
    next/prev trading-day columns — the strategies' lookup table."""
    days = spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'), "
        "interval 1 day)) AS date"
    )
    is_td = ~F.dayofweek("date").isin(1, 7)  # Sun=1, Sat=7
    cal = days.withColumn("is_trading_day", is_td)
    w = Window.orderBy("date")
    next_td = F.first(
        F.when(F.col("is_trading_day"), F.col("date")), ignorenulls=True
    ).over(w.rowsBetween(1, 7))
    prev_td = F.last(
        F.when(F.col("is_trading_day"), F.col("date")), ignorenulls=True
    ).over(w.rowsBetween(-7, -1))
    return cal.withColumn("next_trading_day", next_td).withColumn(
        "prev_trading_day", prev_td
    )
