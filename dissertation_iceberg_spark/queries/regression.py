"""Regression-engine queries (SURVEY §2.10 A18-A20).

The OLS sufficient statistics are computed as one distributed
aggregation; the closed-form single-feature solution is expressed
directly in SQL on both engines so the whole path is oracle-checked
(slope/intercept/R²/t-stat). The multi-feature Gram-matrix kernel
(operators.regression.ols_fit) is exercised in tests against this
closed form and against DuckDB's regr_* aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dissertation_iceberg_spark.io import load_table
from dissertation_iceberg_spark.operators.regression import simple_ols, simple_ols_sql
from dissertation_iceberg_spark.queries.registry import register


@register(
    "ols_value_on_user",
    oracle=simple_ols_sql("SELECT * FROM events", "user_id", "value", ["event_type"]),
)
def ols_value_on_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18/A20: exact per-group OLS (value ~ user_id) with t-stat and R²
    from one aggregation pass (chunk_pipeline.py:201-243 semantics,
    exact path of ClOp_calc.py:38-57)."""
    df = load_table(spark, sf_dir, "events")
    return simple_ols(df, "user_id", "value", ["event_type"])


_IMPACT_ORACLE = simple_ols_sql(
    """
    SELECT l_returnflag, l_discount AS x_disc, l_extendedprice AS y_price
    FROM lineitem
    """,
    "x_disc",
    "y_price",
    ["l_returnflag"],
)


@register("ols_price_on_discount", oracle=_IMPACT_ORACLE)
def ols_price_on_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-impact-shaped regression on the large fact table: the same
    OLS kernel at lineitem scale (one pass, map-side combinable)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_discount").alias("x_disc"),
        F.col("l_extendedprice").alias("y_price"),
    )
    return simple_ols(li, "x_disc", "y_price", ["l_returnflag"])
