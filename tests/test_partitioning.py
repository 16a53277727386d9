"""Bucketed-join (exchange-free) and salted-join correctness/plan
guards — the co-location story for 100 TB fact-fact joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dissertation_iceberg_spark.functions.partitioning import (
    salted_join,
    write_bucketed,
)
from dissertation_iceberg_spark.io import load_table


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return spark  # session-level warehouse dir is fine for managed tables


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed(
        o, "orders_b", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(tmp_path / "orders_b"),
    )
    write_bucketed(
        li, "lineitem_b", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=str(tmp_path / "lineitem_b"),
    )
    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, (
        "bucketed join must be exchange-free:\n" + plan[:2000]
    )
    # correctness vs plain join
    plain = load_table(spark, sf_dir, "orders").join(
        load_table(spark, sf_dir, "lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    assert joined.count() == plain.count()


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    salted = salted_join(li, o, "k", factor=8)
    plain = li.join(o, "k")
    assert salted.count() == plain.count()
    a = (
        salted.groupBy("o_orderpriority")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("s"))
        .toPandas()
        .set_index("o_orderpriority")["s"]
        .sort_index()
    )
    b = (
        plain.groupBy("o_orderpriority")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("s"))
        .toPandas()
        .set_index("o_orderpriority")["s"]
        .sort_index()
    )
    assert (a == b).all()
