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


def test_aqe_skew_join_split(spark):
    """AQE skew-join must split a pathological hot key at runtime.

    Synthetic skew: one key holds ~10× the rows of all others combined.
    With test-scale thresholds lowered, the executed plan's sort-merge
    join must carry ``skew=true`` (the hot partition was split into
    sub-partitions), and results must match the plain join. This is the
    runtime complement to the deterministic ``salted_join`` — at 100 TB
    AQE handles moderate skew automatically; salting is for keys so hot
    a single split set still thrashes.
    """
    conf = spark.conf
    keys = [
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.coalescePartitions.enabled",
    ]
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        n_hot, n_cold = 200_000, 20_000
        hot = spark.range(n_hot).select(
            F.lit(0).cast("long").alias("k"), F.col("id").alias("v")
        )
        cold = spark.range(n_cold).select(
            (F.col("id") % 64 + 1).alias("k"), F.col("id").alias("v")
        )
        left = hot.unionByName(cold)
        right = spark.range(65).select(
            F.col("id").alias("k"), F.lit("dim").alias("w")
        )
        joined = left.join(right, "k")
        # collect() executes THIS df's query execution (count() would
        # spawn a separate one whose plan we couldn't inspect)
        assert len(joined.collect()) == n_hot + n_cold  # every row matches once
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not split the skewed partition:\n" + plan[:3000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


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
