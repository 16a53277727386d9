"""Semantics guards for the multi-dimensional agg / pivot / set-op
surface (queries/sqlops.py). Parity with DuckDB is covered by the
driver gate; these pin the properties parity can't see: grouping-id
level encoding, static pivot schema, set-op disjointness."""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_iceberg_spark.queries.registry import REGISTRY, _ensure_loaded
from dissertation_iceberg_spark.queries.sqlops import _EVENT_TYPES

_ensure_loaded()


def test_rollup_levels(spark, sf_dir):
    df = REGISTRY["revenue_rollup"].fn(spark, sf_dir)
    rows = df.collect()
    gids = {r["gid"] for r in rows}
    # leaf (0), priority subtotal (1), grand total (3)
    assert gids == {0, 1, 3}
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    assert grand[0]["o_orderpriority"] is None
    leaf_n = sum(r["n_orders"] for r in rows if r["gid"] == 0)
    assert leaf_n == grand[0]["n_orders"]


def test_cube_has_all_grouping_sets(spark, sf_dir):
    rows = REGISTRY["status_year_cube"].fn(spark, sf_dir).collect()
    assert {r["gid"] for r in rows} == {0, 1, 2, 3}


def test_pivot_schema_static_when_type_absent(spark, sf_dir):
    """The pinned pivot value list keeps the schema stable even when a
    type is missing from the data — the property an unpinned pivot
    loses (schema drifts with content)."""
    from dissertation_iceberg_spark.io import load_table
    from dissertation_iceberg_spark.queries import sqlops

    df = REGISTRY["event_type_pivot"].fn(spark, sf_dir)
    expected = ["day"] + [
        f"{t}_{s}" for t in _EVENT_TYPES for s in ("n", "value")
    ]
    assert df.columns == expected

    # zero-row input: same columns, zero rows, no error
    e = load_table(spark, sf_dir, "events").filter(F.lit(False))
    orig = sqlops.load_table
    try:
        sqlops.load_table = lambda *_a, **_k: e
        empty = REGISTRY["event_type_pivot"].fn(spark, sf_dir)
        assert empty.columns == expected
        assert empty.count() == 0
    finally:
        sqlops.load_table = orig


def test_intersect_except_partition_buyers(spark, sf_dir):
    inter = set(
        r[0] for r in REGISTRY["repeat_buyers_intersect"].fn(spark, sf_dir).collect()
    )
    lapsed = set(
        r[0] for r in REGISTRY["lapsed_buyers_except"].fn(spark, sf_dir).collect()
    )
    assert inter.isdisjoint(lapsed)
    # together they cover exactly the early-era buyer set
    from dissertation_iceberg_spark.io import load_table

    early = {
        r[0]
        for r in load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") < 1998)
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert inter | lapsed == early
