"""Oracle parity: every registered query must hash-match its DuckDB
oracle at sf0.001 (the driver does the same at sf0.01)."""

from __future__ import annotations

import pytest

from dissertation_iceberg_spark.queries.registry import REGISTRY, _ensure_loaded
from tools.parity import compare_frames

_ensure_loaded()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_parity(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    sp = df.toPandas()
    if spec.oracle is None:
        assert len(sp) >= 0  # rows-only check
        return
    du = duck.execute(spec.oracle).fetchdf()
    ok, msg = compare_frames(sp, du)
    assert ok, f"{name}: {msg}"


def test_registry_consistency():
    from __spark_entry__ import oracle_sql, queries

    q = queries()
    o = oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
