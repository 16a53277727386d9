"""Invariants for the deterministic k-means query (exact quantized
Lloyd): partition property, purity bounds, and bit-for-bit
reproducibility across independent executions (the property the
integer quantization buys)."""

from __future__ import annotations

from dissertation_iceberg_spark.io import load_table
from dissertation_iceberg_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _run(spark, sf_dir):
    return sorted(
        REGISTRY["kmeans_cluster_stats"].fn(spark, sf_dir).collect(),
        key=lambda r: r["cluster_id"],
    )


def test_kmeans_partitions_corpus(spark, sf_dir):
    rows = _run(spark, sf_dir)
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == total
    assert len(rows) <= 8
    for r in rows:
        assert 0 < r["label_share"] <= 1.0
        assert r["mean_sq_dist"] >= 0.0


def test_kmeans_bitwise_reproducible(spark, sf_dir):
    a = _run(spark, sf_dir)
    b = _run(spark, sf_dir)
    assert a == b
