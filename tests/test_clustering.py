"""Invariants for the deterministic k-means query (exact quantized
Lloyd): partition property, purity bounds, and bit-for-bit
reproducibility across independent executions (the property the
integer quantization buys)."""

from __future__ import annotations

import pytest

from dissertation_iceberg_spark.io import load_table
from dissertation_iceberg_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _run(spark, sf_dir):
    return sorted(
        REGISTRY["kmeans_cluster_stats"].fn(spark, sf_dir).collect(),
        key=lambda r: r["cluster_id"],
    )


def test_kmeans_partitions_corpus(spark, sf_dir):
    from dissertation_iceberg_spark.queries.extensions import km_k_for

    rows = _run(spark, sf_dir)
    base = load_table(spark, sf_dir, "embeddings")
    total = base.count()
    assert sum(r["n_vecs"] for r in rows) == total
    # derived bound, not a literal: k = greatest(KM_K, ceil(n/256)), so
    # the invariant stays correct if the fixture grows past the
    # 2048-vector boundary where corpus-scaled k leaves the floor
    assert len(rows) <= km_k_for(base)
    for r in rows:
        assert 0 < r["label_share"] <= 1.0
        assert r["mean_sq_dist"] >= 0.0


def test_kmeans_bitwise_reproducible(spark, sf_dir):
    a = _run(spark, sf_dir)
    b = _run(spark, sf_dir)
    assert a == b


@pytest.mark.slow
def test_corpus_scaled_k_parity(spark, tmp_path):
    """Round-7 registration fix: k is DERIVED from the corpus count
    (greatest(8, ceil(n/256))) in both engines. On a 3000-vector corpus
    the derived k is 12 (> the floor), the clustering still partitions
    the corpus, and all three Lloyd-family queries stay hash-green
    against their oracles — i.e. the scaled-k plan is oracle-checked
    beyond the fixture regime where k collapses to the floor."""
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dissertation_iceberg_spark.queries.extensions import km_k_for
    from tools.parity import run_parity

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "scaledk")
    os.makedirs(d)
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")

    n, dim = 3000, 64
    rng = np.random.default_rng(7)
    emb = rng.normal(0, 0.1, size=(n, dim)).astype("float32")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
                "label": pa.array((np.arange(n) % 10).tolist(), pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )

    base = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    assert km_k_for(base) == 12

    res = run_parity(
        d, ["kmeans_cluster_stats", "semdedup_prune", "ari_kmeans_vs_labels"]
    )
    assert all(ok for ok, *_ in res.values()), {
        k: v for k, v in res.items() if not v[0]
    }

    rows = REGISTRY["kmeans_cluster_stats"].fn(spark, d).collect()
    assert sum(r["n_vecs"] for r in rows) == n
    assert 8 < len(rows) <= 12
