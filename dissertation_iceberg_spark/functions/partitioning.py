"""Partitioning utilities for the 100 TB story: bucketed tables for
co-located (exchange-free) joins, and key salting for skew.

Bucketing: writing both fact tables bucketed by the join key lets
Spark plan a SortMergeJoin with NO Exchange on either side — the
shuffle is paid once at write time and amortized over every
subsequent join. `tests/test_partitioning.py` asserts the
exchange-free plan.

Salting: a hot key is split into `factor` sub-keys; the small side is
exploded across all salt values so the join stays an equi-join. AQE's
skew-join handles moderate skew automatically — salting is for the
pathological keys AQE can't split (e.g. a single key larger than an
executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) table.

    With ``path`` the table is external (location owned by the caller
    — avoids managed-location collisions across sessions that share a
    warehouse dir); otherwise managed.
    """
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table_name}")
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: big side gets a random-ish salt derived
    from a stable hash of its row, small side is replicated across all
    salt values. Deterministic (hash-based salt, no rand())."""
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), factor)
    )
    salt_values = F.array(*[F.lit(i) for i in range(factor)])
    small_s = small.withColumn("__salt", F.explode(salt_values))
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
