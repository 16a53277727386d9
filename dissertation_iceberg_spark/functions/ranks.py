"""Global ordered statistics WITHOUT a global sort (scale machinery).

A global ``Window.orderBy(col)`` moves every row to one partition — the
one true scale-killer flagged in round 1 (`mann_whitney_u`). The fix is
the classic two-pass ranking scheme:

1. bucket each row by a monotone function of the order column
   (``width_bucket`` over the observed min/max — boundaries only affect
   balance, never correctness, because equal values always land in the
   same bucket);
2. per-bucket totals -> exclusive prefix sums over the O(n_buckets)
   bucket frame (a tiny single-partition window, the accepted
   O(groups) pattern);
3. within-bucket exclusive cumulative sums via a window PARTITIONED by
   bucket — fully parallel;
4. global exclusive cumsum = bucket offset + within-bucket cumsum.

Rank statistics (Mann-Whitney, Anderson-Darling ECDFs) then come from
the *distinct-value* frame: ``groupBy(value)`` first, so the ordered
frame is O(distinct values), ties are exact by construction, and no
per-row ordering is ever needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_exclusive_cumsums(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    n_buckets: int = 1024,
    prefix: str = "cum_",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Add exclusive prefix sums of ``sum_cols`` in ``order_col`` order
    — globally, or independently per ``group_cols`` group — using
    bucketed two-pass summation (no unpartitioned window over the
    input frame).

    ``df`` must be UNIQUE on (group_cols, order_col) (group first):
    with duplicates, the within-bucket exclusive frame would split tie
    rows nondeterministically. With ``group_cols``, bucket bounds come
    from each group's own min/max, the offset window partitions by
    group over O(groups x n_buckets) rows, and within-bucket windows
    partition by (group, bucket) — every stage stays group-parallel.
    """
    g = list(group_cols)
    oc = F.col(order_col)
    if g:
        stats = df.groupBy(*g).agg(
            F.min(oc).alias("__vmin"), F.max(oc).alias("__vmax")
        )
    else:
        stats = df.agg(F.min(oc).alias("__vmin"), F.max(oc).alias("__vmax"))
    bucket = F.when(
        F.col("__vmax") > F.col("__vmin"),
        F.width_bucket(oc, F.col("__vmin"), F.col("__vmax"), F.lit(n_buckets)),
    ).otherwise(F.lit(1))
    joined = df.join(F.broadcast(stats), g) if g else df.join(F.broadcast(stats))
    b = joined.withColumn("__bucket", bucket).drop("__vmin", "__vmax")
    totals = b.groupBy(*g, "__bucket").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols]
    )
    w_off = (
        (Window.partitionBy(*g) if g else Window)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # O(n_buckets) rows per group: the accepted bounded-frame window
    offsets = totals.select(
        *g,
        "__bucket",
        *[
            F.coalesce(F.sum(f"__t_{c}").over(w_off), F.lit(0)).alias(f"__o_{c}")
            for c in sum_cols
        ],
    )
    w_in = (
        Window.partitionBy(*g, "__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = b.join(F.broadcast(offsets), [*g, "__bucket"])
    for c in sum_cols:
        out = out.withColumn(
            f"{prefix}{c}",
            F.col(f"__o_{c}") + F.coalesce(F.sum(c).over(w_in), F.lit(0)),
        )
    return out.drop("__bucket", *[f"__o_{c}" for c in sum_cols])
