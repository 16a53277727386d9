"""Streaming first-touch funnel (view -> click -> purchase) via
``applyInPandasWithState`` — the streaming twin of
queries/behavior_ops.funnel_conversion's per-user step frames.

Batch computes each user's step-conversion times with three chained
min-aggregates (t1 = first view; t2 = first click at-or-after t1;
t3 = first purchase at-or-after t2).  On a stream the same machine
runs incrementally per user:

- events BELOW the watermark form a complete, immutable prefix, so
  they can be folded in event-time order; folded step times can never
  be invalidated by later arrivals (anything older would be dropped)
  -> each step time is FINAL the moment it is set, and is emitted
  exactly once;
- events at-or-above the watermark are buffered in state (an
  out-of-order view could still precede them), bounded by one
  watermark-delay's worth of events per user;
- the funnel register itself is three longs + an emit counter per
  user — state is O(active users), independent of history length,
  hash-partitioned on user across the cluster exactly like the batch
  shuffle.

Fold order (ts, step, event_id) is total, so a click landing on the
same microsecond as the first view deterministically counts (view
sorts first via step rank), byte-identical to the batch twin's
``>=`` join conditions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

FUNNEL_STEPS = ("view", "click", "purchase")

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("step", LongType(), False),
        StructField("t_us", LongType(), False),
    ]
)

# pending events (parallel arrays) + funnel register (t1, t2, t3 with
# -1 = unset) + number of steps already emitted
STATE_SCHEMA = StructType(
    [
        StructField("pend_ts", ArrayType(LongType()), True),
        StructField("pend_step", ArrayType(LongType()), True),
        StructField("pend_id", ArrayType(LongType()), True),
        StructField("t1", LongType(), True),
        StructField("t2", LongType(), True),
        StructField("t3", LongType(), True),
        StructField("n_emitted", LongType(), True),
    ]
)

_STEP_RANK = {name: i for i, name in enumerate(FUNNEL_STEPS)}


def _fold(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        p_ts, p_step, p_id, t1, t2, t3, n_emitted = state.get
        pending = list(zip(p_ts, p_step, p_id))
    else:
        pending, t1, t2, t3, n_emitted = [], -1, -1, -1, 0

    for pdf in pdfs:
        for r in pdf.itertuples():
            pending.append((int(r.ts_us), _STEP_RANK[r.event_type], int(r.event_id)))

    wm_us = state.getCurrentWatermarkMs() * 1000
    ready = sorted(e for e in pending if e[0] < wm_us)
    pending = [e for e in pending if e[0] >= wm_us]

    for ts, step, _eid in ready:
        if step == 0 and t1 < 0:
            t1 = ts
        elif step == 1 and t1 >= 0 and t2 < 0:
            t2 = ts
        elif step == 2 and t2 >= 0 and t3 < 0:
            t3 = ts

    out = []
    for i, t in enumerate((t1, t2, t3), start=1):
        if t >= 0 and i > n_emitted:
            out.append((user_id, i, t))
            n_emitted = i

    state.update((
        [e[0] for e in pending],
        [e[1] for e in pending],
        [e[2] for e in pending],
        t1,
        t2,
        t3,
        n_emitted,
    ))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "step", "t_us"])


def streaming_funnel(
    events: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """readStream events -> append-mode (user_id, step, t_us) rows,
    one per finalized funnel step.  On a batch frame use
    :func:`batch_funnel_steps` — the twin the test pins against."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    e = e.withWatermark("ts", watermark)
    e = e.filter(F.col("event_type").isin(*FUNNEL_STEPS)).select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "ts",
    )
    return (
        e.groupBy("user_id")
        .applyInPandasWithState(
            _fold,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def batch_funnel_steps(events: DataFrame) -> DataFrame:
    """Batch twin: per-user finalized step times via the same chained
    min-aggregates funnel_conversion uses (first view; first click
    at-or-after it; first purchase at-or-after that)."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp")).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s1 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .where(F.col("us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .where(F.col("us") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    rows = [
        s1.select("user_id", F.lit(1).cast("long").alias("step"), F.col("t1").alias("t_us")),
        s2.select("user_id", F.lit(2).cast("long").alias("step"), F.col("t2").alias("t_us")),
        s3.select("user_id", F.lit(3).cast("long").alias("step"), F.col("t3").alias("t_us")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
