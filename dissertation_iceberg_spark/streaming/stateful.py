"""Custom stateful streaming operator: incremental iceberg-refill
detection via applyInPandasWithState.

Streaming counterpart of J1 (reference: order_imbalance.py:25-48
``iceberg_tag``, merge_asof forward/1ms semantics — SURVEY §2.3).
Batch J1 needs the whole history to find "the next submission within
tolerance"; on a stream, per-(key) state carries the undecided
executions across micro-batches:

- execution arrives  -> becomes *pending* in state
- submission arrives -> pendings within tolerance are decided
  iceberg=1; pendings older than (submission ts − tolerance) can never
  match a later submission (time only moves forward) -> decided 0
- anything still pending stays in state for the next micro-batch

Emitted rows are exactly the *decided* executions, so the output is
eventually consistent with the batch operator (pytest pins decided
flags == batch flags; only still-pending rows may lag).

State is bounded: pendings older than any seen submission minus
tolerance are always flushed, so state size ≈ executions within one
tolerance window per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("ticker", StringType(), False),
        StructField("event_id", LongType(), False),
        StructField("price", LongType(), False),
        StructField("iceberg", IntegerType(), False),
    ]
)

# pending executions: parallel arrays (ts_us, event_id)
STATE_SCHEMA = StructType(
    [
        StructField("pend_ts", ArrayType(LongType()), True),
        StructField("pend_id", ArrayType(LongType()), True),
    ]
)


def _make_flagger(tolerance_us: int, use_timeout: bool):
    def flag_refills(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ticker, price = key
        if state.exists:
            pend_ts, pend_id = state.get
            pending = list(zip(pend_ts, pend_id))
        else:
            pending = []
        decided: list[tuple[str, int, int, int]] = []

        if use_timeout and state.hasTimedOut:
            # watermark passed (oldest pending + tolerance): pendings the
            # watermark has overtaken can never match -> decide 0
            wm_us = state.getCurrentWatermarkMs() * 1000
            still = []
            for ts_us, eid in pending:
                if ts_us + tolerance_us < wm_us:
                    decided.append((ticker, eid, int(price), 0))
                else:
                    still.append((ts_us, eid))
            pending = still
        else:
            batches = list(pdfs)
            if batches:
                rows = pd.concat(batches, ignore_index=True).sort_values(
                    ["ts_us", "event_id"]
                )
                for r in rows.itertuples():
                    if r.event_type == 4:
                        pending.append((int(r.ts_us), int(r.event_id)))
                    elif r.event_type == 1:
                        for ts_us, eid in pending:
                            if ts_us + tolerance_us >= r.ts_us:
                                decided.append((ticker, eid, int(price), 1))
                            else:
                                decided.append((ticker, eid, int(price), 0))
                        pending = []

        state.update((
            [t for t, _ in pending],
            [i for _, i in pending],
        ))
        if use_timeout and pending:
            # fire when the watermark passes the oldest undecidable point
            wm_ms = state.getCurrentWatermarkMs()
            target_ms = (min(t for t, _ in pending) + tolerance_us) // 1000 + 1
            state.setTimeoutTimestamp(max(target_ms, wm_ms + 1))
        if decided:
            yield pd.DataFrame(
                decided, columns=["ticker", "event_id", "price", "iceberg"]
            )

    return flag_refills


def streaming_iceberg_tag(
    events: DataFrame,
    tolerance_us: int = 1_000,
    watermark: str = "1 hour",
    timeout: bool = False,
) -> DataFrame:
    """events: (ticker, price, ts, event_id, event_type ∈ {1,4}) stream
    -> decided executions with iceberg flags.

    With ``timeout=True`` an event-time timeout flushes pendings the
    watermark has overtaken (decided 0): keys whose submissions never
    arrive no longer hold state forever — the knob that bounds state
    for long-running deployments.
    """
    from pyspark.sql import functions as F

    from dissertation_iceberg_spark.functions.time_bins import micros

    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # cast is instant-preserving
    df = events.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "ts_us", micros("ts")
    )
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return df.groupBy("ticker", "price").applyInPandasWithState(
        _make_flagger(tolerance_us, timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
