"""Custom stateful streaming operator: incremental iceberg-refill
detection via applyInPandasWithState.

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


def _make_flagger(tolerance_us: int):
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
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        for r in rows.itertuples():
            if r.event_type == 4:
                pending.append((int(r.ts_us), int(r.event_id)))
            elif r.event_type == 1:
                still = []
                for ts_us, eid in pending:
                    if ts_us + tolerance_us >= r.ts_us:
                        decided.append((ticker, eid, int(price), 1))
                    else:
                        decided.append((ticker, eid, int(price), 0))
                pending = still
        state.update((
            [t for t, _ in pending],
            [i for _, i in pending],
        ))
        if decided:
            yield pd.DataFrame(
                decided, columns=["ticker", "event_id", "price", "iceberg"]
            )

    return flag_refills


def streaming_iceberg_tag(
    events: DataFrame,
    tolerance_us: int = 1_000,
    watermark: str = "1 hour",
) -> DataFrame:
    """events: (ticker, price, ts, event_id, event_type ∈ {1,4}) stream
    -> decided executions with iceberg flags."""
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
        _make_flagger(tolerance_us),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
