"""Streaming per-key Holt (level + trend) forecaster via
applyInPandasWithState — the streaming twin of
queries/changepoint_ops.holt_linear_forecast, emitting a one-step
forecast and its error for every sealed day.

Like the EWMA monitor (anomaly_stream.py), day cells accumulate
order-free integer partial counts in state; a day is SEALED once the
watermark passes its end, and sealed days drain through the exact
integer-shift recursion in day order — identical to the batch fold:

    l' = (y - 0 + l + b) >> 1        (no seasonal term in Holt)
    b' = (l' - l + b) >> 1           (alpha = beta = 1/2)

seeded l = first sealed day's count, b = 0. Each emitted row carries
the day's count, the PRE-update forecast l + b (what the model
predicted for this day before seeing it), the signed integer forecast
error, and the post-update level/trend. State per key is (l, b,
seeded flag) plus open-day partials inside the watermark horizon —
bounded by the watermark delay, independent of stream length. Sealed
rows are bit-equal to the batch recursion (pinned in
tests/test_stateful_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DAY_US = 86_400_000_000

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("day_us", LongType(), False),
        StructField("y", LongType(), False),
        StructField("forecast", LongType(), True),
        StructField("error", LongType(), True),
        StructField("level", LongType(), False),
        StructField("trend", LongType(), False),
    ]
)

# seeded = 0 before the first sealed day; open days ride as parallel
# (day_us, count) arrays
STATE_SCHEMA = StructType(
    [
        StructField("seeded", LongType(), True),
        StructField("l", LongType(), True),
        StructField("b", LongType(), True),
        StructField("open_day", ArrayType(LongType()), True),
        StructField("open_y", ArrayType(LongType()), True),
    ]
)


def _forecaster(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        seeded, l, b, days, ys = state.get
        partial = dict(zip(days, ys))
    else:
        seeded, l, b, partial = 0, 0, 0, {}

    # drop sub-watermark stragglers at ingest (round 6, all day-cell
    # ops): applyInPandasWithState does not auto-drop them, and a row
    # for an already-sealed day would re-create the cell and emit a
    # duplicate (key, day_us) row corrupting the level/trend recursion
    wm_us = state.getCurrentWatermarkMs() * 1000
    for pdf in pdfs:
        for r in pdf.itertuples():
            d = (int(r.ts_us) // DAY_US) * DAY_US
            if d + DAY_US <= wm_us:
                continue
            partial[d] = partial.get(d, 0) + 1

    out: list[tuple] = []
    for d in sorted(partial):
        if wm_us < d + DAY_US:
            break
        y = partial.pop(d)
        if not seeded:
            seeded, l, b = 1, y, 0
            out.append((event_type, d, y, None, None, l, b))
        else:
            fc = l + b
            l_new = (y + l + b) >> 1
            b = (l_new - l + b) >> 1
            l = l_new
            out.append((event_type, d, y, fc, y - fc, l, b))

    state.update(
        (seeded, l, b, sorted(partial), [partial[d] for d in sorted(partial)])
    )
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "event_type",
                "day_us",
                "y",
                "forecast",
                "error",
                "level",
                "trend",
            ],
        )


def streaming_holt_forecast(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """events stream (event_type, ts, ...) -> sealed daily Holt rows
    (event_type, day_us, y, forecast, error, level, trend),
    append-mode, bit-equal to the batch holt_linear_forecast
    integer-shift recursion for every sealed day."""
    from pyspark.sql import functions as F

    from dissertation_iceberg_spark.functions.time_bins import micros

    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.select("event_type", "ts", micros("ts").alias("ts_us"))
        .groupBy("event_type")
        .applyInPandasWithState(
            _forecaster,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
