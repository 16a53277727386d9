"""Streaming exact deduplication with bounded state.

A training-data pipeline ingesting document/event streams needs dedup at
the ingest edge, but plain ``dropDuplicates`` on a stream keeps every
key seen forever — state grows O(distinct keys over all time), which is
unusable on an unbounded 100 TB feed. ``dropDuplicatesWithinWatermark``
holds each key only until the watermark passes its event time + delay:
state is bounded by the key arrival rate × watermark horizon, at the
cost that a duplicate arriving after its key's state expired is emitted
again (exactly-once within the horizon, at-least-once beyond it — the
standard streaming dedup contract).

Batch counterpart (same semantics, no state): the ``exact_dedup_groups``
/ ``dedup_first`` queries (reference keep-first dedup,
prediction_ML_pipeline.py:119-121).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_dedup(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Drop duplicate keys arriving within ``watermark`` of the key's
    first-seen event time. State per key is evicted once the watermark
    passes ``event_time + watermark`` — bounded for unbounded streams."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
