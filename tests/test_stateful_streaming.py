"""applyInPandasWithState iceberg detector: decided flags must equal
the batch as-of operator; undecided rows are exactly the executions
with no following submission yet."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dissertation_iceberg_spark.operators.iceberg import asof_next_within
from dissertation_iceberg_spark.streaming.stateful import streaming_iceberg_tag
from tests.lobster_fixtures import TOL_US, write_fixtures


@pytest.fixture(scope="module")
def lob_src(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("statelob"))
    wide = write_fixtures(root)
    src = f"{root}/stream_src"
    (
        spark.read.parquet(wide)
        .filter(F.col("event_type").isin(1, 4))
        .select(
            "ticker", "price", F.col("datetime").alias("ts"),
            # seq restarts per day: build a globally unique id that
            # preserves within-day order
            (F.dayofmonth("datetime").cast("long") * 10_000_000
             + F.col("seq")).alias("event_id"),
            "event_type",
        )
        .write.parquet(src)
    )
    return src


def test_stateful_matches_batch(spark, lob_src):
    batch_df = spark.read.parquet(lob_src)
    stream = spark.readStream.schema(batch_df.schema).parquet(lob_src)
    q = (
        streaming_iceberg_tag(stream, tolerance_us=TOL_US)
        .writeStream.format("memory")
        .queryName("ice_stateful")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("ice_stateful").toPandas()
    assert len(got) > 0
    assert not got.duplicated(["ticker", "event_id"]).any()

    want = (
        asof_next_within(
            batch_df,
            probe_pred=F.col("event_type") == 4,
            match_pred=F.col("event_type") == 1,
            by_cols=["ticker", "price"],
            ts_col="ts",
            seq_col="event_id",
            tolerance_us=TOL_US,
        )
        .filter(F.col("event_type") == 4)
        .select("ticker", "event_id", "iceberg")
        .toPandas()
    )
    merged = got.merge(want, on=["ticker", "event_id"], suffixes=("_s", "_b"))
    assert len(merged) == len(got)  # every decided row exists in batch
    assert (merged.iceberg_s == merged.iceberg_b).all()

    # undecided = execs with no following submission in their
    # (ticker, price) group — they must be pending, not emitted
    pdf = batch_df.toPandas()
    undecided = []
    for (t, p), g in pdf.groupby(["ticker", "price"]):
        g = g.sort_values(["ts", "event_id"])
        subs = g[g.event_type == 1]
        for r in g[g.event_type == 4].itertuples():
            later = subs[
                (subs.ts > r.ts)
                | ((subs.ts == r.ts) & (subs.event_id > r.event_id))
            ]
            if len(later) == 0:
                undecided.append((t, r.event_id))
    got_ids = set(zip(got.ticker, got.event_id))
    for key in undecided:
        assert key not in got_ids
    assert len(got) + len(undecided) == (pdf.event_type == 4).sum()
