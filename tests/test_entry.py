from __future__ import annotations


def test_entry_runs(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = df.columns
    assert cols == [
        "bin",
        "order_imbalance",
        "n_events",
        "first_price",
        "last_price",
        "log_ret",
        "fut_log_ret",
    ]
    # invariants: OI in [-1, 1]; grid is complete (consecutive hourly bins)
    ois = [r["order_imbalance"] for r in rows if r["order_imbalance"] is not None]
    assert all(-1.0 <= v <= 1.0 for v in ois)
    bins = [r["bin"] for r in rows]
    deltas = {(b - a).total_seconds() for a, b in zip(bins, bins[1:])}
    assert deltas == {3600.0}


def test_flagship_observe_metrics(spark, sf_dir):
    """Pipeline observability: Observation metrics ride the flagship
    plan for free (no second pass) and must agree with the materialized
    result — the hook a production deployment uses for row-count /
    freshness monitoring on a 100 TB job.

    Runs on an ISOLATED spark.newSession(): Spark 4.1's per-session
    ObservationManager is not serializable, and once an Observation has
    been registered, any LATER job whose closure captures the same
    session object (e.g. RandomForest's training summary) fails closure
    cleaning with NotSerializableException — observed as py4j errors in
    unrelated ML tests. Isolating the observation on its own session
    object keeps the shared test session clean."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from dissertation_iceberg_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    s = spark.newSession()
    df = REGISTRY["oi_hourly_densified"].fn(s, sf_dir)
    obs = Observation("flagship")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_events").alias("n_events_total"),
    )
    rows = observed.collect()
    got = obs.get
    assert got["n_bins"] == len(rows)
    assert got["n_events_total"] == sum(r["n_events"] for r in rows)
