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
