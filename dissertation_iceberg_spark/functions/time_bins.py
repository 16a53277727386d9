"""Ceil-aligned tumbling time bins (reference parity: pandas
``DatetimeIndex.ceil(delta)`` at order_imbalance.py:277-278,376-377 and
SPY_returns.py:41).

Semantics: bin label = smallest multiple of delta >= ts ("bin end").
An event exactly on a boundary STAYS at that boundary (pandas ceil),
unlike Spark's ``window()`` whose end-exclusive frame would push it to
the next bin — so we compute the label arithmetically from integer
microseconds, which is also exactly reproducible in DuckDB
(``epoch_us``) for the correctness oracle. Integer-microsecond
arithmetic avoids the float-truncation mismatches that plague
epoch-second formulations.

All-declarative: stays inside whole-stage codegen; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def micros(ts_col: str | Column) -> Column:
    """Epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ inputs.

    The cast is a no-op for LTZ; for NTZ (e.g. datetime64[us] parquet)
    it interprets the wall clock in the session tz — pinned to UTC by
    the session factory, which is exactly DuckDB's ``epoch_us``.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.unix_micros(ts.cast("timestamp"))


def bin_end(ts_col: str | Column, delta_sec: int) -> Column:
    """Ceil-aligned bin-end label as a timestamp column."""
    delta_us = int(delta_sec) * 1_000_000
    us = micros(ts_col)
    # ceil(us / delta_us) in exact-enough double space: us < 2^53 so the
    # division is correctly rounded and the quotient magnitude (~1e4-1e7)
    # keeps ceil() exact; boundary events (us % delta_us == 0) stay put.
    bucket = F.ceil(us / F.lit(float(delta_us))).cast("long")
    return F.timestamp_seconds(bucket * int(delta_sec))


def bin_end_sql(ts_expr: str, delta_sec: int) -> str:
    """DuckDB SQL mirror of :func:`bin_end` — keep formulas in lockstep."""
    delta_us = int(delta_sec) * 1_000_000
    return (
        f"make_timestamp(CAST(ceil(epoch_us({ts_expr}) / {delta_us}.0) AS BIGINT)"
        f" * {int(delta_sec)} * 1000000)"
    )
