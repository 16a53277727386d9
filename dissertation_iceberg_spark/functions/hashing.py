"""Engine-portable 60-bit hashes (md5-derived) for dedup/LSH operators.

``xxhash64`` is Spark-only; the oracle gate (DuckDB) can't replay it,
which forced the SimHash/MinHash/LSH family into weaker rows-only
checks. The portable alternative: the top 15 hex digits of md5 parsed
as a 60-bit integer — md5 is bit-identical everywhere, and 15 hex
digits stay inside a signed 64-bit value in both engines:

- Spark:  ``conv(substr(md5(x), 1, 15), 16, 10)`` cast to long
- DuckDB: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``
- Python: ``int(hashlib.md5(x).hexdigest()[:15], 16)``

All three verified equal (tests/test_ml_streaming.py). md5 costs ~2-5x
xxhash64 per call; at 100 TB the hashing stage is still bandwidth-bound
on the shuffle, not the digest, and a production deployment that never
cross-checks against another engine can swap xxhash64 back in through
these helpers without touching the operators.

Seeded variants prefix the payload with ``{seed}:`` — the standard way
to derive k independent hash functions from one digest family.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex digits


def hash60(col: Column) -> Column:
    """Portable 60-bit content hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seeded_hash60(seed: int, col: Column) -> Column:
    """k-th independent portable hash: md5 over ``'{seed}:' || x``."""
    return hash60(F.concat(F.lit(f"{seed}:"), col))


def hash60_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash60` over a SQL expression."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def seeded_hash60_sql(seed: int, expr: str) -> str:
    """DuckDB rendering of :func:`seeded_hash60`."""
    return hash60_sql(f"'{seed}:' || {expr}")


def seeded_hash60_col(seed_col: Column, col: Column) -> Column:
    """Seeded variant with a COLUMN seed (sketch depth index etc.) —
    same payload layout as :func:`seeded_hash60`."""
    return hash60(F.concat(seed_col.cast("string"), F.lit(":"), col))


def seeded_hash60_col_sql(seed_expr: str, expr: str) -> str:
    """DuckDB rendering of :func:`seeded_hash60_col`."""
    return hash60_sql(f"CAST({seed_expr} AS VARCHAR) || ':' || {expr}")


def hash60_py(payload: str) -> int:
    """Driver-side replica (plane-weight literals, tests)."""
    return int(hashlib.md5(payload.encode("utf-8")).hexdigest()[:15], 16)
