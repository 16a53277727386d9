"""Shared SQL fragments for the DuckDB correctness oracles.

The driver registers the parquet tables as DuckDB views named
``region nation customer supplier part orders lineitem events
documents embeddings``. These fragments are mirrored by loaders in
``io.py`` — any change must land on both sides.
"""

# LOB-shaped view over events — mirror of io.lob_events
EVENTS_LOB_SQL = """
SELECT event_id, ts, user_id, event_type, value,
       CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END AS direction,
       value AS size
FROM events
"""

US_PER_DAY = 86_400 * 1_000_000
