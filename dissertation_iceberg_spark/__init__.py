"""dissertation_iceberg_spark — PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query semantics of the
reference pipeline JingHui-Tan/dissertation-iceberg (NASDAQ LOB hidden-
liquidity research: iceberg-order tagging, conditional order-imbalance,
price-impact regressions, trading strategies), extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Everything is declarative DataFrame/SQL so Catalyst can push filters,
prune columns, broadcast small sides and re-plan with AQE. Python-side
loops over data-sized frames are forbidden by design; the only
driver-side math is on tiny aggregated results (e.g. solving a k x k
normal-equation system, k <= 10).
"""

__version__ = "0.1.0"

from dissertation_iceberg_spark.session import get_spark  # noqa: F401
