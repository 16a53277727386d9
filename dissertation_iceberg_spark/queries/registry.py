"""Query registry: one named entry per implemented operator.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB oracle SQL string over the same parquet tables
(pre-registered views: region nation customer supplier part orders
lineitem events documents embeddings). The driver hash-compares Spark
vs DuckDB results order-insensitively with columns sorted by name, so
every computed column is aliased identically on both sides and floats
are rounded in-query (both sides, same decimals) to make values
bit-stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def _doc_of(fn) -> str:
    """Docstring of ``fn`` — falling back to the first triple-quoted
    literal in its source for functions that build their doc with
    ``\"\"\"...\"\"\".format(...)`` (an expression, so ``__doc__`` is
    None)."""
    if fn.__doc__:
        return fn.__doc__
    import inspect
    import re

    try:
        src = inspect.getsource(fn)
    except OSError:
        return ""
    m = re.search(r'"""(.*?)"""', src, re.S)
    return m.group(1) if m else ""


def register(name: str, oracle: str | None):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(existing: {REGISTRY[name].fn.__module__}."
                f"{REGISTRY[name].fn.__qualname__}, "
                f"new: {fn.__module__}.{fn.__qualname__})"
            )
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=_doc_of(fn))
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import all query modules so their @register calls run."""
    global _LOADED
    if _LOADED:
        return
    from dissertation_iceberg_spark.queries import (  # noqa: F401
        behavior_ops,
        boosting,
        changepoint_ops,
        core,
        corpus_ops,
        distribution_fits,
        econometrics,
        extensions,
        graph_ops,
        intervals,
        irls,
        joins,
        lakehouse_ops,
        llm_ops,
        microstructure,
        misc,
        ml_rolling,
        oi_variants,
        pipeline_audit,
        regression,
        retrieval_ops,
        sessions,
        sketch_ops,
        sqlops,
        stats_tests,
        stats_tests2,
        strategy,
        strategy2,
        text_metrics,
        tpch_shapes,
        tpch_shapes2,
        tpch_shapes3,
        windows2,
        workflow_queries,
    )

    _LOADED = True
