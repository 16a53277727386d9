"""Graph analytics (round 3): PageRank over the part↔supplier
co-purchase graph — the iterative-join workload class (alongside the
existing connected components in operators/dedup.py) expressed so the
fixpoint arithmetic is EXACTLY replayable in DuckDB.

Determinism recipe (same as the k-means query): ranks live as integer
micro-units; each contribution is floor-division by degree and each
damping update is integer multiply-divide — no float ever enters the
iteration, so any parallelism, any engine, any shuffle order produces
bit-identical ranks, and the oracle just unrolls the same iterations
as CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dissertation_iceberg_spark.io import load_table
from dissertation_iceberg_spark.queries.registry import register

_PR_ITERS = 3
_PR_TOPK = 30
_SCALE = 1_000_000  # rank micro-units
_DAMP_NUM, _DAMP_DEN = 85, 100  # 0.85 damping as a ratio
_BASE = 150_000  # (1 - d) * scale

# part nodes = 2k, supplier nodes = 2k+1 (disjoint id spaces)
_EDGES_SQL = """
SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
UNION ALL
SELECT DISTINCT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM lineitem
"""


def _iter_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT e.dst AS node,
         CAST({_BASE} + ({_DAMP_NUM} *
              CAST(sum({prev}.r // deg.d) AS BIGINT)) // {_DAMP_DEN}
              AS BIGINT) AS r
  FROM edges e
  JOIN {prev} ON e.src = {prev}.node
  JOIN deg ON deg.src = e.src
  GROUP BY 1)"""


_PAGERANK_ORACLE = f"""
WITH edges AS ({_EDGES_SQL}),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
r0 AS (SELECT src AS node, CAST({_SCALE} AS BIGINT) AS r FROM deg),
{",".join(_iter_sql(f"r{i}", f"r{i + 1}") for i in range(_PR_ITERS))}
SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
       node // 2 AS node_key,
       r AS rank_micro
FROM r{_PR_ITERS}
ORDER BY r DESC, node ASC
LIMIT {_PR_TOPK}
"""


@register("pagerank_top_nodes", oracle=_PAGERANK_ORACLE)
def pagerank_top_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 damped iterations, integer micro-unit arithmetic)
    over the undirected part↔supplier bipartite graph from lineitem;
    top-30 nodes by rank. Suppliers of many distinct parts and parts
    with many suppliers surface first — the centrality signal a
    sourcing/dedup pipeline uses to find hub entities.

    Scale shape per iteration: one equi-join of the edge list against
    the O(nodes) rank frame + one map-side-combinable sum by
    destination — the canonical distributed PageRank step (edges never
    move; only O(nodes) rank rows shuffle). Degrees are joined on the
    same src key (co-partitioned with the rank join). The undirected
    construction has no dangling nodes, so no rank mass correction
    term is needed. Final top-k compiles to TakeOrderedAndProject.
    Iteration count is fixed (not convergence-tested) precisely so the
    oracle can unroll it."""
    li = load_table(spark, sf_dir, "lineitem")
    fwd = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    edges = fwd.unionByName(rev)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(_SCALE).cast("long").alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select("dst", F.expr("r DIV d").alias("c"))
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (
                F.lit(_BASE)
                + F.expr(f"({_DAMP_NUM} * sum(c)) DIV {_DAMP_DEN}")
            )
            .cast("long")
            .alias("r")
        )
    return (
        ranks.orderBy(F.desc("r"), F.asc("node"))
        .limit(_PR_TOPK)
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("part"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node DIV 2").alias("node_key"),
            F.col("r").alias("rank_micro"),
        )
    )
