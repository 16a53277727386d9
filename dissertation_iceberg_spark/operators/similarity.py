"""Similarity search over embedding columns (engine extension).

- brute-force cosine top-k: query set × corpus with JVM-side
  higher-order functions (zip_with + aggregate) — the correctness
  baseline, broadcast the (small) query side.
- LSH-bucketed variant (scale path): random-hyperplane signs bucket
  vectors; candidates only within a bucket. Hyperplanes are a tiny
  literal array (deterministic seed), applied JVM-side.

Float32 inputs are cast element-wise to double BEFORE multiplication in
both engines so the oracle's positional-sum matches bit-for-bit; final
scores rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Plan shape: broadcast(queries) × corpus -> score -> per-query
    row_number -> filter. One pass over the corpus, no shuffle of the
    corpus except the final tiny top-k aggregation.
    """
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    pairs = corpus.alias("c").join(F.broadcast(q), F.col("qid") != F.col(id_col))
    scored = pairs.select(
        "qid",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            _dot(F.col("qvec"), F.col(vec_col))
            / (F.sqrt(_norm2(F.col("qvec"))) * F.sqrt(_norm2(F.col(vec_col)))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "neighbor_id", "cosine", "rnk")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    num_tables: int = 1,
) -> DataFrame:
    """Sign-of-projection LSH bucket ids per vector (scale path for ANN).

    ``num_tables`` independent hash tables (OR-amplification): a
    candidate pair needs to collide in ANY table, trading extra
    (cheap, equi-join) candidates for recall — the standard knob when
    single-table sign-LSH recall is too low. Hyperplanes are
    deterministic tiny literals from the seed; projections are JVM-side
    higher-order functions. Output: one row per (vector, table).
    """
    import random

    rnd = random.Random(seed)
    rows = []
    for t in range(num_tables):
        planes = [
            [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)
        ]
        bucket = F.lit(0).cast("long")
        for i, p in enumerate(planes):
            plane = F.array(*[F.lit(x) for x in p])
            proj = _dot(F.col(vec_col), plane)
            bucket = bucket + F.when(proj > 0, F.lit(2**i)).otherwise(F.lit(0))
        rows.append(F.struct(F.lit(t).alias("tbl"), bucket.alias("bucket")))
    return df.select(
        F.col(id_col), F.col(vec_col), F.explode(F.array(*rows)).alias("tb")
    ).select(id_col, vec_col, "tb.tbl", "tb.bucket")


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: k-means coarse quantizer buckets the corpus into
    ``n_lists`` inverted lists; each query probes its ``n_probe``
    nearest centroids and reranks those lists with exact cosine.

    Scale shape: centroid assignment is a map-side transform; the
    candidate join is an equi-join on the list id; recall is tuned by
    n_probe/n_lists. Centroids are tiny (n_lists × dim) and broadcast.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cv = corpus.withColumn("__v", array_to_vector(F.col(vec_col)))
    km = KMeans(k=n_lists, seed=seed, featuresCol="__v", predictionCol="list_id")
    model = km.fit(cv)
    corpus_b = model.transform(cv).select(id_col, vec_col, "list_id")

    # query -> n_probe nearest centroids, JVM-side against the tiny
    # broadcast centroid table
    cents = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = corpus.sparkSession.createDataFrame(
        cents, ["list_id", "centroid"]
    )
    q = queries.select(F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    dist = F.aggregate(
        F.zip_with(
            F.col("qvec"),
            F.col("centroid"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    qc = q.crossJoin(F.broadcast(cent_df)).withColumn("dist", dist)
    wq = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("list_id"))
    probes = (
        qc.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= n_probe)
        .select("qid", "qvec", "list_id")
    )
    pairs = corpus_b.join(F.broadcast(probes), "list_id").where(
        F.col("qid") != F.col(id_col)
    )
    scored = pairs.select(
        "qid",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            _dot(F.col("qvec"), F.col(vec_col))
            / (F.sqrt(_norm2(F.col("qvec"))) * F.sqrt(_norm2(F.col(vec_col)))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "neighbor_id", "cosine", "rnk")
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 3,
    num_planes: int = 8,
    dim: int = 64,
    num_tables: int = 4,
) -> DataFrame:
    """ANN: candidates restricted to vectors sharing the query's bucket
    in at least one hash table, then exact cosine + top-k. Recall < 1
    by construction; the scale win is that the join key is
    (table, bucket) — an equi-join the planner can shuffle-partition —
    instead of a cross product."""
    cb = hyperplane_lsh_buckets(
        corpus, vec_col, id_col, num_planes, dim, num_tables=num_tables
    )
    qb = hyperplane_lsh_buckets(
        queries.select(F.col(query_id_col).alias("vec_id"), F.col(vec_col)),
        vec_col,
        "vec_id",
        num_planes,
        dim,
        num_tables=num_tables,
    ).select(
        F.col("vec_id").alias("qid"), F.col(vec_col).alias("qvec"), "tbl", "bucket"
    )
    pairs = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .where(F.col("qid") != F.col(id_col))
        .select("qid", "qvec", id_col, vec_col)
        .distinct()
    )
    scored = pairs.select(
        "qid",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            _dot(F.col("qvec"), F.col(vec_col))
            / (F.sqrt(_norm2(F.col("qvec"))) * F.sqrt(_norm2(F.col(vec_col)))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "neighbor_id", "cosine", "rnk")
    )
