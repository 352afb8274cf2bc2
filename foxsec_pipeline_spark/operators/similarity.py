"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact). Scale path: LSH-bucketed
top-k (random-hyperplane signs) that turns the cross join into an
equi-join on the bucket — the IVF/LSH pattern for 100 TB corpora.

The dot product is a sequential left-fold over the array
(`aggregate`), evaluated JVM-side; elements are cast float->double
first (exact), so results are bit-reproducible — including by the
DuckDB oracle's `list_reduce` fold in the same order.

Reference seed: the engine-side generalization of the reference's
string-similarity clustering (`customs/CustomsAccountCreationDist.java`)
to vector similarity, per the training-data north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("double") * y.cast("double")
    )
    return _fold_sum(prods)


def l2_norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_decimals: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force).

    Broadcast the (small) query side, scan the corpus once — at scale
    this is one pass over 100 TB with no shuffle of the corpus; only
    the per-query top-k heap shuffles (rows = |queries| * k after the
    window prune with AQE).

    Ranking uses the rounded score with id tie-break, so the result
    set is deterministic across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", F.round(cosine(F.col("__qv"), F.col("__cv")), round_decimals)
        )
        .drop("__qv", "__cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(k)))
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane, packed.

    `planes` is a small python-side list (broadcast as literals into
    the expression). Bucket = Σ 2^i * (dot(vec, plane_i) > 0).
    """
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(dot(vec, arr) > 0, F.lit(2**i)).otherwise(F.lit(0))
    return bucket


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine rank within bucket. The cross join
    becomes an equi-join on bucket — the scale path."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        lsh_bucket(F.col(vec_col), planes).alias("__bkt"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        lsh_bucket(F.col(vec_col), planes).alias("__bkt"),
    )
    scored = (
        c.join(F.broadcast(q), ["__bkt"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
        .drop("__qv", "__cv", "__bkt")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(k)))
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
