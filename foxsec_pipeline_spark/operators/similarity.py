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
    planes: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    tables: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s), then exact cosine rank over the candidate set. The
    cross join becomes an equi-join on (table, bucket) — the scale
    path.

    `tables` enables OR-amplification (classic AND-OR LSH): each
    table is an independent set of hyperplanes; a pair is a candidate
    if it collides in ANY table. More planes per table → fewer, purer
    candidates (precision/AND); more tables → higher recall (OR).
    Rows are posexploded to one row per table with that table's
    bucket, so candidate generation stays ONE equi-join regardless of
    table count — never an OR-of-conditions join (which would plan as
    a cartesian). Duplicate pairs from multi-table collisions are
    dropped before scoring. Single-table callers pass `planes`;
    recall is measured against the exact baseline in
    tests/test_similarity_recall.py.
    """
    if tables is None:
        if planes is None:
            raise ValueError("pass planes or tables")
        tables = [planes]

    def _exploded(df, out_id):
        bkts = F.array(*[lsh_bucket(F.col(vec_col), t) for t in tables])
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(f"__{out_id}_v"),
            F.posexplode(bkts).alias("__tbl", "__bkt"),
        )

    q = _exploded(queries, "query_id")
    c = _exploded(corpus, "neighbor_id")
    cand = (
        c.join(F.broadcast(q), ["__tbl", "__bkt"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine",
        F.round(cosine(F.col("__query_id_v"), F.col("__neighbor_id_v")), 6),
    ).select("query_id", "neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(k)))
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
