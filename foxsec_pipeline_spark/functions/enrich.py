"""External enrichment lookups behind pluggable interfaces.

Reference: `IprepdIO.java:124-199` (GET reputation for ip/email, used
as a side input), `Minfraud.java` + `Normalized.java:574-590`
(MaxMind minFraud Insights riskScore/traits HTTP enrichment).

Spark-first shape: an enrichment is a (usually small) DataFrame
broadcast-joined to the stream — never a per-row network call inside
an executor. The provider interface returns that dimension DataFrame;
production providers page an HTTP API into it per micro-batch
(foreachBatch), tests use the deterministic stub. This inverts the
reference's per-event-lookup-with-cache pattern into a join the
optimizer understands (a cache hit becomes a hash probe).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# provider: (spark, objects_df[object: string]) -> DataFrame[
#   object string, reputation int]
ReputationProvider = Callable[[SparkSession, DataFrame], DataFrame]


def stub_reputation_provider(
    spark: SparkSession, objects: DataFrame
) -> DataFrame:
    """Deterministic test stub: reputation derived from the object's
    crc32 (0-100; lower = worse, like iprepd)."""
    return objects.select(
        F.col("object"),
        (F.crc32(F.col("object")) % 101).cast("int").alias("reputation"),
    )


def enrich_reputation(
    df: DataFrame,
    obj_col: str,
    provider: ReputationProvider = stub_reputation_provider,
    min_reputation: int | None = None,
) -> DataFrame:
    """Attach `reputation` to each row by broadcast-joining the
    provider's dimension for the distinct objects in this batch
    (`IprepdIO.java:124-199`; exemption semantics = filter after
    join). Distinct-objects first bounds the provider call to unique
    keys — the reference's per-process cache, expressed relationally.
    """
    spark = df.sparkSession
    objects = df.select(F.col(obj_col).alias("object")).distinct()
    dim = provider(spark, objects)
    out = df.join(
        F.broadcast(dim), df[obj_col] == dim["object"], "left"
    ).drop("object")
    if min_reputation is not None:
        out = out.where(
            F.col("reputation").isNull()
            | (F.col("reputation") >= F.lit(int(min_reputation)))
        )
    return out


def stub_hostname_provider(spark: SparkSession, objects: DataFrame) -> DataFrame:
    """Deterministic reverse-DNS stand-in: hostname derived from the
    address (production provider resolves + caches per micro-batch —
    `CidrUtil.java:71` resolvedCanonicalHostMatches isolates the
    network call the same way)."""
    return objects.select(
        F.col("object"),
        F.concat(
            F.lit("host-"), F.substring(F.md5(F.col("object")), 1, 8),
            F.lit(".example.net"),
        ).alias("hostname"),
    )


def enrich_hostname(
    df: DataFrame,
    obj_col: str,
    provider: Callable[[SparkSession, DataFrame], DataFrame] = stub_hostname_provider,
    match_regex: str | None = None,
) -> DataFrame:
    """Reverse-DNS enrichment as a broadcast dimension join; optional
    regex gate reproduces the GCP-hostname check semantics."""
    spark = df.sparkSession
    objects = df.select(F.col(obj_col).alias("object")).distinct()
    dim = provider(spark, objects)
    out = df.join(F.broadcast(dim), df[obj_col] == dim["object"], "left").drop(
        "object"
    )
    if match_regex is not None:
        out = out.where(F.col("hostname").rlike(match_regex))
    return out
