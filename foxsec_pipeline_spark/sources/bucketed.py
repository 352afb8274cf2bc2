"""Bucketed-table helpers — co-located joins without a shuffle.

SCALE.md's co-location claim, concretely: persisting both sides of a
recurring equi-join bucketed by the join key lets Spark's
sort-merge join read bucket i of each table on the same task — zero
Exchange in the join plan. This is the Spark-native replacement for
the reference's implicit "same key, same worker" assumptions around
GroupByKey chains, and the right layout for the event/alert tables a
security pipeline joins repeatedly (events⋈alerts, events⋈state
snapshots) at 100 TB.

Bucketing goes through the session catalog (`saveAsTable`) — plain
`parquet(path)` writes can't carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table.

    Sorting within buckets additionally removes the join's Sort nodes
    (SortMergeJoin reads pre-sorted runs).
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
