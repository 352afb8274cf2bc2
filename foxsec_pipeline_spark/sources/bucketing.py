"""Storage-level bucketing for co-located joins.

At 100 TB the dominant cost of a repeated fact-to-fact join is the
shuffle of both sides on the join key. Bucketing pays that shuffle
ONCE at write time: `bucketBy(n, key)` hash-partitions rows into a
fixed bucket count recorded in the table catalog, and every later
equi-join (or aggregation) on the key reads bucket i against bucket i
with NO Exchange in the plan. This module wraps the write/read pair
the engine's pipelines use for their serving tables (the BigQuery
sink's stand-in writes line-delimited JSON; columnar serving copies
go through this path instead).

Design rules encoded here:

- Bucket count is a power of two sized so ONE bucket of the largest
  table fits an executor (`buckets >= table_bytes / 256MB`); both
  sides of a co-located join must use the SAME count (Spark joins
  bucketed tables shuffle-free only when counts match or divide).
- `sortBy` the same key so the sort-merge join also skips the
  per-task sort.
- Bucketed tables are catalog tables (saveAsTable), not bare parquet
  paths — the bucket spec lives in the metastore, which is what the
  planner consults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table
    keyed for future shuffle-free equi-joins/aggs on ``key``."""
    w = df.write.mode(mode).bucketBy(int(buckets), key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table (the bucket spec rides along from
    the metastore — a plain ``spark.read.parquet`` of the same files
    would LOSE it and re-shuffle on the next join)."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as date/dimension-partitioned parquet — the
    time-pruning layout every 100 TB fact table needs: a predicate on
    the partition column becomes a PartitionFilter (directory prune)
    instead of a data read, so a one-day query over years of history
    opens one directory. Partition columns should be LOW-cardinality
    derivations (event_date, not event_ts; region, not user) — high
    cardinality explodes the file count and kills the metastore."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
