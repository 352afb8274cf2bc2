"""SparkSession factory for the engine.

Local-mode defaults match the test harness (local[N], shuffle
partitions ~ cores); on a real cluster the same builder is used with
master/partitions supplied by the deployment, and AQE re-plans at
runtime (skew joins, partition coalescing) — see SCALE.md.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "foxsec_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else os.cpu_count() or 8
        shuffle_partitions = int(n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # testdata parquet carries TIMESTAMP(NANOS) (pandas default),
        # which vanilla Spark rejects; read as long and convert in
        # load_tables (DuckDB truncates ns->us the same way).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer."""
    import pyarrow.dataset as ds
    import pyarrow as pa

    schema = ds.dataset(path, format="parquet").schema
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load testdata parquet tables and register temp views.

    Returns dict name -> DataFrame. Parquet scans get column pruning
    and predicate pushdown from Catalyst for free. Nanosecond
    timestamp columns (unsupported by the Spark parquet reader) are
    read as int64 and truncated to microsecond timestamps, matching
    DuckDB's ns->us handling.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        for c in _nano_ts_columns(path):
            # Only when Spark actually read the column as int64 (the
            # nanosAsLong path for TIMESTAMP(NANOS) footers) — pyarrow
            # also reports INT96 timestamps as `ns`, but Spark reads
            # those as TIMESTAMP directly and no conversion applies.
            if not isinstance(df.schema[c].dataType, T.LongType):
                continue
            # integer `div`, not `/`: int64 nanos overflow double mantissa
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        # µs parquet timestamps (isAdjustedToUTC=false) read as
        # TIMESTAMP_NTZ under Spark's inferTimestampNTZ default; the
        # engine's time math (unix_micros, window()) wants TIMESTAMP.
        # Session tz is UTC, so the cast is value-preserving and
        # matches DuckDB's naive-UTC reading of the same column.
        for f in df.schema.fields:
            if isinstance(f.dataType, T.TimestampNTZType):
                df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
