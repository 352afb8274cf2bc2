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


_NANO_TS_CACHE: dict[str, list[str]] = {}


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer.

    Memoized per path: the footer schema of a given parquet dir is
    immutable for the life of a bench/driver run, and the pyarrow
    dataset open costs ~10-30 ms of driver time per call — paid per
    table per query per rep before this cache (guide §1.2: driver
    fixed costs are per-query work at 232 queries)."""
    hit = _NANO_TS_CACHE.get(path)
    if hit is not None:
        return hit
    import pyarrow.dataset as ds
    import pyarrow as pa

    schema = ds.dataset(path, format="parquet").schema
    out = [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]
    _NANO_TS_CACHE[path] = out
    return out


# (applicationId, abs sf_dir, table name) -> constructed DataFrame.
# A DataFrame is an immutable logical plan — memoizing it caches NO
# data (every action still scans the parquet); it removes the ~60-90 ms
# of per-call driver work (pyarrow footer probe, spark.read.parquet
# file listing + schema resolution over py4j, the timestamp-cast
# withColumns) that every query re-paid on every bench rep. Keyed by
# applicationId so a stopped/recreated session can never serve stale
# py4j handles, and by absolute path so distinct corpora never alias.
_TABLE_CACHE: dict[tuple[str, str, str], "object"] = {}


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

    app_id = spark.sparkContext.applicationId
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        key = (app_id, os.path.abspath(path), name)
        df = _TABLE_CACHE.get(key)
        if df is None:
            df = spark.read.parquet(path)
            for c in _nano_ts_columns(path):
                # Only when Spark actually read the column as int64 (the
                # nanosAsLong path for TIMESTAMP(NANOS) footers) — pyarrow
                # also reports INT96 timestamps as `ns`, but Spark reads
                # those as TIMESTAMP directly and no conversion applies.
                if not isinstance(df.schema[c].dataType, T.LongType):
                    continue
                # integer `div`, not `/`: int64 nanos overflow double mantissa
                df = df.withColumn(
                    c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
                )
            # µs parquet timestamps (isAdjustedToUTC=false) read as
            # TIMESTAMP_NTZ under Spark's inferTimestampNTZ default; the
            # engine's time math (unix_micros, window()) wants TIMESTAMP.
            # Session tz is UTC, so the cast is value-preserving and
            # matches DuckDB's naive-UTC reading of the same column.
            for f in df.schema.fields:
                if isinstance(f.dataType, T.TimestampNTZType):
                    df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
            _TABLE_CACHE[key] = df
        # always (re-)register the view: callers may interleave sf_dirs
        # in one session and expect `name` to track the LAST load
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
