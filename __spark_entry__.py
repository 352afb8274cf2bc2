"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real surface lives in ``foxsec_pipeline_spark.plans.catalog``;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from foxsec_pipeline_spark.plans.catalog import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: session analysis —
    the heart of the reference's heuristics (per-key session windows
    with inactivity gap) as one declarative Spark plan."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spec = registry()["session_analysis"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(spec.fn) for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries
    fall back to the driver's rows-only check)."""
    return {
        name: spec.oracle.strip()
        for name, spec in registry().items()
        if spec.oracle is not None
    }
