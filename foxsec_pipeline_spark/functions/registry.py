"""User-defined function registry — the pluggable scripting surface.

Reference: `ScriptRunner.java:12-50` — the reference embeds Groovy as
its licensed escape hatch for user-supplied per-event logic. The Spark
analog is a named registry of Python callables materialized as pandas
UDFs (Arrow-batched — never row-at-a-time), registered into Spark SQL
so both the DataFrame API and SQL text can call them.

UDFs are the slow path by design; anything expressible with built-in
functions should be. The registry exists for the genuinely custom
tail.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_REGISTRY: dict[str, tuple[Callable, str]] = {}


def register_udf(name: str, return_type: str):
    """Decorator: register a pandas-Series -> pandas-Series callable
    under `name` (e.g. @register_udf("risk_score", "double"))."""

    def deco(fn: Callable):
        _REGISTRY[name] = (fn, return_type)
        return fn

    return deco


def registered_udfs() -> dict[str, tuple[Callable, str]]:
    return dict(_REGISTRY)


def install_udfs(spark: SparkSession) -> None:
    """Materialize every registered callable as an Arrow pandas UDF in
    the session's SQL function registry."""
    for name, (fn, rt) in _REGISTRY.items():
        spark.udf.register(name, pandas_udf(fn, rt))
