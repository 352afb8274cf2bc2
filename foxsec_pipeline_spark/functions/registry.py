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


class ScriptRunner:
    """Named-script loader + method dispatch (`ScriptRunner.java:12-80`,
    golden-replayed from TestScriptRunner): the reference embeds Groovy
    scripts loaded by resource path under a script name, then invokes
    methods on them; here a script is a Python source file exec'd into
    its own namespace. Error semantics match the reference — a missing
    file raises OSError (IOException), an unknown method raises
    ValueError (IllegalArgumentException).

    This is the driver-side face of the scripting surface; callables a
    script registers via `register_udf` flow into executors as Arrow
    pandas UDFs through `install_udfs` (never row-at-a-time)."""

    def __init__(self) -> None:
        self._scripts: dict[str, dict] = {}

    def load_script(self, path: str, name: str) -> None:
        try:
            with open(path) as fh:
                src = fh.read()
        except FileNotFoundError as exc:
            raise OSError(f"script resource not found: {path}") from exc
        ns: dict = {}
        exec(compile(src, path, "exec"), ns)  # noqa: S102 (user scripting hook)
        self._scripts[name] = ns

    def invoke_method(self, script: str, method: str, *args):
        ns = self._scripts.get(script)
        if ns is None:
            raise ValueError(f"no such script: {script}")
        fn = ns.get(method)
        if not callable(fn):
            raise ValueError(
                f"method {method} not found in script {script}"
            )
        return fn(*args)
