"""Input abstraction: simplex / multiplex reads, batch + streaming.

Reference: `input/Input.java` (simplex `:261-291`, multiplex
`:343-460`), `input/InputElement.java:121-142` (file / pubsub /
kinesis per-element wiring), `metrics/CfgTick*` (config heartbeat
source, ~270 LoC of custom UnboundedSource).

Spark mapping: one InputElement = one DataFrame of raw strings with a
`resource` literal column; multiplex = unionByName of elements (the
TupleTag demux becomes a plain column — `input/Input.java:343-384`).
The same spec materializes batch (`spark.read`) or streaming
(`spark.readStream`) — one logical plan, two triggers.

CfgTick becomes the built-in `rate` streaming source projected to a
constant config-JSON heartbeat — ~10 lines vs the reference's custom
UnboundedSource/Reader pair.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..parser.parse import ParserCfg, parse_events


@dataclass
class InputElement:
    """One named input leg (`input/InputElement.java`)."""

    name: str
    path: str | None = None          # file glob (text/json-lines)
    fmt: str = "text"                # text | json | parquet | rate
    parser_cfg: ParserCfg = field(default_factory=ParserCfg)
    options: dict[str, str] = field(default_factory=dict)

    def read(self, spark: SparkSession, streaming: bool = False) -> DataFrame:
        reader = spark.readStream if streaming else spark.read
        reader = reader.format(self.fmt)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        df = reader.load(self.path) if self.path else reader.load()
        if self.fmt == "text":
            df = df.withColumnRenamed("value", "value")
        return df.withColumn("resource", F.lit(self.name))


@dataclass
class InputSpec:
    """Simplex or multiplex input (`input/Input.java`)."""

    elements: list[InputElement]

    def read_raw(self, spark: SparkSession, streaming: bool = False) -> DataFrame:
        """Multiplex raw read: union of elements with `resource` tags
        (`Input.java:343-384` simplexReadRaw/multiplexReadRaw)."""
        dfs = [e.read(spark, streaming) for e in self.elements]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def read_parsed(self, spark: SparkSession, streaming: bool = False) -> DataFrame:
        """Multiplex parsed read (`Input.java:399-460`,
        `ParserMultiDoFn`): per-element parser cfg applied to its leg,
        then union — each leg's fast-matcher filter stays *before* its
        parse, preserving the reference's pre-shuffle pushdown."""
        parsed = [
            parse_events(e.read(spark, streaming), e.parser_cfg) for e in self.elements
        ]
        out = parsed[0]
        for d in parsed[1:]:
            out = out.unionByName(d)
        return out


def cfgtick_stream(
    spark: SparkSession, config: dict, interval_seconds: int = 30
) -> DataFrame:
    """Config-heartbeat stream (`metrics/CfgTickUnboundedSource.java:14`):
    rate source -> constant config JSON, unioned into the raw input so
    downstream sees a periodic cfg event."""
    payload = json.dumps({"cfgtick": True, **config})
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        # rate emits integer rows/sec; keep every Nth tick for the
        # configured interval
        .where(F.col("value") % F.lit(int(max(interval_seconds, 1))) == 0)
        .select(
            F.lit(payload).alias("value"), F.lit("cfgtick").alias("resource")
        )
    )
