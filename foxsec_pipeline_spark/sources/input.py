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


# Raw-record projections per connector format: every source leg must
# end as one `value` string column. Live stream connectors emit their
# payload as a binary `data` column (the Kinesis DSv2 connectors and
# Pub/Sub Lite both do); the reference splits each Kinesis record on
# newlines into individual events (`input/KinesisInput.java:66-74`),
# so the projection explodes the decoded payload the same way.
# File/text legs are already line-shaped.
def _split_lines_projection(df: DataFrame) -> DataFrame:
    return df.select(
        F.explode(
            F.split(F.decode(F.col("data"), "UTF-8"), r"\r?\n")
        ).alias("value")
    ).where(F.length("value") > 0)


_RAW_PROJECTIONS = {
    "kinesis": _split_lines_projection,
    "aws-kinesis": _split_lines_projection,
    "pubsublite": _split_lines_projection,
}


@dataclass
class InputElement:
    """One named input leg (`input/InputElement.java`)."""

    name: str
    # file glob(s) — a list is the reference's repeated addFileInput
    # (`input/InputElement.java` — golden TestInputTypeFileMulti)
    path: str | list[str] | None = None
    # text | json | parquet | rate | kinesis | aws-kinesis | pubsublite
    fmt: str = "text"
    parser_cfg: ParserCfg = field(default_factory=ParserCfg)
    options: dict[str, str] = field(default_factory=dict)

    def read(self, spark: SparkSession, streaming: bool = False) -> DataFrame:
        reader = spark.readStream if streaming else spark.read
        reader = reader.format(self.fmt)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        df = reader.load(self.path) if self.path else reader.load()
        project = _RAW_PROJECTIONS.get(self.fmt)
        if project is not None:
            df = project(df)
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


def kinesis_input_element(
    name: str,
    spec: str,
    fmt: str = "kinesis",
    initial_position: str = "latest",
    gcs_fetch=None,
    kms_decrypt=None,
) -> InputElement:
    """S3 Kinesis input wiring (`input/KinesisInput.java:80-107`):
    the reference's `streamname:accessid:secret:region` input
    specifier — optionally a RuntimeSecrets gs:// or cloudkms://
    payload, resolved through the same seams as the sink side —
    becomes a configured streaming InputElement. Option names follow
    the open-source Structured Streaming Kinesis connectors
    (streamName/awsAccessKeyId/awsSecretKey/endpointUrl +
    startingposition); `fmt` selects the registered DataSource short
    name ("kinesis" for the classic connector, "aws-kinesis" for the
    AWS-labs one). InitialPositionInStream.LATEST is the reference
    default (`KinesisInput.java:56`). The record->lines split is the
    format's raw projection (applied in InputElement.read). The
    connector jar is a deployment dependency; this container has no
    endpoint, so tests assert the configuration, not a live read."""
    from ..sinks.output import interpret_secret

    buf = interpret_secret(spec, gcs_fetch=gcs_fetch, kms_decrypt=kms_decrypt)
    parts = buf.split(":")
    if len(parts) != 4:
        raise ValueError("format of kinesis input specification was invalid")
    stream, access_id, secret, region = parts
    return InputElement(
        name=name,
        path=None,
        fmt=fmt,
        options={
            "streamName": stream,
            "awsAccessKeyId": access_id,
            "awsSecretKey": secret,
            "endpointUrl": f"https://kinesis.{region}.amazonaws.com",
            "startingposition": initial_position.upper(),
        },
    )


def pubsub_input_element(
    name: str,
    subscription: str,
    fmt: str = "pubsublite",
) -> InputElement:
    """S2 Pub/Sub input wiring (`input/InputElement.java:124-126`,
    `InputCollectionCache.java:41-53` PubsubIO.readStrings): a
    subscription path becomes a configured streaming InputElement.
    The public Spark connector is Pub/Sub Lite
    (`pubsublite.subscription.path` = projects/<n>/locations/<loc>/
    subscriptions/<name>); classic Pub/Sub reaches Spark through a
    Lite reservation or a bridge in deployment. Payload arrives as a
    binary `data` column -> the raw projection decodes to lines."""
    if not subscription.startswith("projects/"):
        raise ValueError(
            "pubsub subscription must be a projects/... resource path"
        )
    return InputElement(
        name=name,
        path=None,
        fmt=fmt,
        options={"pubsublite.subscription.path": subscription},
    )


def cfgtick_message(options: dict) -> str:
    """Build the configuration-tick message body
    (`metrics/CfgTickBuilder.java:45-89` + flattening per
    `parser/CfgTick.java:79-109` flattenObjectMapToStringMap): every
    option value stringified (bool -> "true"/"false", numbers via
    str(), lists of str/int comma-joined with ", "), null values
    dropped, the staged-jar list (`filesToStage`) removed, and
    `configuration_tick: "true"` stamped in so the parser's CfgTick
    matcher claims it. Unconvertible value types are a config error at
    build time, like the reference's IOException."""
    flat: dict[str, str] = {}
    for k, v in options.items():
        if v is None:
            continue
        if isinstance(v, bool):
            flat[k] = "true" if v else "false"
        elif isinstance(v, (int, float, str)):
            flat[k] = str(v)
        elif isinstance(v, (list, tuple)):
            buf = []
            for item in v:
                if not isinstance(item, (str, int)) or isinstance(item, bool):
                    raise ValueError(
                        "map had array which could not be converted"
                    )
                buf.append(str(item))
            flat[k] = ", ".join(buf)
        else:
            raise ValueError(
                f"map had value type that could not be converted, {type(v)}"
            )
    flat.pop("filesToStage", None)
    flat["configuration_tick"] = "true"
    return json.dumps(flat)


def with_cfgticks(
    raw: DataFrame, message: str, interval_seconds: int, maximum: int
) -> DataFrame:
    """Batch twin of the composite-input cfgtick adapter
    (`input/Input.java` compositeInputAdapter +
    `metrics/CfgTickGenerator.java:31-56`): append `maximum` copies of
    the heartbeat message to a bounded raw input — the bounded analog
    of "emit every interval until maxNumRecords". Interval <= 0 means
    ticks are disabled (`TestCfgTickGenerator.java:72-99` zero-interval
    leg emits none). The message must itself parse to a CFGTICK event
    — validated at PLAN time like the reference's
    validateMessageFormat (`CfgTickGenerator.java:39-55`)."""
    fields = json.loads(message)
    if not isinstance(fields, dict) or fields.get("configuration_tick") is None:
        raise ValueError(
            "generated configuration tick failed parser event type validation"
        )
    if interval_seconds <= 0 or maximum <= 0:
        return raw
    spark = raw.sparkSession
    ticks = spark.range(int(maximum)).select(
        F.lit(message).alias("value"), F.lit("cfgtick").alias("resource")
    )
    return raw.unionByName(ticks, allowMissingColumns=True)


def file_read_lines(path: str, gcs_fetch=None) -> list[str]:
    """FileUtil.fileReadLines (`FileUtil.java:20-32`): read a config
    file (blocklists, endpoint specs) to a line list, skipping
    `#`-prefixed comment lines. A gs:// path routes through
    `gcs_fetch` (a callable url -> str — the cloud-storage network
    seam; `GcsUtil.fetchStringContent` in deployment); without one a
    gs:// path is an IO error like the reference's null stream.
    Local/resource paths read directly. Null/empty path is an IOError
    (`FileUtil.java:43-46`)."""
    if not path:
        raise OSError("attempt to load file with null or empty path")
    from ..sinks.output import is_gcs_url

    if is_gcs_url(path):
        if gcs_fetch is None:
            raise OSError(f"failed to read file from path {path}")
        content = gcs_fetch(path)
    else:
        try:
            with open(path) as fh:
                content = fh.read()
        except FileNotFoundError as exc:
            raise OSError(
                f"failed to read file from path {path}"
            ) from exc
    return [
        line for line in content.splitlines() if not line.startswith("#")
    ]


def stream_writer(spark: SparkSession, spec: InputSpec,
                  out) -> None:
    """The StreamWriter echo pipeline
    (`streamwriter/StreamWriter.java:17-30`): composite input ->
    composite output with no transform in between — the utility
    pipeline the reference ships for routing raw streams between
    systems. Batch form; the streaming form is
    `spec.read_raw(spark, streaming=True)` into
    `out.stream_writer`'s foreachBatch."""
    out.write_lines(spec.read_raw(spark).select("value"))


def cfgtick_config_map():
    """CfgTick.getConfigurationMap (`parser/CfgTick.java:28-35`): the
    heartbeat's full key->value map, recovered from the parsed event's
    raw body (every value is a string by construction of
    `cfgtick_message`)."""
    return F.from_json(F.col("raw"), "map<string,string>")


def cfgtick_stream(
    spark: SparkSession, config: dict, interval_seconds: int = 30
) -> DataFrame:
    """Config-heartbeat stream (`metrics/CfgTickUnboundedSource.java:14`):
    rate source -> constant config JSON, unioned into the raw input so
    downstream sees a periodic cfg event. A non-positive interval is a
    plan-time config error like the unbounded reader's
    IllegalArgumentException (`metrics/CfgTickUnboundedReader.java` —
    golden TestCfgTickUnboundedReader.cfgTickUnboundedReaderBadInterval);
    only the bounded composite adapter treats 0 as "disabled"."""
    if interval_seconds <= 0:
        raise ValueError(
            "configuration tick interval must be greater than zero"
        )
    payload = json.dumps({"cfgtick": True, **config})
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        # rate emits integer rows/sec; keep every Nth tick for the
        # configured interval
        .where(F.col("value") % F.lit(int(interval_seconds)) == 0)
        .select(
            F.lit(payload).alias("value"), F.lit("cfgtick").alias("resource")
        )
    )
