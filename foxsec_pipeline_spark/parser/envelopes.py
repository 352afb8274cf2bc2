"""Envelope stripping: Stackdriver LogEntry, AWS CloudWatch, Mozlog.

Reference: `parser/Parser.java:310-372` (Stackdriver), `:407-421`
(CloudWatch), `:374-405` (Mozlog). Up to three layers are peeled and
envelope timestamps / project ids are hoisted onto the event.

Columnar strategy: `get_json_object` slices the inner payload out as
a JSON *string* without materializing a typed struct for every
possible payload family — the per-family `from_json` happens later,
only on rows the family matcher claimed. This keeps envelope handling
one pass, JVM-side, and schema-free (the reference pays a Jackson
parse per candidate matcher instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stackdriver_fields(raw: Column) -> dict[str, Column]:
    """Hoisted Stackdriver LogEntry fields (NULL when not Stackdriver)."""
    return {
        "sd_timestamp": F.get_json_object(raw, "$.timestamp"),
        "sd_project": F.coalesce(
            F.get_json_object(raw, "$.resource.labels.project_id"),
            F.get_json_object(raw, "$.logName"),
        ),
        "sd_json_payload": F.get_json_object(raw, "$.jsonPayload"),
        "sd_text_payload": F.get_json_object(raw, "$.textPayload"),
        "sd_proto_payload": F.get_json_object(raw, "$.protoPayload"),
        "sd_labels": F.get_json_object(raw, "$.labels"),
    }


def mozlog_fields(raw: Column) -> dict[str, Column]:
    """Mozlog envelope: {Timestamp(ns), Type, Logger, Fields{...}}
    (`parser/Parser.java:374-405`)."""
    return {
        "moz_timestamp_ns": F.get_json_object(raw, "$.Timestamp").cast("long"),
        "moz_type": F.get_json_object(raw, "$.Type"),
        "moz_logger": F.get_json_object(raw, "$.Logger"),
        "moz_fields": F.get_json_object(raw, "$.Fields"),
    }


_CLOUDWATCH_SCHEMA = T.StructType(
    [
        T.StructField("owner", T.StringType()),
        T.StructField("logGroup", T.StringType()),
        T.StructField(
            "logEvents",
            T.ArrayType(T.StructType([T.StructField("message", T.StringType())])),
        ),
    ]
)


def explode_cloudwatch(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Unwrap AWS CloudWatch subscription batches: one input line with
    N logEvents becomes N raw lines (`parser/Parser.java:407-421`).
    Non-CloudWatch lines pass through unchanged. This multiplies rows,
    so it runs before any shuffle — pure flatMap shape."""
    is_cw = F.col(value_col).contains('"logEvents"')
    cw = (
        df.where(is_cw)
        .withColumn("__cw", F.from_json(F.col(value_col), _CLOUDWATCH_SCHEMA))
        .where(F.col("__cw.logEvents").isNotNull())
        .withColumn(value_col, F.explode("__cw.logEvents.message"))
        .drop("__cw")
    )
    return df.where(~is_cw).unionByName(cw)


def strip_envelopes(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Attach envelope-derived columns; the inner candidate payload
    string is `payload` (Stackdriver json/text > Mozlog Fields > the
    raw line itself) and `envelope_ts` carries the hoisted event time.
    """
    raw = F.col(value_col)
    sd = stackdriver_fields(raw)
    moz = mozlog_fields(raw)
    out = df
    for name, col in {**sd, **moz}.items():
        out = out.withColumn(name, col)
    # mozlog may itself be nested inside stackdriver jsonPayload
    inner_moz = F.get_json_object(F.col("sd_json_payload"), "$.Fields")
    payload = F.coalesce(
        inner_moz,
        F.col("sd_json_payload"),
        F.col("sd_proto_payload"),
        F.col("sd_text_payload"),
        F.col("moz_fields"),
        raw,
    )
    envelope_ts = F.coalesce(
        F.to_timestamp(F.col("sd_timestamp")),
        F.timestamp_micros(F.expr("moz_timestamp_ns div 1000")),
    )
    return out.withColumn("payload", payload).withColumn("envelope_ts", envelope_ts)
