"""Alert construction, formatting and merge/suppression (batch plane).

Reference: `alert/Alert.java:21-52` (record + severity enum),
`alert/AlertFormatter.java:131-142` (GeoIP metadata + monitored
resource), `alert/AlertIO.java:40-74,116-143` (notify-merge windowed
grouping), `alert/AlertSuppressor*.java` (keyed suppression — the
streaming twins live in streaming/suppress.py).

Alerts are rows of ALERT_SCHEMA; every heuristic output becomes an
alert via `to_alerts`, a pure projection, so the alert plane composes
with any operator output without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..schema import ALERT_SCHEMA, SEVERITY_INFO


def to_alerts(
    df: DataFrame,
    category: str,
    summary: Column,
    severity: str = SEVERITY_INFO,
    subcategory: str | None = None,
    timestamp_col: str = "window_start",
    notify_merge: str | None = None,
    metadata_cols: list[str] | None = None,
) -> DataFrame:
    """Project heuristic output rows into the alert schema.

    metadata_cols become string map entries (AlertMeta key/value —
    list-valued keys are comma-joined like the reference)."""
    meta_cols = metadata_cols or [
        c for c in df.columns if c != timestamp_col
    ]
    meta = F.map_from_arrays(
        F.array(*[F.lit(c) for c in meta_cols]),
        F.array(*[F.col(c).cast("string") for c in meta_cols]),
    )
    return df.select(
        F.expr("uuid()").alias("alert_id"),
        F.col(timestamp_col).cast("timestamp").alias("timestamp"),
        F.lit(category).alias("category"),
        F.lit(subcategory).cast("string").alias("subcategory"),
        F.lit(severity).alias("severity"),
        summary.alias("summary"),
        F.lit(notify_merge).cast("string").alias("notify_merge"),
        meta.alias("metadata"),
    )


def alerts_to_json(alerts: DataFrame) -> DataFrame:
    """Alert rows -> one JSON string per alert (`Alert.java` toJSON)."""
    return alerts.select(
        F.to_json(F.struct(*[F.col(c) for c in ALERT_SCHEMA.fieldNames()])).alias("value")
    )


def suppress_first_per_key(
    alerts: DataFrame,
    key_cols: list[str],
    expiry: str = "1 day",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Batch alert suppression: first alert per key per expiry bucket
    (`alert/AlertSuppressor.java` semantics — emit first, suppress
    repeats until the expiry timer fires). The streaming version keeps
    TTL state (streaming/suppress.py); batch buckets event time by the
    expiry interval, which yields identical results on final windows.
    """
    w = Window.partitionBy(
        *key_cols, F.window(F.col(ts_col), expiry)["start"]
    ).orderBy(ts_col, "alert_id")
    return (
        alerts.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def suppress_on_count_change(
    alerts: DataFrame,
    key_cols: list[str],
    count_col: str = "count",
    ts_col: str = "timestamp",
) -> DataFrame:
    """`AlertSuppressorCount.java:26-36`: re-emit a suppressed key when
    its count metadata changes — batch analog via lag compare."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, "alert_id")
    return (
        alerts.withColumn("__prev", F.lag(count_col).over(w))
        .where(F.col("__prev").isNull() | (F.col(count_col) != F.col("__prev")))
        .drop("__prev")
    )


def merge_for_notification(
    alerts: DataFrame, window: str = "5 minutes"
) -> DataFrame:
    """AlertIO notify-merge: group alerts sharing a notify_merge key
    within a window into one notification row with a combined summary
    (`alert/AlertIO.java:116-143`)."""
    merged = (
        alerts.where(F.col("notify_merge").isNotNull())
        .groupBy(F.window("timestamp", window).alias("w"), "notify_merge")
        .agg(
            F.count(F.lit(1)).alias("n_alerts"),
            F.min("timestamp").alias("first_ts"),
            F.min("summary").alias("__summary"),
        )
        .select(
            "notify_merge",
            "first_ts",
            "n_alerts",
            # reference format (AlertIO.AlertNotifyMerge, golden
            # TestAlertMerge.alertMergeTest): the surviving alert's
            # summary gains ' (N-1 similar alerts)' and the
            # notify_merged_count metadata ONLY when alerts actually
            # merged — a lone alert with a key passes through clean.
            # min(summary) is the deterministic stand-in for the
            # reference's arbitrary-survivor pick.
            F.when(
                F.col("n_alerts") > 1,
                F.concat(
                    F.col("__summary"), F.lit(" ("),
                    (F.col("n_alerts") - 1).cast("string"),
                    F.lit(" similar alerts)"),
                ),
            ).otherwise(F.col("__summary")).alias("summary"),
            F.when(F.col("n_alerts") > 1, F.col("n_alerts"))
            .alias("notify_merged_count"),
        )
    )
    passthrough = alerts.where(F.col("notify_merge").isNull()).select(
        F.lit(None).cast("string").alias("notify_merge"),
        F.col("timestamp").alias("first_ts"),
        F.lit(1).cast("long").alias("n_alerts"),
        F.col("summary"),
        F.lit(None).cast("long").alias("notify_merged_count"),
    )
    return merged.unionByName(passthrough)
