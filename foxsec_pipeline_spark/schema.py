"""The normalized event and alert data model.

Reference: `parser/Event.java:26-48` (event), `parser/Normalized.java:13-57`
(cross-source normalized view), `alert/Alert.java:21-52` (alert record),
`alert/AlertMeta.java:113-242` (typed metadata keys).

The reference is row-oriented (POJOs + Jackson); here the event model
is ONE wide columnar DataFrame: flat normalized analysis columns
(the hot path — always pruned to what a heuristic reads) plus a
`payload` json string for source-specific detail (parsed lazily with
`get_json_object` when a heuristic needs a payload field). This is the
columnar analog of Event{Payload, Normalized}.
"""

from __future__ import annotations

from pyspark.sql import types as T

# payload type discriminator values (parser/Payload.java:6-91 enum)
PAYLOAD_TYPES = [
    "glb",
    "nginx",
    "fxaauth",
    "fxacontent",
    "openssh",
    "cloudtrail",
    "gcpaudit",
    "gcpvpcflow",
    "duopull",
    "auth0",
    "apache_combined",
    "bmoaudit",
    "iprepdlog",
    "taskcluster",
    "amodocker",
    "alert",
    "guardduty",
    "etd",
    "cfgtick",
    "private_relay",
    "phabricator_audit",
    "raw",
]

# normalized categories (parser/Normalized.java:13-57)
NORMALIZED_AUTH = "auth"
NORMALIZED_AUTH_SESSION = "auth_session"
NORMALIZED_HTTP_REQUEST = "http_request"

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),        # Event.java:30 UUID
        T.StructField("timestamp", T.TimestampType()),    # Event.java:31
        T.StructField("payload_type", T.StringType()),
        T.StructField("normalized_type", T.StringType()),
        # normalized analysis columns (Normalized.java:39-57)
        T.StructField("source_address", T.StringType()),
        T.StructField("subject_user", T.StringType()),
        T.StructField("object", T.StringType()),
        T.StructField("request_method", T.StringType()),
        T.StructField("request_path", T.StringType()),
        T.StructField("request_host", T.StringType()),
        T.StructField("request_status", T.IntegerType()),
        T.StructField("user_agent", T.StringType()),
        # envelope metadata (hoisted — Parser.java:310-405)
        T.StructField("project_id", T.StringType()),
        T.StructField("resource", T.StringType()),        # multiplex element name
        # payload-specific typed detail, extracted at parse time (the
        # columnar analog of the reference's Payload getters; values
        # stringified, detectors cast as needed)
        T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        # source-specific detail, parsed lazily
        T.StructField("payload", T.StringType()),
        T.StructField("raw", T.StringType()),
    ]
)

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("alert_id", T.StringType()),        # Alert.java:36 UUID
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("category", T.StringType()),
        T.StructField("subcategory", T.StringType()),
        T.StructField("severity", T.StringType()),        # info|warn|critical
        T.StructField("summary", T.StringType()),
        T.StructField("notify_merge", T.StringType()),    # AlertIO merge key
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

SEVERITY_INFO = "info"
SEVERITY_WARNING = "warn"
SEVERITY_CRITICAL = "critical"
