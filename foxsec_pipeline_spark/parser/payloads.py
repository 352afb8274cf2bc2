"""Payload matchers + normalizers, probed in fixed order.

Reference: the 22-matcher probe chain `parser/Parser.java:597-619`
(first match wins); per-payload classes under `parser/*.java` (GLB,
Nginx, FxaAuth, OpenSSH, Cloudtrail, Alert, Raw). This module covers
the families the golden tests of the big four pipelines exercise;
adding a family = one (matcher, extractor) pair appended to the chain.

Each matcher is a boolean Column over the single parsed wide struct
(`envelopes.WIDE_SCHEMA`, column `j`) — struct field accesses, no
repeated JSON parsing. The whole chain is one `when` cascade: one
projection, no UDFs, short-circuit evaluation like the reference's
probe loop but vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.net import xff_select_client, xff_select_from_array
from ..schema import (
    NORMALIZED_AUTH,
    NORMALIZED_HTTP_REQUEST,
)


@dataclass
class PayloadSpec:
    name: str
    matcher: Column
    normalized_type: Column
    fields: dict[str, Column]  # normalized column -> expression
    event_ts: Column | None = None  # payload-level event time, if any


def _url_path(url: Column) -> Column:
    """path component of a full URL (GLB requestUrl)."""
    return F.regexp_replace(
        F.regexp_extract(url, r"^[a-z]+://[^/]+(/[^?#]*)?", 1), r"^$", "/"
    )


def _url_host(url: Column) -> Column:
    return F.regexp_extract(url, r"^[a-z]+://([^/:?#]+)", 1)


def glb_spec() -> PayloadSpec:
    """GCP HTTP(S) load balancer LogEntry (`parser/GLB.java`); fixture
    family FIXTURES.md F1. The httpRequest block lives at the LogEntry
    top level (sibling of jsonPayload)."""
    hr = F.col("j.httpRequest")
    return PayloadSpec(
        name="glb",
        matcher=(
            F.coalesce(F.col("j.jsonPayload.@type"), F.lit("")).rlike(
                "LoadBalancerLogEntry"
            )
            | hr["requestUrl"].isNotNull()
        ),
        normalized_type=F.lit(NORMALIZED_HTTP_REQUEST),
        fields={
            "source_address": hr["remoteIp"],
            "request_method": hr["requestMethod"],
            "request_path": _url_path(hr["requestUrl"]),
            "request_host": _url_host(hr["requestUrl"]),
            "request_status": hr["status"].cast("int"),
            "user_agent": hr["userAgent"],
        },
    )


def nginx_spec(xff_trusted_cidrs: list[str] | None = None) -> PayloadSpec:
    """nginx access log via Stackdriver jsonPayload variant
    (`parser/Nginx.java`, models/nginxstackdriver variant2;
    FIXTURES.md F2): fields remote_ip, request, code, agent.

    The XFF header goes through the client selector
    (`Parser.applyXffAddressSelector`, Parser.java:164-238) — a raw
    multi-hop chain ('ip1, ip2') is never used verbatim as
    source_address (it would null ipv4 math downstream)."""
    p = F.col("j.jsonPayload")
    req = p["request"]
    return PayloadSpec(
        name="nginx",
        matcher=p["remote_ip"].isNotNull() & req.isNotNull(),
        normalized_type=F.lit(NORMALIZED_HTTP_REQUEST),
        fields={
            "source_address": F.coalesce(
                xff_select_client(p["x_forwarded_for"], xff_trusted_cidrs),
                p["remote_ip"],
            ),
            "request_method": F.split(req, " ").getItem(0),
            "request_path": F.split(req, " ").getItem(1),
            "request_host": p["host"],
            "request_status": F.coalesce(p["code"], p["status"]).cast("int"),
            "user_agent": F.coalesce(p["agent"], p["user_agent"]),
        },
    )


def fxaauth_spec(xff_trusted_cidrs: list[str] | None = None) -> PayloadSpec:
    """Firefox Accounts auth server mozlog (`parser/FxaAuth.java`):
    mozlog Type fxa-auth-server / logger fxa-auth; Fields carry
    path/method/status/email/remoteAddressChain."""
    f = F.col("moz_fields")
    # remoteAddressChain is a JSON-encoded array string run through the
    # XFF client selector (FxaAuth.java:441-452 joins the array and
    # calls applyXffAddressSelector: right-to-left skipping trusted
    # proxies, LAST entry by default). One from_json over a tiny string.
    chain = F.from_json(f["remoteAddressChain"], "array<string>")
    selected = xff_select_from_array(chain, xff_trusted_cidrs)
    return PayloadSpec(
        name="fxaauth",
        matcher=(
            F.coalesce(F.col("moz_logger"), F.lit("")).rlike("fxa-auth")
            | F.coalesce(F.col("moz_type"), F.lit("")).rlike("fxa-auth")
        )
        & f["path"].isNotNull(),
        normalized_type=F.lit(NORMALIZED_AUTH),
        fields={
            "source_address": F.coalesce(selected, f["remoteAddress"]),
            "subject_user": F.coalesce(f["email"], f["uid"]),
            "request_method": f["method"],
            "request_path": f["path"],
            "request_status": f["status"].cast("int"),
            "user_agent": f["agent"],
        },
    )


def openssh_spec() -> PayloadSpec:
    """OpenSSH syslog auth line (`parser/OpenSSH.java`):
    'sshd[pid]: Accepted publickey for user from 1.2.3.4 port ...'.
    Regex over the text body (Stackdriver textPayload or the raw
    line)."""
    p = F.col("payload_text")
    rx = r"sshd\[\d+\]: (Accepted|Failed) (\S+) for (?:invalid user )?(\S+) from (\S+) port"
    return PayloadSpec(
        name="openssh",
        matcher=p.rlike(rx),
        normalized_type=F.lit(NORMALIZED_AUTH),
        fields={
            "source_address": F.regexp_extract(p, rx, 4),
            "subject_user": F.regexp_extract(p, rx, 3),
            "object": F.regexp_extract(p, rx, 2),  # auth method
            "request_status": F.when(
                F.regexp_extract(p, rx, 1) == "Accepted", 0
            ).otherwise(1),
        },
    )


def cloudtrail_spec() -> PayloadSpec:
    """AWS CloudTrail record (`parser/Cloudtrail.java`): eventVersion +
    userIdentity; normalized AUTH for console logins / AssumeRole."""
    j = F.col("j")
    ui = F.col("j.userIdentity")
    return PayloadSpec(
        name="cloudtrail",
        matcher=j["eventVersion"].isNotNull() & ui.isNotNull(),
        normalized_type=F.when(
            j["eventName"].isin("ConsoleLogin", "AssumeRole"),
            F.lit(NORMALIZED_AUTH),
        ),
        fields={
            "source_address": j["sourceIPAddress"],
            "subject_user": F.coalesce(
                ui["userName"],
                ui["sessionContext"]["sessionIssuer"]["userName"],
                ui["arn"],
            ),
            "object": j["eventName"],
            "user_agent": j["userAgent"],
        },
        event_ts=F.to_timestamp(j["eventTime"]),
    )


def gcpaudit_spec() -> PayloadSpec:
    """GCP audit log (Stackdriver protoPayload AuditLog —
    `parser/GcpAudit.java`): principal + method + resource, callerIp;
    the Pioneer pipeline's input."""
    pp = F.col("j.protoPayload")
    return PayloadSpec(
        name="gcpaudit",
        matcher=pp["methodName"].isNotNull()
        & pp["authenticationInfo"]["principalEmail"].isNotNull(),
        normalized_type=F.lit(NORMALIZED_AUTH),
        fields={
            "source_address": pp["requestMetadata"]["callerIp"],
            "subject_user": pp["authenticationInfo"]["principalEmail"],
            "object": F.coalesce(pp["resourceName"], pp["methodName"]),
        },
    )


_APACHE_RX = (
    r'^(\S+) \S+ (\S+) \[([^\]]+)\] "(\S+) (\S+)[^"]*" (\d{3}) \S+'
    r'(?: "([^"]*)" "([^"]*)")?'
)


def apache_combined_spec() -> PayloadSpec:
    """Apache/nginx combined access log as plain text
    (`parser/ApacheCombined.java`): classic
    'ip - user [ts] "GET /path HTTP/1.1" status size "ref" "ua"'."""
    p = F.col("payload_text")
    return PayloadSpec(
        name="apache_combined",
        matcher=p.rlike(_APACHE_RX),
        normalized_type=F.lit(NORMALIZED_HTTP_REQUEST),
        fields={
            "source_address": F.regexp_extract(p, _APACHE_RX, 1),
            "subject_user": F.when(
                F.regexp_extract(p, _APACHE_RX, 2) != "-",
                F.regexp_extract(p, _APACHE_RX, 2),
            ),
            "request_method": F.regexp_extract(p, _APACHE_RX, 4),
            "request_path": F.regexp_extract(p, _APACHE_RX, 5),
            "request_status": F.regexp_extract(p, _APACHE_RX, 6).cast("int"),
            "user_agent": F.when(
                F.regexp_extract(p, _APACHE_RX, 8) != "",
                F.regexp_extract(p, _APACHE_RX, 8),
            ),
        },
        event_ts=F.to_timestamp(
            F.regexp_extract(p, _APACHE_RX, 3), "dd/MMM/yyyy:HH:mm:ss Z"
        ),
    )


# auth0 type codes that are auth events (`parser/Auth0.java` AuthTypes)
_AUTH0_AUTH_TYPES = ["s", "ssa", "seacft", "seoobft", "seotpft", "sepft", "scoa"]


def auth0_spec() -> PayloadSpec:
    """auth0 log event (`parser/Auth0.java`,
    `models/auth0/LogEvent.java`): _id/date/type/ip/user_id; AUTH
    normalized for the success-auth type codes. (The reference digs a
    username out of details.prompt; user_id is the stable subject.)"""
    j = F.col("j")
    return PayloadSpec(
        name="auth0",
        matcher=j["_id"].isNotNull()
        & j["date"].isNotNull()
        & j["type"].isNotNull(),
        normalized_type=F.when(
            j["type"].isin(_AUTH0_AUTH_TYPES), F.lit(NORMALIZED_AUTH)
        ),
        fields={
            "source_address": j["ip"],
            "subject_user": j["user_id"],
            "object": j["client_name"],
        },
        event_ts=F.to_timestamp(j["date"]),
    )


def duopull_spec() -> PayloadSpec:
    """Duo Security audit pull (`parser/Duopull.java`,
    `models/duopull/Duopull.java`): flat mozlog-ish record with
    msg='duopull event'; admin_login actions normalize to AUTH."""
    j = F.col("j")
    return PayloadSpec(
        name="duopull",
        matcher=j["msg"] == "duopull event",
        normalized_type=F.when(
            j["event_action"] == "admin_login", F.lit(NORMALIZED_AUTH)
        ),
        fields={
            "source_address": j["event_description_ip_address"],
            "subject_user": j["event_username"],
            "object": F.coalesce(j["event_object"], j["event_action"]),
        },
        event_ts=F.timestamp_seconds(j["event_timestamp"].cast("long")),
    )


def alert_spec() -> PayloadSpec:
    """Re-ingested Alert JSON (`parser/Alert.java` payload) — alerts
    are themselves events for PostProcessing."""
    j = F.col("j")
    return PayloadSpec(
        name="alert",
        matcher=j["summary"].isNotNull()
        & j["severity"].isNotNull()
        & j["category"].isNotNull(),
        normalized_type=F.lit(None).cast("string"),
        fields={
            "object": j["category"],
            "subject_user": j["metadata"].getItem("username"),
            "source_address": j["metadata"].getItem("sourceaddress"),
        },
        event_ts=F.to_timestamp(j["timestamp"]),
    )


def default_chain(xff_trusted_cidrs: list[str] | None = None) -> list[PayloadSpec]:
    """Fixed probe order, mirroring Parser.java:597-619 (most-specific
    first, raw fallback implicit)."""
    return [
        glb_spec(),
        nginx_spec(xff_trusted_cidrs),
        fxaauth_spec(xff_trusted_cidrs),
        cloudtrail_spec(),
        gcpaudit_spec(),
        duopull_spec(),
        auth0_spec(),
        openssh_spec(),
        apache_combined_spec(),
        alert_spec(),
    ]
