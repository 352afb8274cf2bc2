"""Payload matchers + normalizers, probed in fixed order.

Reference: the 22-matcher probe chain `parser/Parser.java:597-619`
(first match wins); per-payload classes under `parser/*.java` (GLB,
Nginx, FxaAuth, OpenSSH, Cloudtrail, Alert, Raw). This module covers
the families the golden tests of the big four pipelines exercise;
adding a family = one (matcher, extractor) pair appended to the chain.

Each matcher is a boolean Column over the envelope-stripped columns;
each extractor produces the normalized columns. The whole chain is a
single `when` cascade — one projection, no UDFs, short-circuit
evaluation like the reference's probe loop but vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema import (
    NORMALIZED_AUTH,
    NORMALIZED_HTTP_REQUEST,
)


def _j(col: Column | str, path: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


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
    family FIXTURES.md F1. Payload is the LogEntry's jsonPayload with
    an httpRequest sibling — the reference reads both; we parse the
    raw envelope fields hoisted by strip_envelopes plus httpRequest.*
    via the raw line (the envelope keeps it at the top level)."""
    hr = F.col("http_request_json")
    return PayloadSpec(
        name="glb",
        matcher=(
            _j("payload", "$.@type").rlike("LoadBalancerLogEntry")
            | (hr.isNotNull() & _j(hr, "$.requestUrl").isNotNull())
        ),
        normalized_type=F.lit(NORMALIZED_HTTP_REQUEST),
        fields={
            "source_address": _j(hr, "$.remoteIp"),
            "request_method": _j(hr, "$.requestMethod"),
            "request_path": _url_path(_j(hr, "$.requestUrl")),
            "request_host": _url_host(_j(hr, "$.requestUrl")),
            "request_status": _j(hr, "$.status").cast("int"),
            "user_agent": _j(hr, "$.userAgent"),
        },
    )


def nginx_spec() -> PayloadSpec:
    """nginx access log via Stackdriver jsonPayload variant
    (`parser/Nginx.java`, models/nginxstackdriver variant2;
    FIXTURES.md F2): fields remote_ip, request, code, agent."""
    p = F.col("payload")
    req = _j(p, "$.request")
    return PayloadSpec(
        name="nginx",
        matcher=_j(p, "$.remote_ip").isNotNull() & req.isNotNull(),
        normalized_type=F.lit(NORMALIZED_HTTP_REQUEST),
        fields={
            "source_address": F.coalesce(_j(p, "$.x_forwarded_for"), _j(p, "$.remote_ip")),
            "request_method": F.split(req, " ").getItem(0),
            "request_path": F.split(req, " ").getItem(1),
            "request_host": _j(p, "$.host"),
            "request_status": F.coalesce(_j(p, "$.code"), _j(p, "$.status")).cast("int"),
            "user_agent": F.coalesce(_j(p, "$.agent"), _j(p, "$.user_agent")),
        },
    )


def fxaauth_spec() -> PayloadSpec:
    """Firefox Accounts auth server mozlog (`parser/FxaAuth.java`):
    mozlog Type fxa-auth-server / logger fxa-auth; Fields carry
    path/method/status/email/remoteAddressChain."""
    p = F.col("payload")
    chain = _j(p, "$.remoteAddressChain")
    return PayloadSpec(
        name="fxaauth",
        matcher=(
            F.coalesce(F.col("moz_logger"), F.lit("")).rlike("fxa-auth")
            | F.coalesce(F.col("moz_type"), F.lit("")).rlike("fxa-auth")
        )
        & _j(p, "$.path").isNotNull(),
        normalized_type=F.lit(NORMALIZED_AUTH),
        fields={
            # remoteAddressChain is a JSON array; XFF-style selection:
            # last entry is the LB, client is the first (reference uses
            # configured xff selector — Parser.java:164-238)
            "source_address": F.coalesce(_j(chain, "$[0]"), _j(p, "$.remoteAddress")),
            "subject_user": F.coalesce(_j(p, "$.email"), _j(p, "$.uid")),
            "request_method": _j(p, "$.method"),
            "request_path": _j(p, "$.path"),
            "request_status": _j(p, "$.status").cast("int"),
            "user_agent": _j(p, "$.agent"),
        },
    )


def openssh_spec() -> PayloadSpec:
    """OpenSSH syslog auth line (`parser/OpenSSH.java`):
    'sshd[pid]: Accepted publickey for user from 1.2.3.4 port ...'."""
    p = F.col("payload")
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
    p = F.col("payload")
    return PayloadSpec(
        name="cloudtrail",
        matcher=_j(p, "$.eventVersion").isNotNull()
        & _j(p, "$.userIdentity").isNotNull(),
        normalized_type=F.when(
            _j(p, "$.eventName").isin("ConsoleLogin", "AssumeRole"),
            F.lit(NORMALIZED_AUTH),
        ),
        fields={
            "source_address": _j(p, "$.sourceIPAddress"),
            "subject_user": F.coalesce(
                _j(p, "$.userIdentity.userName"),
                _j(p, "$.userIdentity.sessionContext.sessionIssuer.userName"),
                _j(p, "$.userIdentity.arn"),
            ),
            "object": _j(p, "$.eventName"),
            "user_agent": _j(p, "$.userAgent"),
        },
        event_ts=F.to_timestamp(_j(p, "$.eventTime")),
    )


def alert_spec() -> PayloadSpec:
    """Re-ingested Alert JSON (`parser/Alert.java` payload) — alerts
    are themselves events for PostProcessing."""
    p = F.col("payload")
    return PayloadSpec(
        name="alert",
        matcher=_j(p, "$.summary").isNotNull()
        & _j(p, "$.severity").isNotNull()
        & _j(p, "$.category").isNotNull(),
        normalized_type=F.lit(None).cast("string"),
        fields={
            "object": _j(p, "$.category"),
            "subject_user": _j(p, "$.metadata.username"),
            "source_address": _j(p, "$.metadata.sourceaddress"),
        },
        event_ts=F.to_timestamp(_j(p, "$.timestamp")),
    )


def default_chain() -> list[PayloadSpec]:
    """Fixed probe order, mirroring Parser.java:597-619 (most-specific
    first, raw fallback implicit)."""
    return [
        glb_spec(),
        nginx_spec(),
        fxaauth_spec(),
        cloudtrail_spec(),
        openssh_spec(),
        alert_spec(),
    ]
