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
    NORMALIZED_AUTH_SESSION,
    NORMALIZED_HTTP_REQUEST,
)


@dataclass
class PayloadSpec:
    name: str
    matcher: Column
    normalized_type: Column
    fields: dict[str, Column]  # normalized column -> expression
    event_ts: Column | None = None  # payload-level event time, if any
    # payload-specific detail -> `fields` map column on the event
    # (the columnar analog of the reference's typed Payload getters;
    # values are stringified — detectors cast as needed)
    extras: dict[str, Column] | None = None


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
        # EXACT @type equality, no httpRequest fallback — GLB.java:
        # 29-36 matches only the LoadBalancerLogEntry type value; a
        # LogEntry with an httpRequest block but no @type is RAW
        # (golden: ParserTest.testStackdriverJsonNoType)
        matcher=(
            F.col("j.jsonPayload.@type")
            == "type.googleapis.com/google.cloud.loadbalancing.type"
               ".LoadBalancerLogEntry"
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


def nginx_spec(
    xff_trusted_cidrs: list[str] | None = None,
    use_xff_as_remote: bool = False,
    use_proxy_xff: bool = False,
) -> PayloadSpec:
    """nginx access log via Stackdriver jsonPayload, BOTH reference
    variants (`parser/Nginx.java:40-55` matchesStackdriverVariant1/2;
    FIXTURES.md F2):

    - variant1 (GCP k8s stdout): remote_addr / request / bytes_sent /
      request_time / user_agent / x_forwarded_for / status — the
      sessionlimit/perendpointerrorrate fixture shape;
    - variant2 (EC2): remote_ip / referrer / req_time / agent /
      request / code.

    Source-address semantics follow `Nginx.java:207-231` exactly: the
    remote_addr/remote_ip field is the source (a '-' counts as
    absent); the x_forwarded_for header OVERRIDES it only when the
    parser is configured with use_xff_as_remote
    (`ParserCfg.setUseXffAsRemote` — default OFF; golden:
    ParserTest.testParseNginxStackdriverVariant1 asserts remote_addr
    wins over the XFF chain by default, the XFF*Selector variants
    assert the override). Either way the final value runs through the
    XFF client selector (`Parser.applyXffAddressSelector`,
    Parser.java:164-238) so a multi-hop chain is never used verbatim
    as source_address (it would null ipv4 math downstream)."""
    p = F.col("j.jsonPayload")
    req = p["request"]
    v1 = (
        p["remote_addr"].isNotNull()
        & req.isNotNull()
        & p["bytes_sent"].isNotNull()
        & p["request_time"].isNotNull()
    )
    v2 = p["remote_ip"].isNotNull() & req.isNotNull()
    base = F.coalesce(
        F.nullif(p["remote_addr"], F.lit("-")), p["remote_ip"]
    )
    if use_xff_as_remote:
        xff = p["x_forwarded_for"]
        xff_ok = xff.isNotNull() & (xff != "-") & (xff != "")
        if use_proxy_xff:
            # Parser.java:211-238 applyProxyXFFAddressSelector: the
            # client hop sits before the pipeline's own proxies —
            # second-from-last normally, third-from-last when the
            # x_pipeline_proxy marker says an extra proxy hop was
            # appended; single-entry chains pass through
            xpp = p["x_pipeline_proxy"]
            proxied = xpp.isNotNull() & (xpp != "-") & (xpp != "")
            # NB lambda wrapper: F.trim has an optional second param,
            # so passing it bare makes transform bind (element, index)
            # to TRIM(str, trimStr)
            arr = F.transform(F.split(xff, ","), lambda s: F.trim(s))
            n = F.size(arr)
            picked = (
                F.when(n <= 1, F.trim(xff))
                .when(~proxied | (n == 2), F.element_at(arr, -2))
                .otherwise(F.element_at(arr, -3))
            )
            source = F.when(xff_ok, picked).otherwise(
                xff_select_client(base, xff_trusted_cidrs)
            )
        else:
            source = F.when(
                xff_ok, xff_select_client(xff, xff_trusted_cidrs)
            ).otherwise(xff_select_client(base, xff_trusted_cidrs))
    else:
        source = xff_select_client(base, xff_trusted_cidrs)
    return PayloadSpec(
        name="nginx",
        matcher=v1 | v2,
        normalized_type=F.lit(NORMALIZED_HTTP_REQUEST),
        fields={
            "source_address": source,
            "request_method": F.split(req, " ").getItem(0),
            "request_path": F.regexp_replace(
                F.split(req, " ").getItem(1), r"[?#].*$", ""
            ),
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
    # event_summary classification (`FxaAuth.java:174-414`
    # discernEventSummary): the ordered discern* cascade over
    # (path, method, status, errno). errno REQUEST_BLOCKED (125)
    # suppresses classification entirely — the request was already
    # rejected. Errno constants from models/fxaauth/FxaAuth.java:
    # ACCOUNT_UNKNOWN=102, INCORRECT_PASSWORD=103,
    # INVALID_VERIFICATION_CODE=105. (devicesListSuccess exists in
    # the reference enum but its discern rule is never invoked in the
    # cascade — mirrored here by omission.)
    errno = f["errno"].cast("int")
    method = F.lower(f["method"])
    status = f["status"].cast("int")
    path = f["path"]
    _rules = [
        ((path == "/v1/account/login") & (status == 400)
         & errno.isin(102, 103), "loginFailure"),
        ((path == "/v1/account/status") & (status == 200)
         & method.isin("post", "get"), "accountStatusCheckSuccess"),
        ((path == "/v1/recovery_email/verify_code") & (status == 400)
         & (method == "post") & errno.isin(105, 102),
         "recoveryEmailVerifyCodeFailure"),
        ((path == "/v1/recovery_email") & (status == 200)
         & (method == "post"), "sendRecoveryEmailSuccess"),
        ((path == "/v1/sms") & (status == 200) & (method == "post"),
         "sendSmsConnectDeviceSuccess"),
        ((path == "/v1/account/create") & (status == 200)
         & (method == "post"), "accountCreateSuccess"),
        ((path == "/v1/account/login") & (status == 200)
         & (method == "post"), "loginSuccess"),
        ((path == "/v1/password/forgot/send_code") & (method == "post")
         & (status == 200), "passwordForgotSendCodeSuccess"),
        ((path == "/v1/password/forgot/send_code") & (method == "post")
         & (status == 400), "passwordForgotSendCodeFailure"),
        ((path == "/v1/certificate/sign") & (method == "post")
         & (status == 200), "certificateSignSuccess"),
        ((path == "/v1/session/verify_code") & (status == 200)
         & (method == "post"), "sessionVerifyCodeSuccess"),
        ((path == "/v1/account/status") & (status == 429)
         & method.isin("post", "get"), "accountStatusCheckBlocked"),
    ]
    cascade = None
    for cond, name in _rules:
        cascade = F.when(cond, name) if cascade is None else cascade.when(cond, name)
    guard = (
        path.isNotNull() & f["method"].isNotNull() & status.isNotNull()
        & (errno.isNull() | (errno != 125))
    )
    event_summary = F.when(guard, cascade).otherwise(F.lit(None).cast("string"))
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
        extras={
            "errno": errno,
            "event_summary": event_summary,
            "service": f["service"],
            "uid": f["uid"],
        },
    )


def openssh_spec() -> PayloadSpec:
    """OpenSSH syslog line (`parser/OpenSSH.java:13-16,53-70`, golden
    parity `ParserTest.java:162-244`). Reference semantics, matched
    exactly:

    - the MATCHER is any sshd line behind a syslog timestamp
      (`matchRe` :13) — a failed/other sshd line is still an OPENSSH
      payload, just with no extracted fields and no normalized type;
    - field extraction happens only for the Accepted form
      (`authAcceptedRe` :16): normalized AUTH with subject_user=user,
      source_address=addr, object=HOSTNAME (`:65 n.setObject`), and
      the auth method as a payload field;
    - the event timestamp is the SYSLOG prefix re-yeared to the
      envelope timestamp's year — or the current year for a raw line
      (`Parser.parseAndCorrectSyslogTs` :129-139; the ±3-day guard
      there compares the year-2000 Joda default parse against a
      modern event ts, so it never passes and the behavior IS plain
      withYear — including the documented quirk that a Dec 31 syslog
      line under a Jan 2 envelope lands 11 months in the future).
    """
    p = F.col("payload_text")
    syslog = r"\S{3} {1,2}\d{1,2} \d{1,2}:\d{1,2}:\d{1,2}"
    match_rx = rf"^{syslog} \S+ \S*sshd\[\d+\]: .+"
    rx = (
        rf"({syslog}) (\S+) sshd\[\d+\]: Accepted (\S+) for (\S+) "
        rf"from (\S+) port (\d+).*"
    )
    accepted = p.rlike(rx)
    ref_year = F.year(F.coalesce(F.col("envelope_ts"), F.current_timestamp()))
    body = F.regexp_replace(F.regexp_extract(p, rx, 1), r"\s+", " ")
    return PayloadSpec(
        name="openssh",
        matcher=p.rlike(match_rx),
        normalized_type=F.when(accepted, F.lit(NORMALIZED_AUTH)),
        fields={
            "source_address": F.when(accepted, F.regexp_extract(p, rx, 5)),
            "subject_user": F.when(accepted, F.regexp_extract(p, rx, 4)),
            "object": F.when(accepted, F.regexp_extract(p, rx, 2)),
        },
        extras={
            "auth_method": F.when(accepted, F.regexp_extract(p, rx, 3)),
        },
        event_ts=F.when(
            accepted,
            F.try_to_timestamp(
                F.concat(ref_year.cast("string"), F.lit(" "), body),
                F.lit("yyyy MMM d HH:mm:ss"),
            ),
        ),
    )


def cloudtrail_spec() -> PayloadSpec:
    """AWS CloudTrail record (`parser/Cloudtrail.java`): eventVersion +
    userIdentity; normalized AUTH for console logins / AssumeRole.
    Fields coalesce the top-level record with the Stackdriver-wrapped
    form (jsonPayload carrying the record — GCP log-sink re-ingestion,
    the authprof_awscorr fixture shape; the reference peels the
    envelope first so both arrive identically)."""

    def ct(path: str) -> Column:
        return F.coalesce(F.col(f"j.{path}"), F.col(f"j.jsonPayload.{path}"))

    return _cloudtrail_spec_from(ct)


def _ct_is_auth(ct, j):
    """`Cloudtrail.java:175-208 isAuthEvent` verbatim: ConsoleLogin /
    SwitchRole need the AwsConsoleSignIn eventType AND the Success
    responseElements value; GetSessionToken / AssumeRole need an
    IAMUser (or, for AssumeRole, AWSAccount — the cross-account form)
    with no errorCode."""
    user_type = ct("userIdentity.type")
    no_err = ct("errorCode").isNull()
    console = ct("eventType") == "AwsConsoleSignIn"
    return (
        ((j["eventName"] == "ConsoleLogin") & console
         & (ct("responseElements.ConsoleLogin") == "Success"))
        | ((j["eventName"] == "GetSessionToken")
           & (user_type == "IAMUser") & no_err)
        | ((j["eventName"] == "AssumeRole")
           & user_type.isin("IAMUser", "AWSAccount") & no_err)
        | ((j["eventName"] == "SwitchRole") & console
           & (ct("responseElements.SwitchRole") == "Success"))
    )


def _ct_identity_name(ct, ui):
    """`Cloudtrail.java:153-172 getUser` + `CloudtrailEvent.java:
    134-146 getIdentityName`: a successful SwitchRole names the user
    from the additionalEventData.SwitchFrom ARN's user/ resource
    (the identity that switched IN — userIdentity only carries the
    assumed role); everything else resolves the acting identity by
    userIdentity.type. Kept for every cloudtrail row (the
    payload-level user surface the matchers/queries filter on); the
    reference only copies it into the NORMALIZED subject for auth
    events, but leaves the payload getter total."""
    user_type = ct("userIdentity.type")
    switch_user = F.regexp_extract(
        ct("additionalEventData.SwitchFrom"), r":user/([^:]+)$", 1
    )
    by_type = (
        F.when(user_type == "IAMUser", ui["userName"])
        .when(user_type == "AssumedRole",
              ui["sessionContext.sessionIssuer.userName"])
        .when(user_type == "AWSService", ui["invokedBy"])
        .when(user_type == "AWSAccount", ct("userIdentity.accountId"))
    )
    return F.when(
        (ct("eventName") == "SwitchRole")
        & (ct("eventType") == "AwsConsoleSignIn")
        & (ct("responseElements.SwitchRole") == "Success")
        & (switch_user != ""),
        switch_user,
    ).otherwise(by_type)


def _cloudtrail_spec_from(ct) -> PayloadSpec:
    j = {k: ct(k) for k in (
        "eventVersion", "eventName", "eventTime", "eventSource",
        "recipientAccountId", "sourceIPAddress", "userAgent",
    )}
    ui = {
        k: ct(f"userIdentity.{k}") for k in ("userName", "arn", "invokedBy")
    }
    ui["sessionContext.sessionIssuer.userName"] = ct(
        "userIdentity.sessionContext.sessionIssuer.userName"
    )
    ui["sessionContext.attributes.mfaAuthenticated"] = ct(
        "userIdentity.sessionContext.attributes.mfaAuthenticated"
    )
    return PayloadSpec(
        name="cloudtrail",
        matcher=(
            j["eventVersion"].isNotNull()
            & F.col("j.userIdentity").isNotNull()
        )
        | (
            F.col("j.jsonPayload.eventVersion").isNotNull()
            & F.col("j.jsonPayload.userIdentity").isNotNull()
        )
        | (
            # STS AssumeRole responses may omit userIdentity.userName
            # but always carry the role session identity
            ct("requestParameters.roleSessionName").isNotNull()
            & ct("eventSource").isNotNull()
        ),
        normalized_type=F.when(_ct_is_auth(ct, j), F.lit(NORMALIZED_AUTH)),
        fields={
            "source_address": j["sourceIPAddress"],
            "subject_user": _ct_identity_name(ct, ui),
            # Cloudtrail.java:86 — the normalized object of an auth
            # event is the RECIPIENT ACCOUNT (optionally renamed via
            # the identity manager's aws_account_map downstream), not
            # the event name; non-auth events leave it unset
            "object": F.when(_ct_is_auth(ct, j), j["recipientAccountId"]),
            "user_agent": j["userAgent"],
        },
        extras={
            # Cloudtrail.java:81 n.setReferenceID(eventID) — every
            # cloudtrail event carries its upstream id
            "reference_id": ct("eventID"),
            # Cloudtrail.java:90-92 cross-account AssumeRole is
            # flagged for subject fixup by the correlator
            "status_tag": F.when(
                (j["eventName"] == "AssumeRole")
                & (ct("userIdentity.type") == "AWSAccount")
                & ct("errorCode").isNull(),
                "requires_subject_user_fixup",
            ),
            # the AwsBehavior matcher field surface
            # (awsbehavior/CloudtrailMatcher.java; event_matchers.json)
            "event_name": j["eventName"],
            "event_source": j["eventSource"],
            "recipient_account_id": j["recipientAccountId"],
            "invoked_by": ui["invokedBy"],
            "mfa_authenticated": ui["sessionContext.attributes.mfaAuthenticated"],
            "request_user_name": ct("requestParameters.userName"),
            # AssumeRole correlation surface
            # (authprofile/AwsAssumeRoleCorrelator.java)
            "role_arn": ct("requestParameters.roleArn"),
            "role_session_name": ct("requestParameters.roleSessionName"),
            "assumed_role_arn": ct("responseElements.assumedRoleUser.arn"),
            "identity_arn": ui["arn"],
            "identity_account_id": ct("userIdentity.accountId"),
        },
        event_ts=F.to_timestamp(j["eventTime"]),
    )


def gcpaudit_spec() -> PayloadSpec:
    """GCP audit log (Stackdriver protoPayload AuditLog —
    `parser/GcpAudit.java`): principal + method + resource, callerIp;
    the Pioneer pipeline's input."""
    pp = F.col("j.protoPayload")
    principal = pp["authenticationInfo"]["principalEmail"]
    caller = pp["requestMetadata"]["callerIp"]
    # GcpAudit.java:198-206: the normalized object is
    # authorizationInfo[0].resource, and the event normalizes to
    # AUTH_SESSION (on-going use of an authenticated session, NOT a
    # fresh AUTH) only when principal+source+resource are ALL present
    # (golden: ParserTest.testParseGcpAudit)
    resource = F.try_element_at(pp["authorizationInfo"], F.lit(1))["resource"]
    return PayloadSpec(
        name="gcpaudit",
        matcher=pp["methodName"].isNotNull() & principal.isNotNull(),
        normalized_type=F.when(
            principal.isNotNull() & caller.isNotNull()
            & resource.isNotNull(),
            F.lit(NORMALIZED_AUTH_SESSION),
        ),
        fields={
            "source_address": caller,
            "subject_user": principal,
            "object": resource,
        },
        extras={
            "method_name": pp["methodName"],
            "resource_name": pp["resourceName"],
        },
    )


# the remote host may be emitted quoted ("%h" LogFormat variants) —
# the reference strips the quotes (ParserTest.testParseApacheCombined
# feeds '"216.160.83.56" - - [...]' and asserts the bare address)
# the remote host field may be a QUOTED XFF-style chain ('"ip1, ip2"
# riker - [...]' — ParserTest.testParseApacheCombinedXffUser) or a
# bare token; the chain goes through the XFF client selector like
# every other multi-address source
_APACHE_RX = (
    r'^"?([^"]*?)"? \S+ (\S+) \[([^\]]+)\] "(\S+) (\S+)[^"]*" (\d{3}) \S+'
    r'(?: "([^"]*)" "([^"]*)")?'
)


def apache_combined_spec(
    xff_trusted_cidrs: list[str] | None = None,
) -> PayloadSpec:
    """Apache/nginx combined access log as plain text
    (`parser/ApacheCombined.java`): classic
    'ip - user [ts] "GET /path HTTP/1.1" status size "ref" "ua"'."""
    p = F.col("payload_text")
    return PayloadSpec(
        name="apache_combined",
        matcher=p.rlike(_APACHE_RX),
        normalized_type=F.lit(NORMALIZED_HTTP_REQUEST),
        fields={
            "source_address": xff_select_client(
                F.regexp_extract(p, _APACHE_RX, 1), xff_trusted_cidrs
            ),
            "subject_user": F.when(
                F.regexp_extract(p, _APACHE_RX, 2) != "-",
                F.regexp_extract(p, _APACHE_RX, 2),
            ),
            "request_method": F.regexp_extract(p, _APACHE_RX, 4),
            # normalized UrlRequestPath carries no query component
            # (ParserTest.testParseApacheCombined: '/assets/scripts/'
            # 'main.js?t=t' -> '/assets/scripts/main.js')
            "request_path": F.regexp_replace(
                F.regexp_extract(p, _APACHE_RX, 5), r"[?#].*$", ""
            ),
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
    normalized for the success-auth type codes. The subject is the
    first details.prompts[].user_name (`Auth0.java:212-232`
    getUsername — the lock-password prompt carries the canonical
    email the IdentityManager resolves; golden-verified on
    authprof_buffer6); user_id (the LDAP connection id) is the
    fallback."""
    j = F.col("a0")
    prompt_user = F.try_element_at(
        F.filter(
            F.coalesce(
                j["details"]["prompts"],
                F.array().cast("array<struct<user_name:string>>"),
            ),
            lambda x: x["user_name"].isNotNull(),
        ),
        F.lit(1),
    )["user_name"]
    return PayloadSpec(
        name="auth0",
        # the client_id-as-ARRAY bug case is deliberately RAW
        # (ParserTest.testAuth0EventClientIdArrayAsRaw — Jackson fails
        # to read the LogEvent model, so the reference never matches);
        # the textual probe mirrors that deserialization failure
        matcher=j["_id"].isNotNull()
        & j["date"].isNotNull()
        & j["type"].isNotNull()
        & ~F.col("payload_text").rlike(r'"client_id"\s*:\s*\['),
        normalized_type=F.when(
            j["type"].isin(_AUTH0_AUTH_TYPES), F.lit(NORMALIZED_AUTH)
        ),
        fields={
            "source_address": j["ip"],
            "subject_user": F.coalesce(prompt_user, j["user_id"]),
            "object": j["client_name"],
        },
        extras={
            "client_id": j["client_id"],
            "auth0_type": j["type"],
            "user_id": j["user_id"],
        },
        event_ts=F.to_timestamp(j["date"]),
    )


def duopull_spec() -> PayloadSpec:
    """Duo Security audit pull (`parser/Duopull.java`,
    `models/duopull/Duopull.java`): flat record with msg='duopull
    event', arriving BARE or inside mozlog Fields under any envelope
    (bare mozlog / Stackdriver jsonPayload / Stackdriver textPayload
    — golden: ParserTest.testParse*DuopullBypass x4). Every field
    coalesces the top level with mozlog Fields; admin_login actions
    normalize to AUTH; the payload event_timestamp overrides both the
    mozlog and envelope timestamps."""
    j = F.col("j")
    mf = F.col("moz_fields")

    def dp(k):
        return F.coalesce(j[k], mf[k])

    return PayloadSpec(
        name="duopull",
        matcher=dp("msg") == "duopull event",
        normalized_type=F.when(
            dp("event_action") == "admin_login", F.lit(NORMALIZED_AUTH)
        ),
        fields={
            "source_address": dp("event_description_ip_address"),
            "subject_user": dp("event_username"),
            "object": F.coalesce(dp("event_object"), dp("event_action")),
        },
        extras={
            "event_action": dp("event_action"),
            "event_reason": dp("event_reason"),
            "path": F.coalesce(j["path"], mf["path"]),
        },
        event_ts=F.timestamp_seconds(dp("event_timestamp").cast("long")),
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


def fxacontent_spec(xff_trusted_cidrs: list[str] | None = None) -> PayloadSpec:
    """FxA content server mozlog (`parser/FxaContent.java`): logger
    fxa-content-server; clientAddress preferred, else the XFF-selected
    remoteAddressChain (FxaContent.java:115-140); request-type
    discernment over the path (FxaContent.java:30-46)."""
    f = F.col("moz_fields")
    chain = F.from_json(f["remoteAddressChain"], "array<string>")
    path = f["path"]
    return PayloadSpec(
        name="fxacontent",
        matcher=F.coalesce(F.col("moz_logger"), F.lit("")) == "fxa-content-server",
        normalized_type=F.lit(None).cast("string"),
        fields={
            "source_address": F.coalesce(
                f["clientAddress"], xff_select_from_array(chain, xff_trusted_cidrs)
            ),
            "request_method": f["method"],
            "request_path": path,
            "request_status": f["status"].cast("int"),
            "user_agent": f["userAgent"],
        },
        extras={
            "request_type": F.when(path.startswith("/metrics"), "metrics")
            .when(path.startswith("/validate-email-domain"), "validate_email_domain")
            .otherwise("other"),
        },
    )


def privaterelay_spec() -> PayloadSpec:
    """Private Relay mozlog (`parser/PrivateRelay.java`): logger
    fx-private-relay; msg discriminates EMAIL_RELAY / FXA_RP_EVENT;
    carries fxa_uid + real/relay address pair."""
    f = F.col("moz_fields")
    return PayloadSpec(
        name="private_relay",
        matcher=F.coalesce(F.col("moz_logger"), F.lit("")) == "fx-private-relay",
        normalized_type=F.lit(None).cast("string"),
        fields={"subject_user": f["fxa_uid"]},
        extras={
            "relay_event_type": F.when(f["msg"] == "email_relay", "email_relay")
            .when(f["msg"] == "fxa_rp_event", "fxa_rp_event"),
            "fxa_uid": f["fxa_uid"],
            "real_address": f["real_address"],
            "relay_address": f["relay_address"],
            "relay_address_id": f["relay_address_id"],
            "event_key": f["event_key"],
        },
    )


def guardduty_spec() -> PayloadSpec:
    """AWS GuardDuty finding (`parser/GuardDuty.java:25-50`): the
    normal path is the CloudWatch Event wrapper (source ==
    aws.guardduty); a BARE finding also matches when its
    GuardDuty-specific identity fields are all present
    (type+arn+accountId+title+description — the reference's guard
    against generic JSON reading onto the Finding model,
    golden-verified by ParserTest.testParseGuardDutyFinding). Every
    field coalesces detail.* (wrapped) with the top level (bare)."""
    d = F.col("j.detail")

    def gd(field):
        return F.coalesce(d[field], F.col(f"j.{field}"))

    bare = (
        F.col("j.type").isNotNull()
        & F.col("j.arn").isNotNull()
        & F.col("j.accountId").isNotNull()
        & F.col("j.title").isNotNull()
        & F.col("j.description").isNotNull()
    )
    res = F.coalesce(d["resource"]["resourceType"],
                     F.col("j.resource.resourceType"))
    ip = F.coalesce(
        d["service"]["action"]["awsApiCallAction"]["remoteIpDetails"][
            "ipAddressV4"
        ],
        F.col("j.service.action.awsApiCallAction.remoteIpDetails.ipAddressV4"),
    )
    user = F.coalesce(
        d["resource"]["accessKeyDetails"]["userName"],
        F.col("j.resource.accessKeyDetails.userName"),
    )
    return PayloadSpec(
        name="guardduty",
        matcher=(
            (F.col("j.source") == "aws.guardduty")
            & d["type"].isNotNull()
            & d["arn"].isNotNull()
        )
        | bare,
        normalized_type=F.lit(None).cast("string"),
        fields={
            "source_address": ip,
            "subject_user": user,
            "object": gd("arn"),
        },
        extras={
            "finding_type": gd("type"),
            "finding_id": gd("id"),
            "account_id": gd("accountId"),
            "region": F.coalesce(d["region"], F.col("j.region")),
            "severity": gd("severity"),
            "title": gd("title"),
            "description": gd("description"),
            "resource_type": res,
            "instance_id": F.coalesce(
                d["resource"]["instanceDetails"]["instanceId"],
                F.col("j.resource.instanceDetails.instanceId"),
            ),
        },
        event_ts=F.to_timestamp(F.col("j.time")),
    )


def etdbeta_spec() -> PayloadSpec:
    """GCP Event Threat Detection finding (`parser/ETDBeta.java:
    matcher`): normally a Stackdriver LogEntry with resource.type ==
    threat_detector and the finding body in jsonPayload (models/etd/*);
    a BARE finding also matches when detectionPriority+eventTime are
    present (the reference's consistency fallback — golden:
    ParserTest.testParseETDFinding). Fields coalesce both shapes."""
    p = F.col("j.jsonPayload")

    def ed(path):
        cur_p, cur_t = p, F.col("j")
        for part in path.split("."):
            cur_p, cur_t = cur_p[part], cur_t[part]
        return F.coalesce(cur_p, cur_t)

    bare = (
        F.col("j.detectionPriority").isNotNull()
        & F.col("j.eventTime").isNotNull()
    )
    return PayloadSpec(
        name="etd",
        matcher=(F.col("j.resource.type") == "threat_detector") | bare,
        normalized_type=F.lit(None).cast("string"),
        fields={
            "source_address": ed("properties.ip"),
            "subject_user": ed("properties.principalEmail"),
            "object": ed("detectionCategory.ruleName"),
        },
        extras={
            "rule_name": ed("detectionCategory.ruleName"),
            "sub_rule_name": ed("detectionCategory.subRuleName"),
            "technique": ed("detectionCategory.technique"),
            "indicator": ed("detectionCategory.indicator"),
            "detection_priority": ed("detectionPriority"),
            "severity": F.col("j.severity"),
            "project_id": ed("properties.project_id"),
            "location": ed("properties.location"),
            "project_number": p["sourceId"]["projectNumber"],
        },
        event_ts=F.to_timestamp(ed("eventTime")),
    )


def gcpvpcflow_spec() -> PayloadSpec:
    """GCP VPC flow log (`parser/GcpVpcFlow.java`): LogEntry with
    logName ending vpc_flows; connection 5-tuple + byte counts."""
    p = F.col("j.jsonPayload")
    c = p["connection"]
    return PayloadSpec(
        name="gcpvpcflow",
        matcher=F.coalesce(F.col("j.logName"), F.lit("")).rlike("vpc_flows$"),
        normalized_type=F.lit(None).cast("string"),
        fields={"source_address": c["src_ip"]},
        extras={
            "src_ip": c["src_ip"],
            "src_port": c["src_port"],
            "dest_ip": c["dest_ip"],
            "dest_port": c["dest_port"],
            "protocol": c["protocol"],
            "bytes_sent": p["bytes_sent"],
            "vm_name": p["src_instance"]["vm_name"],
        },
    )


def taskcluster_spec() -> PayloadSpec:
    """Taskcluster API mozlog (`parser/Taskcluster.java`): logger
    taskcluster.*; subject resolved from the clientId namespace
    (Taskcluster.java:64-125: email/<addr>,
    mozilla-auth0/ad|Mozilla-LDAP|<user>/..., mozilla-ldap/<email>)."""
    f = F.col("moz_fields")
    cid = f["clientId"]
    parts = F.split(cid, "/")
    p0 = parts.getItem(0)
    p1 = parts.getItem(1)
    email_rx = r"^[^@]+@[^@]+$"
    auth0 = F.split(p1, r"\|")
    subject = (
        F.when((p0 == "email") & p1.rlike(email_rx), p1)
        .when(
            (p0 == "mozilla-auth0")
            & (F.size(auth0) == 3)
            & (auth0.getItem(0) == "ad")
            & (auth0.getItem(1) == "Mozilla-LDAP"),
            auth0.getItem(2),
        )
        .when((p0 == "mozilla-ldap") & p1.rlike(email_rx), p1)
    )
    return PayloadSpec(
        name="taskcluster",
        matcher=F.coalesce(F.col("moz_logger"), F.lit("")).startswith("taskcluster.")
        & f["clientId"].isNotNull(),
        normalized_type=F.lit(NORMALIZED_AUTH_SESSION),
        fields={
            "source_address": f["sourceIp"],
            "subject_user": subject,
            "request_method": f["method"],
            "request_path": f["resource"],
            "request_status": f["statusCode"].cast("int"),
        },
        extras={"client_id": cid, "api_name": f["name"]},
    )


_AMO_LOGIN_RX = r"^User \((\d+): ([^)]+)\) logged in successfully"
_AMO_NEWVER_RX = r"^New version: <Version: ([^>]+)> \((\d+)\) from <FileUpload: [^>]+>"
_AMO_FXALOGIN_RX = r"^Logging in FxA user ((.+)@(.+))$"
_AMO_FILEUP_RX = r"^FileUpload created: \S+$"
_AMO_RESTRICT_RX = r"^Restricting request from (email|ip) (\S+) \(reputation=.*"
_AMO_UPMNT_RX = r"^UPLOAD: '([^']+)' \((\d+) bytes\).*"


def amodocker_spec() -> PayloadSpec:
    """AMO docker mozlog (`parser/AmoDocker.java`): logger
    http_app_addons*; the msg line discriminates LOGIN / NEWVERSION /
    FXALOGIN / FILEUPLOAD / RESTRICTED / FILEUPLOADMNT
    (AmoDocker.java:238-292); remoteAddressChain is a single address
    here, used directly as the source."""
    f = F.col("moz_fields")
    msg = f["msg"]
    # sequential pattern checks, first match wins (AmoDocker.java:238-292);
    # RESTRICTED's regex already limits the subject kind to email|ip
    amo_type = (
        F.when(msg.rlike(_AMO_LOGIN_RX), "login")
        .when(msg.rlike(_AMO_NEWVER_RX), "newversion")
        .when(msg.rlike(_AMO_FXALOGIN_RX), "fxalogin")
        .when(msg.rlike(_AMO_FILEUP_RX), "fileupload")
        .when(msg.rlike(_AMO_RESTRICT_RX), "restricted")
        .when(msg.rlike(_AMO_UPMNT_RX), "fileuploadmnt")
    )
    restrict_kind = F.regexp_extract(msg, _AMO_RESTRICT_RX, 1)
    restricted_value = F.when(
        restrict_kind == "email", F.regexp_extract(msg, _AMO_RESTRICT_RX, 2)
    ).when(restrict_kind == "ip", f["remoteAddressChain"])
    return PayloadSpec(
        name="amodocker",
        matcher=F.coalesce(F.col("moz_logger"), F.lit("")).startswith("http_app_addons")
        & msg.isNotNull()
        & f["remoteAddressChain"].isNotNull()
        & (f["remoteAddressChain"] != "")
        & f["uid"].isNotNull(),
        normalized_type=F.lit(None).cast("string"),
        fields={
            "source_address": f["remoteAddressChain"],
            # LOGIN overrides uid from the msg (AmoDocker.java:242)
            "subject_user": F.coalesce(
                F.when(msg.rlike(_AMO_LOGIN_RX),
                       F.regexp_extract(msg, _AMO_LOGIN_RX, 2)),
                F.when(f["uid"] != "anonymous", f["uid"]),
            ),
        },
        extras={
            "amo_event_type": amo_type,
            "uid": F.when(
                msg.rlike(_AMO_LOGIN_RX), F.regexp_extract(msg, _AMO_LOGIN_RX, 2)
            ).otherwise(f["uid"]),
            "email": F.coalesce(
                f["email"],
                F.when(msg.rlike(_AMO_FXALOGIN_RX),
                       F.regexp_extract(msg, _AMO_FXALOGIN_RX, 1)),
            ),
            "guid": f["guid"],
            "addon_version": F.when(
                msg.rlike(_AMO_NEWVER_RX), F.regexp_extract(msg, _AMO_NEWVER_RX, 1)
            ),
            "addon_id": F.when(
                msg.rlike(_AMO_NEWVER_RX), F.regexp_extract(msg, _AMO_NEWVER_RX, 2)
            ),
            "file_name": F.when(
                msg.rlike(_AMO_UPMNT_RX), F.regexp_extract(msg, _AMO_UPMNT_RX, 1)
            ),
            "bytes": F.when(
                msg.rlike(_AMO_UPMNT_RX), F.regexp_extract(msg, _AMO_UPMNT_RX, 2)
            ),
            "restricted_value": restricted_value,
            "upload_hash": f["upload_hash"],
            "from_api": f["from_api"],
        },
    )


_BMO_LOGIN_RX = r'^successful login of (\S+) from (\S+) using "([^"]+)",.*'
_BMO_BUG_RX = r"^(\S+) <\S+> created bug (\d+)$"


def bmoaudit_spec() -> PayloadSpec:
    """Bugzilla audit mozlog (`parser/BmoAudit.java`): Type == audit
    with msg/remote_ip/request_id; LOGIN lines normalize to AUTH,
    bug-creation lines to AUTH_SESSION."""
    f = F.col("moz_fields")
    msg = f["msg"]
    is_login = msg.rlike(_BMO_LOGIN_RX)
    is_bug = msg.rlike(_BMO_BUG_RX)
    return PayloadSpec(
        name="bmoaudit",
        matcher=(F.coalesce(F.col("moz_type"), F.lit("")) == "audit")
        & msg.isNotNull()
        & f["remote_ip"].isNotNull()
        & f["request_id"].isNotNull(),
        normalized_type=F.when(is_login, F.lit(NORMALIZED_AUTH)).when(
            is_bug, F.lit(NORMALIZED_AUTH_SESSION)
        ),
        fields={
            "source_address": f["remote_ip"],
            "subject_user": F.when(is_login, F.regexp_extract(msg, _BMO_LOGIN_RX, 1))
            .when(is_bug, F.regexp_extract(msg, _BMO_BUG_RX, 1)),
            "user_agent": F.when(is_login, F.regexp_extract(msg, _BMO_LOGIN_RX, 3)),
            "object": F.when(is_bug, F.regexp_extract(msg, _BMO_BUG_RX, 2)),
        },
        extras={
            "request_id": f["request_id"],
            "audit_type": F.when(is_login, "login").when(is_bug, "createbug").otherwise(
                "other"
            ),
        },
    )


def iprepdlog_spec() -> PayloadSpec:
    """iprepd violation-application mozlog (`parser/IPrepdLog.java`):
    logger iprepd carrying violation/reputation fields."""
    f = F.col("moz_fields")
    return PayloadSpec(
        name="iprepdlog",
        matcher=(F.coalesce(F.col("moz_logger"), F.lit("")) == "iprepd")
        & f["msg"].isNotNull()
        & f["violation"].isNotNull()
        & f["decay_after"].isNotNull()
        & f["original_reputation"].isNotNull()
        & f["reputation"].isNotNull()
        & f["type"].isNotNull()
        & f["exception"].isNotNull(),
        normalized_type=F.lit(None).cast("string"),
        fields={"object": f["object"]},
        extras={
            "violation": f["violation"],
            "object_type": f["type"],
            "reputation": f["reputation"],
            "original_reputation": f["original_reputation"],
            "decay_after": f["decay_after"],
            "exception": f["exception"],
        },
    )


_PHAB_RX = (
    r"^\[([^\]]+)\]\t(\d+)\t(\S+)\t(\S+)\t(\S+)\t(\S+)\t(\S+)\t(\S+)\t(\S+)"
    r"\t(\d+)\t(\d+)$"
)


def _phab_val(g: Column) -> Column:
    """'-' means unset in the phabricator audit line."""
    return F.when(g != "-", g)


def phabricator_spec() -> PayloadSpec:
    """Phabricator audit text line (`parser/Phabricator.java`):
    tab-separated [ts] pid host ip user controller function path
    referer status duration; normalized AUTH_SESSION with constant
    object 'phabricator'."""
    p = F.col("payload_text")
    g = lambda i: F.regexp_extract(p, _PHAB_RX, i)  # noqa: E731
    return PayloadSpec(
        name="phabricator_audit",
        matcher=p.rlike(_PHAB_RX),
        normalized_type=F.lit(NORMALIZED_AUTH_SESSION),
        fields={
            "source_address": g(4),
            "subject_user": _phab_val(g(5)),
            "object": F.lit("phabricator"),
            "request_path": _phab_val(g(8)),
            "request_status": g(10).cast("int"),
        },
        extras={
            "controller": _phab_val(g(6)),
            "function": _phab_val(g(7)),
            "referer": _phab_val(g(9)),
            "duration": g(11),
            "hostname": g(3),
        },
        # Spark >= 3 refuses day-of-week ('EEE') in parse patterns;
        # the day name is redundant, so strip it before to_timestamp
        event_ts=F.to_timestamp(
            F.regexp_replace(g(1), r"^\w+, ", ""), "dd MMM yyyy HH:mm:ss Z"
        ),
    )


def cfgtick_spec() -> PayloadSpec:
    """Configuration-tick heartbeat (`parser/CfgTick.java`,
    `metrics/CfgTickGenerator.java`): any JSON object carrying a
    configuration_tick field; the full config map stays in `raw`."""
    return PayloadSpec(
        name="cfgtick",
        matcher=F.col("j.configuration_tick").isNotNull(),
        normalized_type=F.lit(None).cast("string"),
        fields={},
        extras={"configuration_tick": F.col("j.configuration_tick")},
    )


def default_chain(
    xff_trusted_cidrs: list[str] | None = None,
    use_xff_as_remote: bool = False,
    use_proxy_xff: bool = False,
) -> list[PayloadSpec]:
    """Fixed probe order, mirroring Parser.java:597-619 (most-specific
    first, raw fallback implicit)."""
    return [
        glb_spec(),
        nginx_spec(xff_trusted_cidrs, use_xff_as_remote, use_proxy_xff),
        fxaauth_spec(xff_trusted_cidrs),
        fxacontent_spec(xff_trusted_cidrs),
        cloudtrail_spec(),
        gcpaudit_spec(),
        gcpvpcflow_spec(),
        apache_combined_spec(xff_trusted_cidrs),
        bmoaudit_spec(),
        iprepdlog_spec(),
        taskcluster_spec(),
        amodocker_spec(),
        openssh_spec(),
        duopull_spec(),
        alert_spec(),
        guardduty_spec(),
        etdbeta_spec(),
        cfgtick_spec(),
        privaterelay_spec(),
        auth0_spec(),
        phabricator_spec(),
    ]
