"""Parser golden tests over synthesized fixture lines (shapes from
FIXTURES.md / the reference's testdata corpus; timestamps epoch-pinned
like the reference so window math is deterministic)."""

import json

from pyspark.sql import Row

from foxsec_pipeline_spark.parser.parse import ParserCfg, parse_events

GLB_LINE = json.dumps(
    {
        "insertId": "x1",
        "timestamp": "1970-01-01T00:00:30.000Z",
        "resource": {"type": "http_load_balancer", "labels": {"project_id": "test-proj"}},
        "jsonPayload": {
            "@type": "type.googleapis.com/google.cloud.loadbalancing.type.LoadBalancerLogEntry",
            "statusDetails": "response_sent_by_backend",
        },
        "httpRequest": {
            "remoteIp": "192.168.1.1",
            "requestMethod": "GET",
            "requestUrl": "https://send.firefox.com/download/abc?x=1",
            "status": 200,
            "userAgent": "Mozilla/5.0",
        },
    }
)

NGINX_LINE = json.dumps(
    {
        "timestamp": "1970-01-01T00:00:59.000Z",
        "resource": {"labels": {"project_id": "nginx-proj"}},
        "jsonPayload": {
            "remote_ip": "10.1.2.3",
            "request": "POST /login HTTP/1.1",
            "code": "401",
            "agent": "curl/7.64",
            "host": "example.org",
        },
    }
)

FXA_LINE = json.dumps(
    {
        "Timestamp": 60_000_000_000,
        "Type": "request.summary",
        "Logger": "fxa-auth-server",
        "Fields": {
            "email": "user@example.com",
            "method": "POST",
            "path": "/v1/account/login",
            "status": 200,
            "remoteAddressChain": '["203.0.113.5","10.0.0.1"]',
            "agent": "Firefox",
        },
    }
)

SSH_LINE = json.dumps(
    {
        "timestamp": "1970-01-01T00:02:00.000Z",
        "resource": {"labels": {"project_id": "ssh-proj"}},
        "textPayload": "Jan  1 00:02:00 host sshd[1234]: Accepted publickey for riker from 216.160.83.56 port 4242 ssh2",
    }
)

CLOUDTRAIL_LINE = json.dumps(
    {
        "eventVersion": "1.05",
        "eventTime": "1970-01-01T00:03:00Z",
        "eventName": "ConsoleLogin",
        # isAuthEvent (Cloudtrail.java:175-208) needs the console
        # sign-in eventType AND the Success responseElements value
        "eventType": "AwsConsoleSignIn",
        "responseElements": {"ConsoleLogin": "Success"},
        "recipientAccountId": "123456789012",
        "sourceIPAddress": "127.0.0.1",
        "userAgent": "aws-cli",
        "userIdentity": {"type": "IAMUser", "userName": "riker"},
    }
)

CLOUDWATCH_BATCH = json.dumps(
    {
        "owner": "123456789012",
        "logGroup": "g",
        "logEvents": [{"message": CLOUDTRAIL_LINE}, {"message": CLOUDTRAIL_LINE}],
    }
)

ALERT_LINE = json.dumps(
    {
        "severity": "warn",
        "category": "httprequest",
        "summary": "threshold exceeded",
        "timestamp": "1970-01-01T00:04:00.000Z",
        "metadata": {"sourceaddress": "10.0.0.1", "username": "riker"},
    }
)


def _parse(spark, lines, **cfg):
    df = spark.createDataFrame([Row(value=ln) for ln in lines])
    return parse_events(df, ParserCfg(**cfg), now="1970-01-01 00:05:00")


def test_glb(spark):
    r = _parse(spark, [GLB_LINE]).collect()[0]
    assert r.payload_type == "glb"
    assert r.normalized_type == "http_request"
    assert r.source_address == "192.168.1.1"
    assert r.request_method == "GET"
    assert r.request_path == "/download/abc"
    assert r.request_host == "send.firefox.com"
    assert r.request_status == 200
    assert r.project_id == "test-proj"
    assert str(r.timestamp) == "1970-01-01 00:00:30"


def test_nginx(spark):
    r = _parse(spark, [NGINX_LINE]).collect()[0]
    assert r.payload_type == "nginx"
    assert (r.source_address, r.request_method, r.request_path) == (
        "10.1.2.3", "POST", "/login",
    )
    assert r.request_status == 401 and r.user_agent == "curl/7.64"


def test_fxaauth_mozlog(spark):
    # with trusted-proxy CIDRs the selector walks right-to-left and
    # returns the first untrusted entry (FxaAuth.java:441-452 +
    # Parser.applyXffAddressSelector)
    r = _parse(spark, [FXA_LINE], xff_trusted_cidrs=["10.0.0.0/8"]).collect()[0]
    assert r.payload_type == "fxaauth"
    assert r.normalized_type == "auth"
    assert r.subject_user == "user@example.com"
    assert r.source_address == "203.0.113.5"
    assert str(r.timestamp) == "1970-01-01 00:01:00"  # mozlog ns ts
    # no trusted config + multiple entries -> LAST entry (reference
    # default, Parser.java:181-184)
    r2 = _parse(spark, [FXA_LINE]).collect()[0]
    assert r2.source_address == "10.0.0.1"


def test_openssh(spark):
    r = _parse(spark, [SSH_LINE]).collect()[0]
    assert r.payload_type == "openssh"
    assert r.normalized_type == "auth"
    # reference mapping (OpenSSH.java:58-65, ParserTest.java:162-186):
    # normalized object is the HOSTNAME; the auth method is a payload
    # field, not a normalized column
    assert (r.subject_user, r.source_address, r.object) == (
        "riker", "216.160.83.56", "host",
    )
    assert r.fields["auth_method"] == "publickey"
    # event ts = syslog prefix re-yeared to the envelope year
    assert str(r.timestamp) == "1970-01-01 00:02:00"


def test_cloudtrail_and_cloudwatch_explode(spark):
    rows = _parse(spark, [CLOUDWATCH_BATCH, CLOUDTRAIL_LINE]).collect()
    assert len(rows) == 3  # 2 exploded + 1 direct
    for r in rows:
        assert r.payload_type == "cloudtrail"
        assert r.subject_user == "riker"
        assert r.normalized_type == "auth"
        assert str(r.timestamp) == "1970-01-01 00:03:00"


def test_alert_payload(spark):
    r = _parse(spark, [ALERT_LINE]).collect()[0]
    assert r.payload_type == "alert"
    assert r.source_address == "10.0.0.1"
    assert r.object == "httprequest"


def test_raw_fallback_and_fast_matcher(spark):
    rows = _parse(spark, ["plain text line", GLB_LINE]).collect()
    assert {r.payload_type for r in rows} == {"raw", "glb"}
    only = _parse(spark, ["plain text line", GLB_LINE], fast_matcher="LoadBalancer")
    assert only.count() == 1


def test_max_age_drop(spark):
    # now=00:05:00; GLB event at 00:00:30 dropped with 60s skew window
    kept = _parse(spark, [GLB_LINE], max_timestamp_skew_seconds=60).count()
    assert kept == 0
    kept2 = _parse(spark, [GLB_LINE], max_timestamp_skew_seconds=3600).count()
    assert kept2 == 1


def test_probe_order_first_match_wins(spark):
    # a line that superficially has nginx fields inside a GLB entry
    # must match glb first (fixed chain order, Parser.java:597-619)
    line = json.loads(GLB_LINE)
    line["jsonPayload"]["remote_ip"] = "9.9.9.9"
    line["jsonPayload"]["request"] = "GET /x HTTP/1.1"
    r = _parse(spark, [json.dumps(line)]).collect()[0]
    assert r.payload_type == "glb"
    assert r.source_address == "192.168.1.1"


GCPAUDIT_LINE = json.dumps(
    {
        "timestamp": "1970-01-01T00:06:00.000Z",
        "resource": {"labels": {"project_id": "audit-proj"}},
        "protoPayload": {
            "methodName": "storage.objects.get",
            "resourceName": "projects/_/buckets/b/objects/o",
            "authenticationInfo": {"principalEmail": "riker@example.com"},
            "requestMetadata": {"callerIp": "198.51.100.7"},
            "authorizationInfo": [
                {"resource": "projects/_/buckets/b/objects/o"}
            ],
        },
    }
)

APACHE_LINE = (
    '203.0.113.9 - frank [01/Jan/1970:00:07:00 +0000] '
    '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
    '"http://ref.example.com/" "Mozilla/4.08 [en]"'
)


def test_gcpaudit(spark):
    r = _parse(spark, [GCPAUDIT_LINE]).collect()[0]
    assert r.payload_type == "gcpaudit"
    # AUTH_SESSION per GcpAudit.java:204 (on-going authenticated
    # session, not a fresh login); object from authorizationInfo
    assert r.normalized_type == "auth_session"
    assert r.subject_user == "riker@example.com"
    assert r.source_address == "198.51.100.7"
    assert r.object == "projects/_/buckets/b/objects/o"
    assert r.project_id == "audit-proj"


def test_apache_combined(spark):
    r = _parse(spark, [APACHE_LINE]).collect()[0]
    assert r.payload_type == "apache_combined"
    assert r.normalized_type == "http_request"
    assert r.source_address == "203.0.113.9"
    assert r.subject_user == "frank"
    assert (r.request_method, r.request_path) == ("GET", "/apache_pb.gif")
    assert r.request_status == 200
    assert r.user_agent == "Mozilla/4.08 [en]"
    assert str(r.timestamp) == "1970-01-01 00:07:00"


AUTH0_LINE = json.dumps(
    {
        "_id": "evt123",
        "date": "1970-01-01T00:08:00.000Z",
        "type": "s",
        "client_id": "c1",
        "client_name": "webapp",
        "ip": "203.0.113.44",
        "user_id": "auth0|u99",
    }
)

DUOPULL_LINE = json.dumps(
    {
        "msg": "duopull event",
        "event_action": "admin_login",
        "event_username": "admin1",
        "event_description_ip_address": "198.51.100.3",
        "event_timestamp": 540,
        "event_object": None,
        "path": "/admin/v1/logs/administrator",
    }
)


def test_auth0(spark):
    r = _parse(spark, [AUTH0_LINE]).collect()[0]
    assert r.payload_type == "auth0"
    assert r.normalized_type == "auth"  # type 's' = success login
    assert r.source_address == "203.0.113.44"
    assert r.subject_user == "auth0|u99"
    assert r.object == "webapp"
    assert str(r.timestamp) == "1970-01-01 00:08:00"
    # non-auth type code -> no normalized type
    line2 = json.loads(AUTH0_LINE); line2["type"] = "sapi"
    r2 = _parse(spark, [json.dumps(line2)]).collect()[0]
    assert r2.payload_type == "auth0" and r2.normalized_type is None


def test_duopull(spark):
    r = _parse(spark, [DUOPULL_LINE]).collect()[0]
    assert r.payload_type == "duopull"
    assert r.normalized_type == "auth"
    assert r.subject_user == "admin1"
    assert r.source_address == "198.51.100.3"
    assert r.object == "admin_login"
    assert str(r.timestamp) == "1970-01-01 00:09:00"  # epoch-seconds ts


def test_parse_metrics_observation(spark):
    """Beam-metrics parity: one parse pass also yields counters
    (n_parsed / n_raw_fallback / n_age_dropped) via the Observation
    API — mirroring the DoFn counters the reference's tests assert."""
    import json

    from foxsec_pipeline_spark.parser.parse import ParserCfg, parse_events_observed

    glb = json.dumps(
        {
            "timestamp": "1970-01-01T00:00:30.000Z",
            "resource": {"labels": {"project_id": "p"}},
            "jsonPayload": {"@type": "type.googleapis.com/google.cloud"
                            ".loadbalancing.type.LoadBalancerLogEntry"},
            "httpRequest": {
                "remoteIp": "10.0.0.1", "requestMethod": "GET",
                "requestUrl": "https://h/x", "status": 200, "userAgent": "ua",
            },
        }
    )
    old = json.dumps(
        {
            "timestamp": "1969-12-25T00:00:00.000Z",
            "resource": {"labels": {"project_id": "p"}},
            "jsonPayload": {"@type": "type.googleapis.com/google.cloud"
                            ".loadbalancing.type.LoadBalancerLogEntry"},
            "httpRequest": {
                "remoteIp": "10.0.0.2", "requestMethod": "GET",
                "requestUrl": "https://h/y", "status": 200, "userAgent": "ua",
            },
        }
    )
    df = spark.createDataFrame(
        [(glb,), (old,), ("complete junk line",)], "value string"
    )
    events, obs = parse_events_observed(
        df, ParserCfg(max_timestamp_skew_seconds=3600), now="1970-01-01 00:01:00"
    )
    kept = events.collect()
    m = obs.get
    assert m["n_parsed"] == 3
    assert m["n_raw_fallback"] == 1   # the junk line
    assert m["n_age_dropped"] == 1    # the 1969 event
    assert m["n_emitted"] == 2        # reconciles: n_parsed - n_age_dropped
    assert len(kept) == m["n_emitted"]  # junk kept as raw, old row dropped
