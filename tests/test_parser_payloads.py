"""Parser goldens for the round-2 payload families, mirroring the
reference's per-family ParserTest cases (`parser/ParserTest.java`:
testParseBmoAuditStackdriver :403, testParseTaskcluster :940,
testPhabricatorAudit :2789, testPrivateRelayNotification, plus the
gatekeeper/customs fixture shapes under src/test/resources/testdata).
Fixture lines are synthesized to the same structure, not copied.
"""

from __future__ import annotations

import json

from pyspark.sql import Row

from foxsec_pipeline_spark.parser.parse import ParserCfg, parse_events

FXACONTENT_LINE = json.dumps(
    {
        "insertId": "abc1",
        "jsonPayload": {
            "EnvVersion": "2.0",
            "Fields": {
                "clientAddress": "203.0.113.9",
                "contentLength": "739",
                "method": "GET",
                "path": "/metrics/flow",
                "remoteAddressChain": '["203.0.113.9","127.0.0.1"]',
                "status": "200",
                "userAgent": "TestFetch/1.0",
            },
            "Logger": "fxa-content-server",
            "Pid": 1,
            "Timestamp": 64_000_000_000,
            "Type": "server.requests.route",
        },
        "logName": "projects/fxa-test/logs/docker.fxa-content",
        "resource": {"labels": {"project_id": "fxa-test"}, "type": "gce_instance"},
        "timestamp": "2020-09-21T01:00:01.000Z",
    }
)

PRIVATE_RELAY_LINE = json.dumps(
    {
        "insertId": "rel1",
        "jsonPayload": {
            "EnvVersion": "2.0",
            "Fields": {
                "event_key": "https://schemas.accounts.firefox.com/event/profile-change",
                "fxa_uid": "11111111111111111111111111111111",
                "msg": "fxa_rp_event",
                "real_address": "a" * 64,
            },
            "Hostname": "fxprivaterelay",
            "Logger": "fx-private-relay",
            "Timestamp": 0,
            "Type": "events",
        },
        "resource": {"labels": {"project_id": "relay-test"}, "type": "k8s_container"},
        "timestamp": "2020-01-01T00:00:00.000Z",
    }
)

GUARDDUTY_LINE = json.dumps(
    {
        "version": "0",
        "id": "11111111-2222-3333-4444-555555555555",
        "detail-type": "GuardDuty Finding",
        "source": "aws.guardduty",
        "account": "123456789012",
        "time": "2019-06-09T19:15:04Z",
        "region": "us-west-2",
        "resources": [],
        "detail": {
            "schemaVersion": "2.0",
            "accountId": "123456789012",
            "region": "us-west-2",
            "id": "finding0001",
            "arn": "arn:aws:guardduty:us-west-2:123456789012:detector/d1/finding/finding0001",
            "type": "Stealth:IAMUser/LoggingConfigurationModified",
            "title": "Logging configuration was modified",
            "description": "APIs used to modify logging were invoked",
            "severity": "5",
            "resource": {
                "resourceType": "AccessKey",
                "accessKeyDetails": {
                    "accessKeyId": "AKTEST",
                    "principalId": "PTEST",
                    "userType": "IAMUser",
                    "userName": "test-user",
                },
            },
            "service": {
                "action": {
                    "actionType": "AWS_API_CALL",
                    "awsApiCallAction": {
                        "api": "StopLogging",
                        "remoteIpDetails": {"ipAddressV4": "198.51.100.7"},
                    },
                }
            },
        },
    }
)

ETD_LINE = json.dumps(
    {
        "insertId": "etd1",
        "jsonPayload": {
            "eventTime": "2019-06-27T18:16:03.650Z",
            "detectionPriority": "HIGH",
            "detectionCategory": {
                "indicator": "audit_log",
                "subRuleName": "external_member_invited_to_policy",
                "technique": "persistence",
                "ruleName": "iam_anomalous_grant",
            },
            "properties": {
                "project_id": "etd-test-project",
                "principalEmail": "orguser@example.com",
                "location": "us-central1",
            },
            "sourceId": {"projectNumber": "123456789012"},
        },
        "resource": {
            "type": "threat_detector",
            "labels": {"project_id": "etd-test-project"},
        },
        "timestamp": "2019-06-27T18:16:03.650Z",
        "severity": "CRITICAL",
        "logName": "projects/etd-test-project/logs/threatdetection.googleapis.com%2Fdetection",
    }
)

VPCFLOW_LINE = json.dumps(
    {
        "insertId": "vpc1",
        "jsonPayload": {
            "connection": {
                "src_ip": "10.0.0.5",
                "src_port": "53456",
                "dest_ip": "203.0.113.44",
                "dest_port": "443",
                "protocol": "6",
            },
            "bytes_sent": "8192",
            "src_instance": {"vm_name": "worker-1"},
        },
        "logName": "projects/vpc-test/logs/compute.googleapis.com%2Fvpc_flows",
        "resource": {"labels": {"project_id": "vpc-test"}, "type": "gce_subnetwork"},
        "timestamp": "2020-03-01T00:00:00.000Z",
    }
)

TASKCLUSTER_LINE = json.dumps(
    {
        "insertId": "tc1",
        "jsonPayload": {
            "EnvVersion": "2.0",
            "Fields": {
                "apiVersion": "v2",
                "clientId": "mozilla-auth0/ad|Mozilla-LDAP|riker/services",
                "method": "POST",
                "name": "claimWork",
                "resource": "/v1/claim-work/test-provisioner/macos-workers",
                "sourceIp": "216.160.83.56",
                "statusCode": "200",
            },
            "Logger": "taskcluster.queue.api",
            "Timestamp": 1558469098790000000,
            "Type": "monitor.apiMethod",
        },
        "logName": "projects/logging/logs/queue",
        "resource": {"labels": {"project_id": "test-logging"}, "type": "gce_instance"},
        "timestamp": "2019-05-21T20:04:58.790308Z",
    }
)


def _amo_line(msg, uid="anonymous", email=None, extra=None):
    fields = {
        "uid": uid,
        "remoteAddressChain": "216.160.83.64",
        "msg": msg,
    }
    if email:
        fields["email"] = email
    fields.update(extra or {})
    return json.dumps(
        {
            "Timestamp": 1900000000000,
            "Type": "z.files",
            "Logger": "http_app_addons",
            "EnvVersion": "2.0",
            "Fields": fields,
        }
    )


BMO_LINE = json.dumps(
    {
        "insertId": "bmo1",
        "jsonPayload": {
            "EnvVersion": "2",
            "Fields": {
                "msg": 'successful login of spock@example.com from 216.160.83.56 using "Mozilla/5.0", authenticated by Bugzilla::Auth::Login::CGI',
                "remote_ip": "216.160.83.56",
                "request_id": "00000000",
            },
            "Logger": "CEREAL",
            "Timestamp": 1.548956727e18,
            "Type": "audit",
        },
        "logName": "projects/prod/logs/docker.bugzilla",
        "resource": {"labels": {"project_id": "prod"}, "type": "aws_ec2_instance"},
        "timestamp": "2019-01-31T17:45:27.478007784Z",
    }
)

IPREPD_LINE = json.dumps(
    {
        "insertId": "ipr1",
        "jsonPayload": {
            "EnvVersion": "2.0",
            "Fields": {
                "msg": "violation applied",
                "violation": "fxa_abuse",
                "decay_after": "2019-07-20T00:00:00Z",
                "original_reputation": "100",
                "reputation": "70",
                "type": "ip",
                "exception": "false",
                "object": "198.51.100.9",
            },
            "Logger": "iprepd",
            "Timestamp": 0,
            "Type": "app.log",
        },
        "resource": {"labels": {"project_id": "iprepd-test"}, "type": "k8s_container"},
        "timestamp": "2019-07-19T15:00:00.000Z",
    }
)

PHAB_LINE = json.dumps(
    {
        "textPayload": "[Mon, 20 Jan 2020 16:12:49 +0000]\t4664\tip.us-west-2.compute.internal\t216.160.83.56\tphab-user\tPhabricatorConduitAPIController\tfeed.query_id\t/api/feed.query_id\t-\t200\t96256",
        "insertId": "ph1",
        "resource": {"labels": {"project_id": "phabricator"}, "type": "aws_ec2_instance"},
        "timestamp": "2020-01-20T16:12:49.479690845Z",
        "logName": "projects/phabricator-prod",
    }
)

CFGTICK_LINE = json.dumps(
    {"configuration_tick": "1", "heuristic_ThresholdAnalysis": "enabled", "identifier": "httprequest"}
)


def _parse(spark, lines, **cfg):
    df = spark.createDataFrame([Row(value=ln) for ln in lines])
    return parse_events(df, ParserCfg(**cfg), now="2021-01-01 00:00:00")


def test_fxacontent(spark):
    r = _parse(spark, [FXACONTENT_LINE]).collect()[0]
    assert r.payload_type == "fxacontent"
    assert r.normalized_type is None
    assert r.source_address == "203.0.113.9"  # clientAddress preferred
    assert r.request_path == "/metrics/flow"
    assert r.request_status == 200
    assert r.user_agent == "TestFetch/1.0"
    assert r.fields["request_type"] == "metrics"


def test_private_relay(spark):
    r = _parse(spark, [PRIVATE_RELAY_LINE]).collect()[0]
    assert r.payload_type == "private_relay"
    assert r.fields["relay_event_type"] == "fxa_rp_event"
    assert r.fields["fxa_uid"] == "1" * 32
    assert r.fields["real_address"] == "a" * 64
    assert r.subject_user == "1" * 32


def test_guardduty(spark):
    r = _parse(spark, [GUARDDUTY_LINE]).collect()[0]
    assert r.payload_type == "guardduty"
    assert r.fields["finding_type"] == "Stealth:IAMUser/LoggingConfigurationModified"
    assert r.fields["account_id"] == "123456789012"
    assert r.fields["severity"] == "5"
    assert r.subject_user == "test-user"
    assert r.source_address == "198.51.100.7"
    assert str(r.timestamp) == "2019-06-09 19:15:04"


def test_etd(spark):
    r = _parse(spark, [ETD_LINE]).collect()[0]
    assert r.payload_type == "etd"
    assert r.fields["rule_name"] == "iam_anomalous_grant"
    assert r.fields["detection_priority"] == "HIGH"
    assert r.fields["severity"] == "CRITICAL"
    assert r.fields["technique"] == "persistence"
    assert r.subject_user == "orguser@example.com"
    assert r.object == "iam_anomalous_grant"


def test_gcpvpcflow(spark):
    r = _parse(spark, [VPCFLOW_LINE]).collect()[0]
    assert r.payload_type == "gcpvpcflow"
    assert r.source_address == "10.0.0.5"
    assert r.fields["dest_ip"] == "203.0.113.44"
    assert r.fields["dest_port"] == "443"
    assert r.fields["bytes_sent"] == "8192"
    assert r.fields["vm_name"] == "worker-1"


def test_taskcluster(spark):
    r = _parse(spark, [TASKCLUSTER_LINE]).collect()[0]
    assert r.payload_type == "taskcluster"
    assert r.normalized_type == "auth_session"
    # clientId namespace resolution (Taskcluster.java:64-125)
    assert r.subject_user == "riker"
    assert r.source_address == "216.160.83.56"
    assert r.request_status == 200
    assert r.request_path == "/v1/claim-work/test-provisioner/macos-workers"


def test_taskcluster_email_and_ldap_clientids(spark):
    lines = []
    for cid in ["email/user@example.com", "mozilla-ldap/other@example.com"]:
        d = json.loads(TASKCLUSTER_LINE)
        d["jsonPayload"]["Fields"]["clientId"] = cid
        lines.append(json.dumps(d))
    rows = _parse(spark, lines).collect()
    assert sorted(r.subject_user for r in rows) == [
        "other@example.com", "user@example.com",
    ]


def test_amodocker_variants(spark):
    lines = [
        _amo_line("User (123: regular-user) logged in successfully"),
        _amo_line(
            "New version: <Version: 1.2.3> (4567) from <FileUpload: x>",
            uid="u1", email="dev@example.com",
        ),
        _amo_line("Logging in FxA user fxa.person@example.com"),
        _amo_line(
            "UPLOAD: 'addon_x.xpi' (1500 bytes) to '/mnt/efs/x.xpi'",
            uid="u2", email="up@example.com",
            extra={"upload_hash": "sha256:abc"},
        ),
        _amo_line("Restricting request from email bad@example.com (reputation=10)"),
    ]
    rows = _parse(spark, lines).collect()
    by_type = {r.fields["amo_event_type"]: r for r in rows}
    assert set(by_type) == {
        "login", "newversion", "fxalogin", "fileuploadmnt", "restricted",
    }
    assert by_type["login"].fields["uid"] == "regular-user"
    assert by_type["newversion"].fields["addon_version"] == "1.2.3"
    assert by_type["newversion"].fields["addon_id"] == "4567"
    assert by_type["fxalogin"].fields["email"] == "fxa.person@example.com"
    assert by_type["fileuploadmnt"].fields["file_name"] == "addon_x.xpi"
    assert by_type["fileuploadmnt"].fields["bytes"] == "1500"
    assert by_type["fileuploadmnt"].fields["upload_hash"] == "sha256:abc"
    assert by_type["restricted"].fields["restricted_value"] == "bad@example.com"
    for r in rows:
        assert r.source_address == "216.160.83.64"


def test_bmoaudit_login(spark):
    r = _parse(spark, [BMO_LINE]).collect()[0]
    assert r.payload_type == "bmoaudit"
    assert r.normalized_type == "auth"
    assert r.subject_user == "spock@example.com"
    assert r.source_address == "216.160.83.56"
    assert r.user_agent == "Mozilla/5.0"
    assert r.fields["audit_type"] == "login"
    assert r.fields["request_id"] == "00000000"


def test_iprepdlog(spark):
    r = _parse(spark, [IPREPD_LINE]).collect()[0]
    assert r.payload_type == "iprepdlog"
    assert r.object == "198.51.100.9"
    assert r.fields["violation"] == "fxa_abuse"
    assert r.fields["object_type"] == "ip"
    assert r.fields["reputation"] == "70"
    assert r.fields["original_reputation"] == "100"


def test_phabricator(spark):
    r = _parse(spark, [PHAB_LINE]).collect()[0]
    assert r.payload_type == "phabricator_audit"
    assert r.normalized_type == "auth_session"
    assert r.subject_user == "phab-user"
    assert r.source_address == "216.160.83.56"
    assert r.object == "phabricator"
    assert r.request_path == "/api/feed.query_id"
    assert r.request_status == 200
    assert r.fields["controller"] == "PhabricatorConduitAPIController"
    assert r.fields.get("referer") is None  # '-' means unset
    assert str(r.timestamp) == "2020-01-20 16:12:49"


def test_cfgtick(spark):
    r = _parse(spark, [CFGTICK_LINE]).collect()[0]
    assert r.payload_type == "cfgtick"
    assert r.fields["configuration_tick"] == "1"


def test_probe_chain_priority_unchanged(spark):
    # a mixed batch lands each line on its own family (first match
    # wins, Parser.java:597-619) and nothing regresses to raw
    lines = [
        FXACONTENT_LINE, PRIVATE_RELAY_LINE, GUARDDUTY_LINE, ETD_LINE,
        VPCFLOW_LINE, TASKCLUSTER_LINE, BMO_LINE, IPREPD_LINE, PHAB_LINE,
        CFGTICK_LINE, _amo_line("FileUpload created: abc123"),
    ]
    rows = _parse(spark, lines).collect()
    types = sorted(r.payload_type for r in rows)
    assert types == sorted(
        ["fxacontent", "private_relay", "guardduty", "etd", "gcpvpcflow",
         "taskcluster", "bmoaudit", "iprepdlog", "phabricator_audit",
         "cfgtick", "amodocker"]
    )
