"""Golden-text tests for the alert template renderer
(alert/templates.py — TemplateManager.java / AlertSlack.java /
AlertMailer.java analog; template semantics from
src/main/resources/alert/templates/*.ftlh).
"""

from __future__ import annotations

from pyspark.sql import Row

from foxsec_pipeline_spark.alert.templates import (
    AUTHPROFILE_SLACK,
    EMAIL_BODY,
    render_amo_slack_catchall,
    render_template,
)


def _alert(spark, **over):
    base = dict(
        alert_id="id-1",
        timestamp="2024-01-01 00:00:00",
        category="authprofile",
        subcategory=None,
        severity="warn",
        summary="test summary",
        notify_merge=None,
        metadata={},
    )
    base.update(over)
    return spark.createDataFrame(
        [Row(**base)],
        "alert_id string, timestamp string, category string, "
        "subcategory string, severity string, summary string, "
        "notify_merge string, metadata map<string,string>",
    )


def test_authprofile_slack_auth_with_geo(spark):
    a = _alert(
        spark,
        metadata={
            "auth_alert_type": "auth",
            "username": "riker",
            "object": "bastion",
            "sourceaddress": "216.160.83.56",
            "event_timestamp": "1970-01-01T00:00:00Z",
            "state_action_type": "unknown_ip_outside_geo",
        },
    )
    body = render_template(a, AUTHPROFILE_SLACK).collect()[0].body
    assert body == (
        "An authentication event for user riker was detected to access "
        "bastion from 216.160.83.56."
        " This event occurred at 1970-01-01T00:00:00Z."
        " The source address was new, and does not appear to be near any "
        "previously known location."
        " alert id: id-1"
    )


def test_authprofile_slack_session_minimal(spark):
    # missing optional keys skip their sections (<#if key??> analog)
    a = _alert(
        spark,
        metadata={
            "auth_alert_type": "auth_session",
            "username": "worf",
            "object": "console",
            "sourceaddress": "10.0.0.1",
        },
    )
    body = render_template(a, AUTHPROFILE_SLACK).collect()[0].body
    assert body == (
        "A sensitive event within console was performed by user worf from "
        "10.0.0.1. alert id: id-1"
    )


def test_amo_slack_catchall_branches(spark):
    cloud = _alert(
        spark,
        subcategory="amo_cloud_submission",
        metadata={
            "monitored_resource": "amo",
            "sourceaddress": "10.1.2.3",
            "addon_guid": "guid-9",
            "addon_from_api": "true",
            "addon_user_id": "42",
        },
    )
    got = render_amo_slack_catchall(cloud).collect()[0].body
    assert got == (
        "amo cloud provider addon submission from 10.1.2.3, guid guid-9 "
        "isapi true user_id 42 (id-1)"
    )
    other = _alert(spark, subcategory="amo_restriction")
    got2 = render_amo_slack_catchall(other).collect()[0].body
    assert got2 == "test summary (id-1)"


def test_email_body(spark):
    a = _alert(spark, severity="critical")
    body = render_template(a, EMAIL_BODY).collect()[0].body
    assert body == (
        "test summary\n\nalert id: id-1\ncategory: authprofile\n"
        "severity: critical\n"
    )
