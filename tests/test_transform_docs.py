"""Transform-doc (DocumentingTransform) golden replays.

Replays the reference's own JUnit expectations for the heuristic
self-documentation strings embedded in configuration ticks:
`TestCustomsVelocity.java`, `TestCustomsAccountCreation.java`,
`TestSourceLoginFailure.java` (every leg, expected strings copied from
the assertions), plus format-derived goldens for the remaining
DocumentingTransform implementers and the buildConfigurationTick
gating (`customs/Customs.java:441-487`,
`httprequest/HTTPRequest.java:656-730`).
"""

from __future__ import annotations

import json

from foxsec_pipeline_spark.alert.transform_docs import (
    addon_cloud_submission_doc,
    addon_matcher_doc,
    addon_multi_ip_login_doc,
    addon_multi_match_doc,
    addon_multi_submit_doc,
    alert_summary_doc,
    auth_state_analyze_doc,
    build_customs_cfgtick,
    build_httprequest_cfgtick,
    crit_object_analyze_doc,
    customs_account_creation_dist_doc,
    customs_account_creation_doc,
    customs_account_enumeration_doc,
    customs_activity_monitor_doc,
    customs_login_failure_at_risk_doc,
    customs_password_reset_abuse_doc,
    customs_status_comparator_doc,
    customs_summary_doc,
    customs_transform_docs,
    customs_velocity_doc,
    endpoint_abuse_doc,
    endpoint_sequence_abuse_doc,
    error_rate_doc,
    etd_transform_doc,
    fxa_account_abuse_alias_doc,
    fxa_account_abuse_new_version_doc,
    guardduty_transform_doc,
    hard_limit_doc,
    httprequest_transform_docs,
    per_endpoint_error_rate_doc,
    pioneer_exfiltration_doc,
    private_relay_forward_doc,
    report_restriction_doc,
    session_limit_doc,
    source_correlator_doc,
    source_login_failure_dist_doc,
    source_login_failure_doc,
    status_code_rate_doc,
    threshold_analysis_doc,
    ua_blocklist_doc,
    watchlist_analyze_doc,
)


class TestCustomsVelocityReplay:
    """TestCustomsVelocity.java — all three legs, expected strings
    copied verbatim from the JUnit assertions."""

    def test_transform_doc(self):
        doc = customs_velocity_doc(
            {"escalateVelocity": True, "minimumDistanceForAlert": 1000.0}
        )
        assert doc == (
            "Alert based on applying location velocity analysis to FxA "
            "events, using a maximum KM/s of 0.22 and minimum distance "
            "of 1000.00KM"
        )

    def test_transform_doc_with_monitor_only(self):
        doc = customs_velocity_doc(
            {
                "escalateVelocity": True,
                "enableVelocityDetectorMonitorOnly": True,
                "minimumDistanceForAlert": 1000.0,
                "minimumDistanceForAlertMonitorOnly": 500.0,
            }
        )
        assert doc == (
            "Alert based on applying location velocity analysis to FxA "
            "events, using a maximum KM/s of 0.22 and minimum distance "
            "of 1000.00KM, monitor only using a maximum KM/s of 0.22 "
            "and minimum distance of 500.00KM"
        )

    def test_transform_doc_for_non_escalated(self):
        doc = customs_velocity_doc(
            {"escalateVelocity": False, "minimumDistanceForAlert": 1000.0}
        )
        assert doc == (
            "Alert based on applying location velocity analysis to FxA "
            "events, using a maximum KM/s of 0.22 and minimum distance "
            "of 1000.00KM (Experimental)"
        )


class TestCustomsAccountCreationReplay:
    """TestCustomsAccountCreation.java — both legs at the default
    threshold (20, `Customs.java:228`)."""

    def test_transform_doc(self):
        doc = customs_account_creation_doc({"escalateAccountCreation": True})
        assert doc == (
            "Alert if single source address creates 20 or more accounts "
            "within 10 minute fixed window."
        )

    def test_transform_doc_for_non_escalated(self):
        doc = customs_account_creation_doc({"escalateAccountCreation": False})
        assert doc == (
            "Alert if single source address creates 20 or more accounts "
            "within 10 minute fixed window. (Experimental)"
        )


class TestSourceLoginFailureReplay:
    """TestSourceLoginFailure.java — both legs at the default threshold
    (30, `Customs.java:271`)."""

    def test_transform_doc(self):
        doc = source_login_failure_doc({"escalateSourceLoginFailure": True})
        assert doc == (
            "Alert on 30 login failures from a single source in a 10 "
            "minute window."
        )

    def test_transform_doc_for_non_escalated(self):
        doc = source_login_failure_doc({"escalateSourceLoginFailure": False})
        assert doc == (
            "Alert on 30 login failures from a single source in a 10 "
            "minute window. (Experimental)"
        )


class TestCustomsDocFormats:
    """Format-derived goldens for the customs detectors without their
    own JUnit doc tests, at the documented option defaults."""

    def test_account_creation_dist(self):
        # threshold 15 (Customs.java:234), ratio 0.35 (:240)
        assert customs_account_creation_dist_doc(
            {"escalateAccountCreationDistributed": True}
        ) == (
            "Alert if at least 15 accounts are created from different "
            "source addresses in a 10 minute fixed window and the "
            "similarity index of the accounts is all below 0.35."
        )

    def test_source_login_failure_dist(self):
        assert source_login_failure_dist_doc(
            {"escalateSourceLoginFailureDistributed": False}
        ) == (
            "Alert on login failures for a particular account from 10 "
            "different source addresses in a 10 minute fixed window."
            " (Experimental)"
        )

    def test_password_reset_abuse(self):
        assert customs_password_reset_abuse_doc(
            {"escalatePasswordResetAbuse": True}
        ) == (
            "Alert if single source requests password reset for at "
            "least 5 distinct accounts within 10 minute fixed window."
        )

    def test_account_enumeration_variance_legs(self):
        # default: content-server variance enabled (Customs.java:421)
        with_var = customs_account_enumeration_doc(
            {"escalateAccountEnumerationDetector": True}
        )
        assert with_var == (
            "Alert if single source address checks 3 or more distinct "
            "emails are FxA accounts within 10 minute fixed window, "
            "using content server variance."
        )
        without = customs_account_enumeration_doc(
            {
                "escalateAccountEnumerationDetector": True,
                "enableContentServerVarianceDetection": False,
            }
        )
        assert without.endswith(", without using content server variance.")

    def test_constant_docs(self):
        assert customs_summary_doc() == (
            "Summarizes various event counts over 15 minute period."
        )
        # isExperimental() hardwired true
        # (CustomsActivityForMonitoredAccounts.java:128-130)
        assert customs_activity_monitor_doc() == (
            "Generate pipeline alerts if a monitored user has FxA "
            "activity (Experimental)"
        )
        # isExperimental() deliberately false, and the reference's own
        # missing space in "forward"+"events" is reproduced
        # (PrivateRelayForward.java:100-103,266-269)
        assert "forwardevents" in private_relay_forward_doc()
        assert not private_relay_forward_doc().endswith("(Experimental)")
        assert customs_status_comparator_doc(
            {"escalateStatusComparator": True}
        ) == ("Generate alerts if status checks occur flagged by comparator "
              "operation.")
        assert customs_login_failure_at_risk_doc().endswith("(Experimental)")


def test_customs_cfgtick_gating():
    """Customs.buildConfigurationTick gating (`Customs.java:441-487`):
    only enabled detector families contribute heuristic_* keys, the
    account-creation family contributes both transforms, and the
    message flattens through CfgTickBuilder (configuration_tick
    stamped)."""
    options = {
        "monitoredResourceIndicator": "customs",
        "enableAccountCreationAbuseDetector": True,
        "enableVelocityDetector": True,
        "minimumDistanceForAlert": 1000.0,
        "escalateVelocity": True,
        "enableSummaryAnalysis": True,
    }
    msg = json.loads(build_customs_cfgtick(options))
    assert msg["configuration_tick"] == "true"
    assert "heuristic_CustomsAccountCreation" in msg
    assert "heuristic_CustomsAccountCreationDist" in msg
    assert msg["heuristic_CustomsSummary"] == (
        "Summarizes various event counts over 15 minute period."
    )
    assert "minimum distance of 1000.00KM" in msg["heuristic_CustomsVelocity"]
    # disabled families contribute nothing
    for absent in (
        "heuristic_SourceLoginFailure",
        "heuristic_CustomsPasswordResetAbuse",
        "heuristic_PrivateRelayForward",
        "heuristic_CustomsAccountEnumeration",
    ):
        assert absent not in msg
    # registration order is the reference's (dict preserves insertion)
    docs = customs_transform_docs(options)
    assert list(docs) == [
        "heuristic_CustomsAccountCreation",
        "heuristic_CustomsAccountCreationDist",
        "heuristic_CustomsVelocity",
        "heuristic_CustomsSummary",
    ]


class TestHTTPRequestDocs:
    """httprequest heuristic docs at HTTPRequestToggles defaults
    (`HTTPRequestToggles.java:1075-1104`)."""

    def test_scalar_heuristics(self):
        assert threshold_analysis_doc() == (
            "Alert if a single source address makes more than 75.00 "
            "times the calculated mean request rate for all clients "
            "within a 1 minute window."
        )
        assert hard_limit_doc() == (
            "Alert if single source address makes more than 100 "
            "requests in a 1 minute window."
        )
        assert error_rate_doc() == (
            "Alert if a single source address generates more than 30 "
            "4xx errors in a 1 minute window."
        )
        assert status_code_rate_doc() == (
            "Alert if a single source address generates more than 30 0 "
            "status responses in a 1 minute window."
        )
        assert ua_blocklist_doc() == (
            "Alert if client makes request with user agent that matches "
            "entry in blocklist."
        )
        assert source_correlator_doc() == (
            "Source address alerting correlation, ISP analysis on "
            "minimum 250 addresses at 90.00 alerting percentage."
        )

    def test_endpoint_families_multi_entry_join(self):
        # TestEndpointAbuse1-style config: 8:GET:/test
        doc = endpoint_abuse_doc(
            [(8, "GET", "/test"), (3, "POST", "/login")],
            {"sessionGapDurationMinutes": 45},
        )
        assert doc == (
            "Clients are sessionized by address, where a session ends "
            "after 45 minutes of inactivity. An alert is generated if a "
            "client is observed making repeated requests to configured "
            "endpoints without requesting other forms of content from "
            "the site. 8 GET requests for /test. 3 POST requests for "
            "/login."
        )
        seq = endpoint_sequence_abuse_doc(
            [(2, 500, "GET", "/a", "POST", "/b")]
        )
        assert seq == (
            "An alert is generated when a client (identified by ip) "
            "makes requests for a sequence of endpoints within a "
            "configurable delta thought to be atypical of a normal "
            "user. 2 POST /b requests within 500 ms of last GET /a "
            "request."
        )
        per = per_endpoint_error_rate_doc([(10, "GET", "/x")])
        assert per.endswith(
            "that result in higher amount of errors. 10 errors to "
            "endpoints matching GET /x."
        )
        lim = session_limit_doc([(50, 25, "GET", "/api")])
        assert lim.endswith(
            "making repeated requests to configured endpoints. 50 GET "
            "requests for /api. (monitor only: 25)"
        )

    def test_httprequest_cfgtick_gating(self):
        toggles = {
            "enableThresholdAnalysis": True,
            "enableHardLimitAnalysis": True,
            "enableEndpointAbuseAnalysis": True,
            "endpointAbusePath": [(8, "GET", "/test")],
        }
        msg = json.loads(
            build_httprequest_cfgtick({"monitoredResourceIndicator": "web"}, toggles)
        )
        assert msg["configuration_tick"] == "true"
        assert "75.00 times" in msg["heuristic_ThresholdAnalysis"]
        assert "100 requests" in msg["heuristic_HardLimitAnalysis"]
        assert "8 GET requests for /test." in msg["heuristic_EndpointAbuseAnalysis"]
        assert "heuristic_ErrorRateAnalysis" not in msg
        docs = httprequest_transform_docs(toggles)
        assert list(docs) == [
            "heuristic_ThresholdAnalysis",
            "heuristic_HardLimitAnalysis",
            "heuristic_EndpointAbuseAnalysis",
        ]


def test_other_pipeline_docs():
    """Constant and parameterized docs of the remaining
    DocumentingTransform implementers."""
    assert addon_cloud_submission_doc() == (
        "Alert on add-on submissions from cloud providers."
    )
    assert addon_matcher_doc([".*payload.*:1000:5000"]) == (
        "Match abusive addon uploads using these patterns "
        "[.*payload.*:1000:5000] and generate alerts"
    )
    assert addon_matcher_doc(None).startswith(
        "Match abusive addon uploads using these patterns null"
    )
    assert addon_multi_ip_login_doc(2, 5, ["^labuser.*"]) == (
        "Detect multiple account logins for the same account from "
        "different source addresses associated with different country "
        "codes. Alert on 2 different countries and 5 different IPs. "
        "Regex for account exceptions: [^labuser.*]"
    )
    assert addon_multi_match_doc(10).endswith(
        "Alert on 10 submissions of the same file name."
    )
    assert addon_multi_submit_doc(10).endswith(
        "Alert on 10 submissions of the same rounded interval."
    )
    assert fxa_account_abuse_alias_doc(5) == (
        "Alerts on aliased FxA accounts usage. A max of 5 are allowed "
        "for one account in a given session."
    )
    assert fxa_account_abuse_new_version_doc(["^block.*"]).endswith(
        "blocked accounts regex: [^block.*]"
    )
    assert report_restriction_doc() == "Reports on request restrictions from AMO"
    assert auth_state_analyze_doc() == (
        "Alert if an identity (can be thought of as a user) "
        "authenticates from a new IP"
    )
    assert crit_object_analyze_doc("sec@example.test", ["^/etc/.*"]) == (
        "Alert via sec@example.test immediately on auth events to "
        "specified objects: [^/etc/.*]"
    )
    assert etd_transform_doc().startswith("Alerts are generated based on")
    assert guardduty_transform_doc().endswith("from AWS's Guardduty.")
    assert pioneer_exfiltration_doc(500000) == (
        "Alert if 500000 bytes of data are transferred from an SSH "
        "instance over IAP in 30 minutes"
    )
    assert alert_summary_doc(["*:50:0:10", "web-httprequest:75:0:10"]) == (
        "Analyze alerts across windows to identify threshold violations "
        "and anomalies. Applied criteria, "
        "[*:50:0:10,web-httprequest:75:0:10]."
    )
    assert watchlist_analyze_doc() == (
        "Alert on matched watchlist entries in incoming alerts from "
        "other pipelines."
    )
