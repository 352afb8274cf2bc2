"""Heuristic self-documentation strings (DocumentingTransform twins).

Every reference detector implements
``DocumentingTransform.getTransformDoc()`` (`DocumentingTransform.java`)
and each pipeline's ``buildConfigurationTick`` merges
``heuristic_<ClassName> -> doc`` entries into the configuration-tick
heartbeat (`metrics/CfgTickBuilder.java:40-42`), so a running pipeline
continuously self-describes which heuristics are active and with which
thresholds. This module reproduces those strings byte-exactly from the
same configuration values and exposes per-pipeline
``*_transform_docs()`` builders with the reference's exact enable-flag
gating, feeding :func:`foxsec_pipeline_spark.sources.input.cfgtick_message`.

Formatting notes (kept Java-faithful):

- ``%.2f`` is rendered with Python ``format(v, '.2f')``. Java rounds
  HALF_UP, Python half-even; they can differ only when the scaled value
  is an exact ``x.xx5`` double, which no reference default or test
  value is.
- ``Arrays.toString(String[])`` renders as ``[a, b]``; a null array
  renders as ``null``.
- The customs experimental tag is a literal ``" (Experimental)"``
  suffix applied when the detector is not escalated
  (`customs/CustomsDocumentingTransform.java:7,23-26`).
"""

from __future__ import annotations

# customs/CustomsDocumentingTransform.java:7
EXPERIMENTAL_TAG = " (Experimental)"

# Customs.CustomsOptions @Default annotations (customs/Customs.java;
# line refs per option below). Escalate/enable flags all default false.
CUSTOMS_DEFAULTS: dict[str, object] = {
    "accountCreationThreshold": 20,  # Customs.java:228
    "accountCreationDistributedThreshold": 15,  # Customs.java:234
    "accountCreationDistributedDistanceRatio": 0.35,  # Customs.java:240
    "sourceLoginFailureThreshold": 30,  # Customs.java:271
    "sourceLoginFailureDistributedThreshold": 10,  # Customs.java:278
    "maximumKilometersPerHour": 800,  # Customs.java:332
    "maximumKilometersPerHourMonitorOnly": 800,  # Customs.java:349
    "passwordResetAbuseThreshold": 5,  # Customs.java:373
    "accountEnumerationThreshold": 3,  # Customs.java:414
    "enableContentServerVarianceDetection": True,  # Customs.java:421
}

# HTTPRequestToggles constructor defaults
# (`httprequest/HTTPRequestToggles.java:1075-1104`)
HTTPREQUEST_TOGGLE_DEFAULTS: dict[str, object] = {
    "hardLimitRequestCount": 100,
    "analysisThresholdModifier": 75.0,
    "maxClientErrorRate": 30,
    "sessionGapDurationMinutes": 45,
    "maxClientStatusCodeRate": 30,
    "statusCodeRateCode": 0,
    "sourceCorrelatorMinimumAddresses": 250,
    "sourceCorrelatorAlertPercentage": 90.0,
}


def _f2(v) -> str:
    """Java ``%.2f``."""
    return format(float(v), ".2f")


def _arr(values) -> str:
    """``Arrays.toString(String[])``: ``[a, b]``; null array -> ``null``."""
    if values is None:
        return "null"
    return "[" + ", ".join(str(v) for v in values) + "]"


def _customs(doc: str, escalate: bool) -> str:
    """Apply the customs experimental suffix
    (`CustomsDocumentingTransform.java:23-26`)."""
    return doc if escalate else doc + EXPERIMENTAL_TAG


def _opt(options: dict | None, key: str, defaults: dict):
    options = options or {}
    if key in options:
        return options[key]
    return defaults.get(key)


# ---------------------------------------------------------------- customs


def customs_account_creation_doc(options: dict | None = None) -> str:
    """`customs/CustomsAccountCreation.java:50-55` +
    escalate gate `:125-127` (TestCustomsAccountCreation.java)."""
    o = lambda k: _opt(options, k, CUSTOMS_DEFAULTS)  # noqa: E731
    return _customs(
        "Alert if single source address creates %d or more accounts "
        "within 10 minute fixed window."
        % o("accountCreationThreshold"),
        bool(o("escalateAccountCreation")),
    )


def customs_account_creation_dist_doc(options: dict | None = None) -> str:
    """`customs/CustomsAccountCreationDist.java:48-53`."""
    o = lambda k: _opt(options, k, CUSTOMS_DEFAULTS)  # noqa: E731
    return _customs(
        "Alert if at least %d accounts are created from different source "
        "addresses in a 10 minute fixed window and the similarity index "
        "of the accounts is all below %s."
        % (
            o("accountCreationDistributedThreshold"),
            _f2(o("accountCreationDistributedDistanceRatio")),
        ),
        bool(o("escalateAccountCreationDistributed")),
    )


def source_login_failure_doc(options: dict | None = None) -> str:
    """`customs/SourceLoginFailure.java:46-49` (TestSourceLoginFailure)."""
    o = lambda k: _opt(options, k, CUSTOMS_DEFAULTS)  # noqa: E731
    return _customs(
        "Alert on %d login failures from a single source in a 10 minute "
        "window." % o("sourceLoginFailureThreshold"),
        bool(o("escalateSourceLoginFailure")),
    )


def source_login_failure_dist_doc(options: dict | None = None) -> str:
    """`customs/SourceLoginFailureDist.java:42-47`."""
    o = lambda k: _opt(options, k, CUSTOMS_DEFAULTS)  # noqa: E731
    return _customs(
        "Alert on login failures for a particular account from %d "
        "different source addresses in a 10 minute fixed window."
        % o("sourceLoginFailureDistributedThreshold"),
        bool(o("escalateSourceLoginFailureDistributed")),
    )


def customs_velocity_doc(options: dict | None = None) -> str:
    """`customs/CustomsVelocity.java:56-73` — km/s is km/h divided by
    3600 at construction (`:77-79`); the monitor-only clause appears
    only when the monitor-only detector is enabled (`:81`)
    (TestCustomsVelocity.java, all three legs)."""
    o = lambda k: _opt(options, k, CUSTOMS_DEFAULTS)  # noqa: E731
    check_exp = ""
    if o("enableVelocityDetectorMonitorOnly"):
        check_exp = (
            ", monitor only using a maximum KM/s of %s and minimum "
            "distance of %sKM"
            % (
                _f2(o("maximumKilometersPerHourMonitorOnly") / 3600.0),
                _f2(o("minimumDistanceForAlertMonitorOnly")),
            )
        )
    return _customs(
        "Alert based on applying location velocity analysis to FxA "
        "events, using a maximum KM/s of %s and minimum distance of %sKM%s"
        % (
            _f2(o("maximumKilometersPerHour") / 3600.0),
            _f2(o("minimumDistanceForAlert")),
            check_exp,
        ),
        bool(o("escalateVelocity")),
    )


def customs_status_comparator_doc(options: dict | None = None) -> str:
    """`customs/CustomsStatusComparator.java:45-47`."""
    return _customs(
        "Generate alerts if status checks occur flagged by comparator "
        "operation.",
        bool(_opt(options, "escalateStatusComparator", CUSTOMS_DEFAULTS)),
    )


def customs_activity_monitor_doc(options: dict | None = None) -> str:
    """`customs/CustomsActivityForMonitoredAccounts.java:37-39` —
    isExperimental() is hardwired true (`:128-130`)."""
    return _customs(
        "Generate pipeline alerts if a monitored user has FxA activity",
        False,
    )


def customs_login_failure_at_risk_doc(options: dict | None = None) -> str:
    """`customs/CustomsLoginFailureForAtRiskAccount.java:47-50`."""
    return _customs(
        "Generate alerts if there are failed logins on an account "
        "previously flagged as at risk by the status comparator.",
        bool(
            _opt(options, "escalateLoginFailureAtRiskAccount", CUSTOMS_DEFAULTS)
        ),
    )


def customs_password_reset_abuse_doc(options: dict | None = None) -> str:
    """`customs/CustomsPasswordResetAbuse.java:35-40`."""
    o = lambda k: _opt(options, k, CUSTOMS_DEFAULTS)  # noqa: E731
    return _customs(
        "Alert if single source requests password reset for at least %d "
        "distinct accounts within 10 minute fixed window."
        % o("passwordResetAbuseThreshold"),
        bool(o("escalatePasswordResetAbuse")),
    )


def customs_summary_doc(options: dict | None = None) -> str:
    """`customs/Customs.java:125-127` — plain DocumentingTransform,
    never tagged experimental."""
    return "Summarizes various event counts over 15 minute period."


def private_relay_forward_doc(options: dict | None = None) -> str:
    """`customs/PrivateRelayForward.java:100-103` — isExperimental()
    deliberately false (`:266-269`); note the reference's own
    "forward"+"events" concatenation lacks a space, reproduced here."""
    return (
        "Identify inconsistencies in private relay forward events using "
        "the forwardevents themselves in addition to FxA email change "
        "RP callbacks."
    )


def customs_account_enumeration_doc(options: dict | None = None) -> str:
    """`customs/CustomsAccountEnumeration.java:58-68`."""
    o = lambda k: _opt(options, k, CUSTOMS_DEFAULTS)  # noqa: E731
    var_desc = (
        ", using content server variance"
        if o("enableContentServerVarianceDetection")
        else ", without using content server variance"
    )
    return _customs(
        "Alert if single source address checks %d or more distinct "
        "emails are FxA accounts within 10 minute fixed window%s."
        % (o("accountEnumerationThreshold"), var_desc),
        bool(o("escalateAccountEnumerationDetector")),
    )


def customs_transform_docs(options: dict | None = None) -> dict[str, str]:
    """`heuristic_<Class> -> doc` map with the exact enable-flag gating
    and registration order of ``Customs.buildConfigurationTick``
    (`customs/Customs.java:441-487`)."""
    o = options or {}
    docs: dict[str, str] = {}
    if o.get("enableAccountCreationAbuseDetector"):
        docs["heuristic_CustomsAccountCreation"] = customs_account_creation_doc(o)
        docs["heuristic_CustomsAccountCreationDist"] = (
            customs_account_creation_dist_doc(o)
        )
    if o.get("enableSourceLoginFailureDetector"):
        docs["heuristic_SourceLoginFailure"] = source_login_failure_doc(o)
        docs["heuristic_SourceLoginFailureDist"] = source_login_failure_dist_doc(o)
    if o.get("enableVelocityDetector"):
        docs["heuristic_CustomsVelocity"] = customs_velocity_doc(o)
    if o.get("enableStatusComparator"):
        docs["heuristic_CustomsStatusComparator"] = customs_status_comparator_doc(o)
    if o.get("enableActivityMonitor"):
        docs["heuristic_CustomsActivityForMonitoredAccounts"] = (
            customs_activity_monitor_doc(o)
        )
    if o.get("enableLoginFailureAtRiskAccount"):
        docs["heuristic_CustomsLoginFailureForAtRiskAccount"] = (
            customs_login_failure_at_risk_doc(o)
        )
    if o.get("enablePasswordResetAbuseDetector"):
        docs["heuristic_CustomsPasswordResetAbuse"] = (
            customs_password_reset_abuse_doc(o)
        )
    if o.get("enableSummaryAnalysis"):
        docs["heuristic_CustomsSummary"] = customs_summary_doc(o)
    if o.get("enablePrivateRelayForward"):
        docs["heuristic_PrivateRelayForward"] = private_relay_forward_doc(o)
    if o.get("enableAccountEnumerationDetector"):
        docs["heuristic_CustomsAccountEnumeration"] = (
            customs_account_enumeration_doc(o)
        )
    return docs


# ------------------------------------------------------------ httprequest


def threshold_analysis_doc(toggles: dict | None = None) -> str:
    """`httprequest/heuristics/ThresholdAnalysis.java` getTransformDoc."""
    return (
        "Alert if a single source address makes more than %s times the "
        "calculated mean request rate for all clients within a 1 minute "
        "window."
        % _f2(_opt(toggles, "analysisThresholdModifier", HTTPREQUEST_TOGGLE_DEFAULTS))
    )


def hard_limit_doc(toggles: dict | None = None) -> str:
    """`httprequest/heuristics/HardLimitAnalysis.java` getTransformDoc."""
    return (
        "Alert if single source address makes more than %d requests in "
        "a 1 minute window."
        % _opt(toggles, "hardLimitRequestCount", HTTPREQUEST_TOGGLE_DEFAULTS)
    )


def error_rate_doc(toggles: dict | None = None) -> str:
    """`httprequest/heuristics/ErrorRateAnalysis.java` getTransformDoc."""
    return (
        "Alert if a single source address generates more than %d 4xx "
        "errors in a 1 minute window."
        % _opt(toggles, "maxClientErrorRate", HTTPREQUEST_TOGGLE_DEFAULTS)
    )


def status_code_rate_doc(toggles: dict | None = None) -> str:
    """`httprequest/heuristics/StatusCodeRateAnalysis.java`
    getTransformDoc."""
    return (
        "Alert if a single source address generates more than %d %d "
        "status responses in a 1 minute window."
        % (
            _opt(toggles, "maxClientStatusCodeRate", HTTPREQUEST_TOGGLE_DEFAULTS),
            _opt(toggles, "statusCodeRateCode", HTTPREQUEST_TOGGLE_DEFAULTS),
        )
    )


def ua_blocklist_doc(toggles: dict | None = None) -> str:
    """`httprequest/heuristics/UserAgentBlocklistAnalysis.java`
    getTransformDoc (constant)."""
    return (
        "Alert if client makes request with user agent that matches "
        "entry in blocklist."
    )


def _joined(entries: list[str]) -> str:
    """The heuristics' `buf += " " + x` accumulation."""
    return " ".join(entries)


def endpoint_abuse_doc(
    endpoints: list[tuple[int, str, str]], toggles: dict | None = None
) -> str:
    """`httprequest/heuristics/EndpointAbuseAnalysis.java`
    getTransformDoc — one ``%d %s requests for %s.`` clause per
    configured ``<threshold>:<method>:<path>`` endpoint (`:98-101`),
    space-joined, inside the sessionization preamble."""
    buf = _joined(
        ["%d %s requests for %s." % (t, m, p) for t, m, p in endpoints]
    )
    return (
        "Clients are sessionized by address, where a session ends after "
        "%d minutes of inactivity. An alert is generated if a client is "
        "observed making repeated requests to configured endpoints "
        "without requesting other forms of content from the site. %s"
        % (
            _opt(toggles, "sessionGapDurationMinutes", HTTPREQUEST_TOGGLE_DEFAULTS),
            buf,
        )
    )


def endpoint_sequence_abuse_doc(
    patterns: list[tuple[int, int, str, str, str, str]],
    toggles: dict | None = None,
) -> str:
    """`httprequest/heuristics/EndpointSequenceAbuse.java`
    getTransformDoc — pattern tuples are (threshold, delta_ms,
    first_method, first_path, second_method, second_path)."""
    buf = _joined(
        [
            "%d %s %s requests within %d ms of last %s %s request."
            % (t, sm, sp, d, fm, fp)
            for t, d, fm, fp, sm, sp in patterns
        ]
    )
    return (
        "An alert is generated when a client (identified by ip) makes "
        "requests for a sequence of endpoints within a configurable "
        "delta thought to be atypical of a normal user. %s" % buf
    )


def per_endpoint_error_rate_doc(
    specs: list[tuple[int, str, str]], toggles: dict | None = None
) -> str:
    """`httprequest/heuristics/PerEndpointErrorRateAnalysis.java`
    getTransformDoc — ``%d errors to endpoints matching %s %s.`` per
    spec, inside the error-session preamble."""
    buf = _joined(
        ["%d errors to endpoints matching %s %s." % (t, m, p) for t, m, p in specs]
    )
    return (
        "Clients are sessionized by address, where a session ends after "
        "%d minutes of inactivity. An alert is generated if a client is "
        "observed making repeated requests to configured endpoints that "
        "result in higher amount of errors. %s"
        % (
            _opt(toggles, "sessionGapDurationMinutes", HTTPREQUEST_TOGGLE_DEFAULTS),
            buf,
        )
    )


def session_limit_doc(
    limits: list[tuple[int, int, str, str]], toggles: dict | None = None
) -> str:
    """`httprequest/heuristics/SessionLimitAnalysis.java`
    getTransformDoc — limit tuples are (threshold, monitor, method,
    path); the clause prints ``%d %s requests for %s. (monitor only:
    %d)``."""
    buf = _joined(
        [
            "%d %s requests for %s. (monitor only: %d)" % (t, m, p, mon)
            for t, mon, m, p in limits
        ]
    )
    return (
        "Clients are sessionized by address, where a session ends after "
        "%d minutes of inactivity. An alert is generated if a client is "
        "observed making repeated requests to configured endpoints. %s"
        % (
            _opt(toggles, "sessionGapDurationMinutes", HTTPREQUEST_TOGGLE_DEFAULTS),
            buf,
        )
    )


def source_correlator_doc(toggles: dict | None = None) -> str:
    """`SourceCorrelation.java:223-228` getTransformDoc."""
    return (
        "Source address alerting correlation, ISP analysis on minimum "
        "%d addresses at %s alerting percentage."
        % (
            _opt(
                toggles,
                "sourceCorrelatorMinimumAddresses",
                HTTPREQUEST_TOGGLE_DEFAULTS,
            ),
            _f2(
                _opt(
                    toggles,
                    "sourceCorrelatorAlertPercentage",
                    HTTPREQUEST_TOGGLE_DEFAULTS,
                )
            ),
        )
    )


def httprequest_transform_docs(toggles: dict | None = None) -> dict[str, str]:
    """`heuristic_<Class> -> doc` map with the exact gating and order of
    ``HTTPRequest.buildConfigurationTick``
    (`httprequest/HTTPRequest.java:656-730`). Endpoint-family configs
    are the already-parsed tuples the matching operators in
    :mod:`foxsec_pipeline_spark.operators.heuristics` take."""
    t = toggles or {}
    docs: dict[str, str] = {}
    if t.get("enableThresholdAnalysis"):
        docs["heuristic_ThresholdAnalysis"] = threshold_analysis_doc(t)
    if t.get("enableHardLimitAnalysis"):
        docs["heuristic_HardLimitAnalysis"] = hard_limit_doc(t)
    if t.get("enableErrorRateAnalysis"):
        docs["heuristic_ErrorRateAnalysis"] = error_rate_doc(t)
    if t.get("enableUserAgentBlocklistAnalysis"):
        docs["heuristic_UserAgentBlocklistAnalysis"] = ua_blocklist_doc(t)
    if t.get("enableEndpointAbuseAnalysis"):
        docs["heuristic_EndpointAbuseAnalysis"] = endpoint_abuse_doc(
            t.get("endpointAbusePath", []), t
        )
    if t.get("enableSourceCorrelator"):
        docs["heuristic_SourceCorrelator"] = source_correlator_doc(t)
    if t.get("enableEndpointSequenceAbuseAnalysis"):
        docs["heuristic_EndpointSequenceAbuse"] = endpoint_sequence_abuse_doc(
            t.get("endpointSequenceAbusePatterns", []), t
        )
    if t.get("enablePerEndpointErrorRateAnalysis"):
        docs["heuristic_PerEndpointErrorRateAnalysis"] = (
            per_endpoint_error_rate_doc(t.get("perEndpointErrorRatePaths", []), t)
        )
    if t.get("enableStatusCodeRateAnalysis"):
        docs["heuristic_StatusCodeRateAnalysis"] = status_code_rate_doc(t)
    if t.get("enableSessionLimitAnalysis"):
        docs["heuristic_SessionLimitAnalysis"] = session_limit_doc(
            t.get("sessionLimitAnalysisPaths", []), t
        )
    return docs


# ------------------------------------------------- other pipelines (amo,
# authprofile, gatekeeper, pioneer, postprocessing)


def addon_cloud_submission_doc() -> str:
    """`amo/AddonCloudSubmission.java` getTransformDoc (constant)."""
    return "Alert on add-on submissions from cloud providers."


def addon_matcher_doc(match_criteria: list[str] | None) -> str:
    """`amo/AddonMatcher.java` getTransformDoc — the raw
    ``<regex>:<minbytes>:<maxbytes>`` criteria strings via
    Arrays.toString."""
    return (
        "Match abusive addon uploads using these patterns %s and "
        "generate alerts" % _arr(match_criteria)
    )


def addon_multi_ip_login_doc(
    alert_on: int, alert_on_ip: int, acct_exceptions: list[str] | None
) -> str:
    """`amo/AddonMultiIpLogin.java` getTransformDoc."""
    return (
        "Detect multiple account logins for the same account from "
        "different source addresses associated with different country "
        "codes. Alert on %s different countries and %s different IPs. "
        "Regex for account exceptions: %s"
        % (alert_on, alert_on_ip, _arr(acct_exceptions))
    )


def addon_multi_match_doc(alert_on: int) -> str:
    """`amo/AddonMultiMatch.java` getTransformDoc."""
    return (
        "Detect distributed AMO submissions with the same file hash. "
        "Alert on %s submissions of the same file name." % alert_on
    )


def addon_multi_submit_doc(alert_on: int) -> str:
    """`amo/AddonMultiSubmit.java` getTransformDoc."""
    return (
        "Detect distributed submissions based on file size intervals. "
        "Alert on %s submissions of the same rounded interval." % alert_on
    )


def fxa_account_abuse_alias_doc(max_aliases: int) -> str:
    """`amo/FxaAccountAbuseAlias.java` getTransformDoc."""
    return (
        "Alerts on aliased FxA accounts usage. A max of %s are allowed "
        "for one account in a given session." % max_aliases
    )


def fxa_account_abuse_new_version_doc(ban_accounts: list[str] | None) -> str:
    """`amo/FxaAccountAbuseNewVersion.java` getTransformDoc."""
    return (
        "Correlates AMO addon submissions with abusive FxA account "
        "creation alerts via iprepd. Also includes blocked accounts "
        "regex: %s" % _arr(ban_accounts)
    )


def report_restriction_doc() -> str:
    """`amo/ReportRestriction.java` getTransformDoc (constant)."""
    return "Reports on request restrictions from AMO"


def auth_state_analyze_doc() -> str:
    """`authprofile/AuthProfile.java` StateAnalyze getTransformDoc
    (constant)."""
    return (
        "Alert if an identity (can be thought of as a user) "
        "authenticates from a new IP"
    )


def crit_object_analyze_doc(
    crit_notify_email: str | None, crit_objects: list[str] | None
) -> str:
    """`authprofile/CritObjectAnalyze.java` getTransformDoc."""
    return "Alert via %s immediately on auth events to specified objects: %s" % (
        crit_notify_email,
        _arr(crit_objects),
    )


def etd_transform_doc() -> str:
    """`gatekeeper/ETDTransforms.java` getTransformDoc (constant)."""
    return (
        "Alerts are generated based on events sent from GCP's Event "
        "Threat Detection."
    )


def guardduty_transform_doc() -> str:
    """`gatekeeper/GuardDutyTransforms.java` getTransformDoc (constant)."""
    return "Alerts are generated based on events sent from AWS's Guardduty."


def pioneer_exfiltration_doc(threshold_bytes: int) -> str:
    """`pioneer/Pioneer.java:76-81` getTransformDoc — the session gap is
    the hardwired 30-minute constant (`:71`), Joda-period-formatted as
    "30 minutes"."""
    return (
        "Alert if %d bytes of data are transferred from an SSH instance "
        "over IAP in %s" % (threshold_bytes, "30 minutes")
    )


def alert_summary_doc(thresholds: list[str]) -> str:
    """`postprocessing/AlertSummary.java` getTransformDoc — the raw
    criteria strings comma-joined (String.join(","))."""
    return (
        "Analyze alerts across windows to identify threshold violations "
        "and anomalies. Applied criteria, [%s]." % ",".join(thresholds)
    )


def watchlist_analyze_doc() -> str:
    """`postprocessing/PostProcessing.java:180-182` getTransformDoc
    (constant)."""
    return (
        "Alert on matched watchlist entries in incoming alerts from "
        "other pipelines."
    )


def build_customs_cfgtick(options: dict) -> str:
    """Customs ``buildConfigurationTick`` twin
    (`customs/Customs.java:441-487`): pipeline options merged with the
    gated ``heuristic_*`` transform docs, rendered through the shared
    CfgTickBuilder flattening."""
    from foxsec_pipeline_spark.sources.input import cfgtick_message

    merged = dict(options)
    merged.update(customs_transform_docs(options))
    return cfgtick_message(merged)


def build_httprequest_cfgtick(options: dict, toggles: dict) -> str:
    """HTTPRequest ``buildConfigurationTick`` twin
    (`httprequest/HTTPRequest.java:656-730`)."""
    from foxsec_pipeline_spark.sources.input import cfgtick_message

    merged = dict(options)
    merged.update(httprequest_transform_docs(toggles))
    return cfgtick_message(merged)
