"""Windowed detection heuristics — the reference's HTTPRequest family
re-expressed as pure DataFrame -> DataFrame functions.

Each function takes a normalized event DataFrame with at least
(ts: timestamp, key: string-ish) and returns the "alert candidate"
rows. They are generic over the key/predicate so the same operator
serves HTTP logs (key=source_address) and any other keyed stream.

Reference parity map (file:line in /root/reference):
- threshold_analysis   <- httprequest/heuristics/ThresholdAnalysis.java:88-199
- hard_limit_analysis  <- httprequest/heuristics/HardLimitAnalysis.java:92-130
- error_rate_analysis  <- httprequest/heuristics/ErrorRateAnalysis.java:62-84
- status_code_rate     <- httprequest/heuristics/StatusCodeRateAnalysis.java:67-90
- detect_nat           <- DetectNat.java:100-152
- endpoint_sequence    <- httprequest/heuristics/EndpointSequenceAbuse.java:146-270
- session_analysis     <- httprequest/HTTPRequest.java:96-165 (session windows)
- endpoint_abuse       <- httprequest/heuristics/EndpointAbuseAnalysis.java:134-277
- per_key_stats        <- Stats.java:119-225 (global CombineFn -> window agg)

Scale notes: every heuristic is one shuffle (groupBy key+window) with
map-side partial aggregation; the global-stats side input becomes a
window-aligned broadcast join (tiny side: one row per window), which
Catalyst executes as BroadcastHashJoin — no second shuffle of the big
side. No Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .windows import windowed_counts


def per_key_stats(counts: DataFrame, count_col: str = "n") -> DataFrame:
    """Global mean/count/sum over per-key counts, per window.

    Beam exposed this as a singleton side-input view
    (`Stats.java:215-219`); here it is a per-window aggregate joined
    back broadcast-style.
    """
    return counts.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("stats_count"),
        F.sum(count_col).alias("stats_sum"),
        F.avg(count_col).alias("stats_mean"),
    )


def threshold_analysis(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    duration: str = "1 minute",
    required_minimum_average: float = 1.0,
    clamp_maximum: float | None = None,
    threshold_modifier: float = 1.0,
    min_clients: int = 1,
) -> DataFrame:
    """Alert when a key's per-window count > mean * threshold_modifier.

    Mirrors ThresholdAnalysis: compute per-client counts in fixed
    windows, compare each against the window's global mean (the Beam
    side input), with a required minimum average, an optional clamp on
    the mean, and a minimum-clients gate
    (`ThresholdAnalysis.java:110-199`).
    """
    counts = windowed_counts(events, key, ts, duration)
    stats = per_key_stats(counts)
    if clamp_maximum is not None:
        stats = stats.withColumn(
            "stats_mean", F.least(F.col("stats_mean"), F.lit(float(clamp_maximum)))
        )
    joined = counts.join(F.broadcast(stats), "window_start")
    return (
        joined.where(
            (F.col("stats_mean") >= F.lit(float(required_minimum_average)))
            & (F.col("stats_count") >= F.lit(int(min_clients)))
            & (F.col("n") > F.col("stats_mean") * F.lit(float(threshold_modifier)))
        )
        .select(
            "window_start",
            F.col(key),
            F.col("n").alias("count"),
            F.round("stats_mean", 6).alias("mean"),
        )
    )


def hard_limit_analysis(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    duration: str = "1 minute",
    max_count: int = 100,
) -> DataFrame:
    """Alert when a key's per-window count exceeds a fixed limit
    (`HardLimitAnalysis.java:92-130`)."""
    return (
        windowed_counts(events, key, ts, duration)
        .where(F.col("n") > F.lit(int(max_count)))
        .select("window_start", F.col(key), F.col("n").alias("count"))
    )


def error_rate_analysis(
    events: DataFrame,
    key: str,
    error_predicate: Column,
    ts: str = "ts",
    duration: str = "1 minute",
    max_errors: int = 30,
) -> DataFrame:
    """Alert when a key's per-window count of error events exceeds a
    threshold (`ErrorRateAnalysis.java:62-84`; 4xx filter
    `HTTPRequest.java:168-180`).

    The predicate filter runs *before* the shuffle, so only error rows
    are shuffled — the reference achieves the same by filtering before
    GroupByKey.
    """
    return (
        events.where(error_predicate)
        .groupBy(F.window(ts, duration).alias("window"), F.col(key))
        .agg(F.count(F.lit(1)).alias("error_count"))
        .where(F.col("error_count") > F.lit(int(max_errors)))
        .select(
            F.col("window.start").alias("window_start"),
            F.col(key),
            F.col("error_count"),
        )
    )


def status_code_rate_analysis(
    events: DataFrame,
    key: str,
    match_predicate: Column,
    ts: str = "ts",
    duration: str = "1 minute",
    max_count: int = 2,
) -> DataFrame:
    """Alert when a key generates more than `max_count` events
    matching a predicate (e.g. one status code) in a fixed window —
    COUNT semantics, exactly the reference's
    `heuristics/StatusCodeRateAnalysis.java:66-117` (filter by status
    -> Count.perElement -> threshold; the transform name says "rate"
    but the comparison is a per-window count, verified against
    `TestStatusCodeRateAnalysis` and its fixture in
    tests/test_reference_goldens.py).

    The predicate filter runs BEFORE the shuffle, so only matching
    rows move — one shuffle, map-side partial counts.
    """
    return (
        events.where(match_predicate)
        .groupBy(F.window(ts, duration).alias("window"), F.col(key))
        .agg(F.count(F.lit(1)).alias("matched"))
        .where(F.col("matched") > F.lit(int(max_count)))
        .select(
            F.col("window.start").alias("window_start"),
            F.col(key),
            F.col("matched"),
        )
    )


def detect_nat(
    events: DataFrame,
    key: str,
    diversity_col: str,
    ts: str = "ts",
    duration: str = "1 minute",
    min_distinct: int = 2,
) -> DataFrame:
    """Flag keys whose distinct-diversity count in a window reaches a
    minimum — the reference uses distinct user agents per source IP to
    infer NAT (`DetectNat.java:100-152`: Distinct + Count.perKey).

    Exact countDistinct: one shuffle with partial distinct aggregation.
    At very high cardinality swap in approx_count_distinct (HLL) — same
    call site, sketch-based, no accuracy cliff at 100 TB.
    """
    return (
        events.groupBy(F.window(ts, duration).alias("window"), F.col(key))
        .agg(F.countDistinct(diversity_col).alias("n_distinct"))
        .where(F.col("n_distinct") >= F.lit(int(min_distinct)))
        .select(
            F.col("window.start").alias("window_start"),
            F.col(key),
            F.col("n_distinct"),
        )
    )


def endpoint_sequence_abuse(
    events: DataFrame,
    key: str,
    first_predicate: Column,
    second_predicate: Column,
    ts: str = "ts",
    max_delta_ms: int = 1000,
    min_pairs: int = 1,
) -> DataFrame:
    """Count A-then-B-within-delta sequences per key
    (`EndpointSequenceAbuse.java:146-270`).

    The reference sorts each key group in a DoFn and scans adjacent
    pairs; here `lag` over (key ORDER BY ts) does the time-sorted
    pairing in one shuffle, with the pair test as a codegen'd
    expression.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col("__tag").asc())
    tagged = events.withColumn(
        "__tag",
        F.when(second_predicate, F.lit("b")).when(first_predicate, F.lit("a")),
    ).where(F.col("__tag").isNotNull())
    paired = tagged.select(
        F.col(key),
        F.col(ts),
        F.col("__tag"),
        F.lag("__tag").over(w).alias("prev_tag"),
        F.lag(ts).over(w).alias("prev_ts"),
    )
    pair_hit = (
        (F.col("__tag") == "b")
        & (F.col("prev_tag") == "a")
        & (
            (F.col(ts).cast("double") - F.col("prev_ts").cast("double"))
            <= F.lit(max_delta_ms / 1000.0)
        )
    )
    return (
        paired.where(pair_hit)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= F.lit(int(min_pairs)))
    )


def session_analysis(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    gap: str = "45 minutes",
) -> DataFrame:
    """Sessionize a keyed stream with an inactivity gap and emit
    per-session extent + volume (`HTTPRequest.java:96-165`,
    session gap default 45 min `HTTPRequest.java:565-569`).

    Batch + streaming share this plan: `session_window` is a grouping
    expression, so the same code runs under readStream with a
    watermark.
    """
    return (
        events.groupBy(F.session_window(ts, gap).alias("session"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
        )
        .select(key, "first_ts", "last_ts", "n_events")
    )


def endpoint_abuse_analysis(
    events: DataFrame,
    key: str,
    endpoint_col: str,
    monitored: list[str],
    ts: str = "ts",
    gap: str = "45 minutes",
    min_count: int = 5,
    variance_suppress: bool = True,
) -> DataFrame:
    """Per-session counts of monitored endpoints; alert on the
    endpoint with the max count when it exceeds a threshold
    (`EndpointAbuseAnalysis.java:134-277`, top-endpoint pick
    `:203-225`).

    `variance_suppress` is the reference's basic-variance rule
    (`:157-201`): a session containing ANY request to a
    non-monitored endpoint is assumed to be a real client (it loaded
    supporting content) and is dropped entirely — abuse sessions are
    the ones hammering ONLY the monitored endpoints. Golden-verified
    against httpreq_endpointabuse1 in tests/test_reference_goldens.py
    (192.168.1.3's 11-event session with one stray request is
    suppressed; 192.168.1.2's pure 10x GET /test session alerts).

    The reference folds each group in a DoFn; here one session-window
    aggregation builds per-endpoint counts with count(when(...)), and
    `greatest`-style struct max picks the top endpoint — no
    collect+loop, fully codegen. `latest_ts` is the newest monitored
    request (the reference's alert timestamp, latestEpaRequest).
    """
    per_ep = [
        F.count(F.when(F.col(endpoint_col) == ep, 1)).alias(f"__c{i}")
        for i, ep in enumerate(monitored)
    ]
    monitored_pred = F.col(endpoint_col).isin(*monitored)
    agg = events.groupBy(
        F.session_window(ts, gap).alias("session"), F.col(key)
    ).agg(
        *per_ep,
        F.min(ts).alias("first_ts"),
        F.max(F.when(monitored_pred, F.col(ts))).alias("latest_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    monitored_total = None
    for i in range(len(monitored)):
        c = F.col(f"__c{i}")
        monitored_total = c if monitored_total is None else monitored_total + c
    if variance_suppress:
        agg = agg.where(F.col("n_events") == monitored_total)
    # array of (count, endpoint) structs -> array_max picks top count,
    # ties broken by endpoint name (deterministic, unlike the
    # reference's "pick any" — canonicalized per SURVEY §7.4)
    pairs = F.array(
        *[
            F.struct(F.col(f"__c{i}").alias("c"), F.lit(ep).alias("ep"))
            for i, ep in enumerate(monitored)
        ]
    )
    top = F.array_max(pairs)
    return (
        agg.select(
            F.col(key),
            F.col("first_ts"),
            F.col("latest_ts"),
            F.col("n_events"),
            top["c"].alias("top_count"),
            top["ep"].alias("top_endpoint"),
        )
        .where(F.col("top_count") >= F.lit(int(min_count)))
    )


def session_limit_analysis(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    gap: str = "45 minutes",
    max_count: int = 100,
) -> DataFrame:
    """Alert when a key's single-session event volume exceeds a fixed
    limit (`httprequest/heuristics/SessionLimitAnalysis.java:136-230`
    — the session analog of HardLimit). One session-window shuffle."""
    return (
        events.groupBy(F.session_window(ts, gap).alias("session"), F.col(key))
        .agg(
            F.min(ts).alias("first_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .where(F.col("n_events") > F.lit(int(max_count)))
        .select(key, "first_ts", "n_events")
    )


def per_endpoint_error_rate(
    events: DataFrame,
    key: str,
    endpoint_col: str,
    error_predicate: Column,
    ts: str = "ts",
    gap: str = "5 minutes",
    max_errors: int = 30,
) -> DataFrame:
    """Per-session, per-endpoint client-error counting with a
    threshold per endpoint
    (`httprequest/heuristics/PerEndpointErrorRateAnalysis.java:153-220`
    — error sessions use a 5-minute gap `HTTPRequest.java:96-165`).

    The endpoint joins the grouping key (vs endpoint_abuse's pivoted
    counters) because the configured endpoint list is per-deployment
    unbounded; the shuffle key stays (key, endpoint) — no pivot
    explosion.
    """
    return (
        events.where(error_predicate)
        .groupBy(
            F.session_window(ts, gap).alias("session"),
            F.col(key),
            F.col(endpoint_col),
        )
        .agg(F.min(ts).alias("first_ts"), F.count(F.lit(1)).alias("error_count"))
        .where(F.col("error_count") > F.lit(int(max_errors)))
        .select(key, endpoint_col, "first_ts", "error_count")
    )


def ua_blocklist_analysis(
    events: DataFrame,
    key: str,
    ua_col: str,
    patterns: list[str],
    ts: str = "ts",
    duration: str = "1 minute",
) -> DataFrame:
    """Alert on keys whose user agent matches any blocklist regex in a
    window (`httprequest/heuristics/UserAgentBlocklistAnalysis.java:95-110`
    — the blocklist file becomes a constant-folded OR of rlike tests;
    for huge lists, swap to one compiled alternation regex — still one
    scan, no join)."""
    from functools import reduce as _reduce

    hit = _reduce(
        lambda a, b: a | b, [F.col(ua_col).rlike(p) for p in patterns]
    )
    return (
        events.where(hit)
        .groupBy(F.window(ts, duration).alias("window"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.min(ua_col).alias("sample_user_agent"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col(key),
            "n_matched",
            "sample_user_agent",
        )
    )
