"""Scalar-function surface added after tranche 2: syslog timestamp
year correction, reputation enrichment, the pandas-UDF registry, and
the cfgtick heartbeat source."""

import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F

from foxsec_pipeline_spark.functions.enrich import enrich_reputation
from foxsec_pipeline_spark.functions.registry import (
    install_udfs,
    register_udf,
    registered_udfs,
)
from foxsec_pipeline_spark.functions.text import parse_syslog_ts


def test_parse_syslog_ts_year_correction(spark):
    df = spark.createDataFrame(
        [Row(line="Jan  1 00:02:00"), Row(line="Dec 31 23:59:58")]
    )
    # pinned year in the far past: both parse into that year (neither
    # is in the future)
    out = df.select(parse_syslog_ts(F.col("line"), year=1970).alias("ts")).collect()
    assert str(out[0].ts) == "1970-01-01 00:02:00"
    assert str(out[1].ts) == "1970-12-31 23:59:58"
    # pinned far-future year: candidates are in the future, so the
    # year rolls back by one (Parser.java year correction)
    out2 = df.select(parse_syslog_ts(F.col("line"), year=2999).alias("ts")).collect()
    assert str(out2[0].ts) == "2998-01-01 00:02:00"


def test_enrich_reputation_broadcast_join(spark):
    df = spark.createDataFrame(
        [Row(id=1, ip="1.2.3.4"), Row(id=2, ip="5.6.7.8"), Row(id=3, ip="1.2.3.4")]
    )
    out = enrich_reputation(df, "ip")
    rows = {r.id: r.reputation for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] == rows[3]  # same object -> same reputation
    assert all(0 <= v <= 100 for v in rows.values())
    # exemption-style floor filter
    floor = min(rows.values()) + 1
    kept = enrich_reputation(df, "ip", min_reputation=floor).count()
    assert kept < 3


def test_udf_registry_installs_pandas_udf(spark):
    @register_udf("fxs_test_double_len", "long")
    def _double_len(s: pd.Series) -> pd.Series:
        return s.str.len() * 2

    assert "fxs_test_double_len" in registered_udfs()
    install_udfs(spark)
    got = spark.sql("SELECT fxs_test_double_len('abc') AS v").collect()[0].v
    assert got == 6


def test_cfgtick_heartbeat_stream(spark, tmp_path):
    """S4 CfgTick: rate source -> constant config JSON heartbeat
    (metrics/CfgTickUnboundedSource.java as ~10 lines of plan)."""
    from foxsec_pipeline_spark.sources.input import cfgtick_stream

    tick = cfgtick_stream(spark, {"heuristic": "threshold", "limit": 5},
                          interval_seconds=1)
    assert tick.isStreaming
    q = (
        tick.writeStream.format("memory").queryName("cfgtick_t")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 25
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT * FROM cfgtick_t").count()
            if n >= 1:
                break
            time.sleep(1)
        rows = spark.sql("SELECT * FROM cfgtick_t").collect()
        assert n >= 1, "no heartbeat rows arrived"
        assert all(r.resource == "cfgtick" for r in rows)
        assert '"heuristic": "threshold"' in rows[0].value
    finally:
        q.stop()


def test_streaming_parse_to_alert_end_to_end(spark, tmp_path):
    """The full pipeline shape under Structured Streaming: raw JSON
    lines -> parse_events -> windowed heuristic -> to_alerts, driven
    by a file stream into a memory sink (batch and streaming share the
    one plan — SURVEY §1.1 'Streams')."""
    import json

    from foxsec_pipeline_spark.alert.model import to_alerts
    from foxsec_pipeline_spark.operators import error_rate_analysis
    from foxsec_pipeline_spark.parser.parse import ParserCfg, parse_events

    lines = [
        json.dumps(
            {
                "timestamp": f"1970-01-01T00:00:{s:02d}.000Z",
                "resource": {"labels": {"project_id": "p"}},
                "jsonPayload": {"@type": "type.googleapis.com/google.cloud"
                                ".loadbalancing.type.LoadBalancerLogEntry"},
                "httpRequest": {
                    "remoteIp": "10.0.0.9",
                    "requestMethod": "GET",
                    "requestUrl": "https://h.example.com/x",
                    "status": 429,
                    "userAgent": "ua",
                },
            }
        )
        for s in range(10)
    ]
    src_dir = tmp_path / "raw"
    src_dir.mkdir()
    (src_dir / "a.jsonl").write_text("\n".join(lines))
    raw = spark.readStream.format("text").load(str(src_dir))

    events = parse_events(raw, ParserCfg(), now="1970-01-01 00:01:00")
    hits = error_rate_analysis(
        events.withWatermark("timestamp", "10 minutes"),
        key="source_address",
        error_predicate=F.col("request_status").between(400, 499),
        ts="timestamp",
        duration="1 minute",
        max_errors=5,
    )
    alerts = to_alerts(
        hits, category="httprequest", severity="warn",
        summary=F.concat(F.lit("error rate from "), F.col("source_address")),
        metadata_cols=["source_address", "error_count"],
    )
    # complete mode: assert on FINAL windows (append would withhold
    # windows the watermark hasn't passed — SURVEY §7 hard part 1)
    q = (
        alerts.writeStream.format("memory").queryName("e2e_alerts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM e2e_alerts").collect()
    assert len(rows) == 1
    assert rows[0].metadata["source_address"] == "10.0.0.9"
    assert rows[0].metadata["error_count"] == "10"
    assert rows[0].category == "httprequest" and rows[0].severity == "warn"


def test_quality_filter_pipeline_decision_branches(spark):
    """Every drop-reason branch of the composed quality filter fires on
    a crafted corpus (the sf0.01 synth docs only exercise language/keep:
    they contain no exact dupes or degenerate text)."""
    from foxsec_pipeline_spark.plans.catalog_data import q_quality_filter_pipeline

    good = ("the quick brown fox jumps over a lazy dog and then runs far "
            "to the old stone bridge in cold light rain near a quiet town")
    rows = [
        Row(doc_id=0, text=good),                      # keep
        Row(doc_id=1, text=good),                      # duplicate of 0
        Row(doc_id=2, text="der hund und die katze und der vogel und das haus "
                           "und ist ein zu der die das und ist ein zu"),  # language
        Row(doc_id=3, text="the the the the"),         # quality (short, low diversity)
        Row(doc_id=4, text="the a of and is to in " * 40),  # repetition
    ]
    df = spark.createDataFrame(rows)

    # run the same composition the catalog query uses, on the fixture
    import foxsec_pipeline_spark.plans.catalog_data as cd

    orig = cd._docs
    try:
        cd._docs = lambda spark, sf_dir: df
        out = {r.doc_id: r for r in q_quality_filter_pipeline(spark, "unused").collect()}
    finally:
        cd._docs = orig
    assert out[0].drop_reason == "keep" and out[0].keep
    assert out[1].drop_reason == "duplicate" and not out[1].keep
    assert out[2].drop_reason == "language"
    assert out[3].drop_reason == "quality"
    assert out[4].drop_reason == "repetition" and out[4].dup_shingle_ratio > 0.6


# ---------------------------------------------------------------------------
# CfgTick builder / queue-spec properties (hypothesis)


def test_cfgtick_message_flattening_properties():
    """Property: for any options map of supported value types, the
    built message is valid JSON of string->string, stamps
    configuration_tick, drops nulls and the staged-jar list, and
    flattens arrays with ', ' (`CfgTickBuilder.java` +
    `CfgTick.flattenObjectMapToStringMap`)."""
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from foxsec_pipeline_spark.sources.input import cfgtick_message

    scalar = st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-10**12, max_value=10**12),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(max_size=20),
        st.lists(st.one_of(st.text(max_size=8),
                           st.integers(min_value=0, max_value=999)),
                 max_size=4),
    )
    keys = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABC_", min_size=1, max_size=12
    )

    @settings(max_examples=60, deadline=None)
    @given(opts=st.dictionaries(keys, scalar, max_size=8))
    def run(opts):
        msg = cfgtick_message(opts)
        m = _json.loads(msg)
        assert m["configuration_tick"] == "true"
        assert all(isinstance(v, str) for v in m.values())
        assert "filesToStage" not in m
        for k, v in opts.items():
            if v is None or k in ("filesToStage", "configuration_tick"):
                continue
            assert k in m
            if isinstance(v, bool):
                assert m[k] == ("true" if v else "false")
            elif isinstance(v, (list, tuple)):
                assert m[k] == ", ".join(str(x) for x in v)

    run()


def test_parse_queue_info_roundtrip_property():
    """Property: any (url-with-one-colon, key, secret, region) spec
    with colon-free parts round-trips through parse_queue_info; any
    other colon count is rejected (`SqsIO.java:33-39`)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from foxsec_pipeline_spark.sinks.output import parse_queue_info

    part = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789-./", min_size=1,
        max_size=12,
    )

    @settings(max_examples=60, deadline=None)
    @given(scheme=part, rest=part, key=part, secret=part, region=part)
    def run(scheme, rest, key, secret, region):
        spec = f"{scheme}:{rest}:{key}:{secret}:{region}"
        assert parse_queue_info(spec) == [
            f"{scheme}:{rest}", key, secret, region
        ]
        assert parse_queue_info(f"{scheme}:{rest}") is None
        assert parse_queue_info(spec + ":extra") is None

    run()
