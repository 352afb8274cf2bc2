"""W2 early-firing accumulating panes — golden-replayed against the
reference's own streaming pane expectations.

`TestPerEndpointErrorRateAnalysis.perEndpointErrorRateTestStream6`
(`TestPerEndpointErrorRateAnalysis.java:483-566`) drives three
TestStream batches and asserts TWO alerts for 192.168.1.2 under
accumulating early firing: the count-7 pane (latest error 00:00:00)
after the first batch, then the count-18 pane (latest error 00:00:45)
once the third batch lands in the same 1-minute-gap error session.
Beam's `addElements(...)` batch structure maps onto one file per
micro-batch via maxFilesPerTrigger=1; the pane SEQUENCE is then fully
deterministic in event order, which is exactly what the reference test
pins (its processing-time cadence knob only spaces the firings out).
"""

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from foxsec_pipeline_spark.parser.parse import ParserCfg, parse_events
from foxsec_pipeline_spark.streaming.panes import session_fire_early_panes

TESTDATA = "/root/reference/src/test/resources/testdata"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTDATA), reason="reference testdata not available"
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="fxs_panes_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_per_endpoint_error_rate_pane_sequence_reference_golden(spark, tmpdir):
    src_dir = os.path.join(tmpdir, "in")
    os.makedirs(src_dir)
    # one reference TestStream batch per file, mtime-ordered so the
    # file source (oldest-first) replays the exact addElements order
    for i in (1, 2, 3):
        dst = os.path.join(src_dir, f"batch_{i}.txt")
        shutil.copy(
            os.path.join(
                TESTDATA, "httpreq_perendpointerrorrate6",
                f"httpreq_perendpointerrorrate6_{i}.txt",
            ),
            dst,
        )
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))

    # batch-mode parse of one file to freeze the parsed schema for the
    # streaming reader (parse_events is a pure projection, so the
    # same plan runs under readStream)
    probe = parse_events(
        spark.read.text(os.path.join(src_dir, "batch_1.txt")), ParserCfg()
    )
    raw = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(src_dir)
    )
    ev = parse_events(raw, ParserCfg())
    assert ev.schema == probe.schema
    # the fixture pins events AT the epoch, which is also Spark's
    # INITIAL watermark value — the stateful late-row filter drops
    # rows whose event time does not exceed the current watermark, so
    # epoch-exact rows vanish in the very first batch. A uniform +1h
    # shift (pure relabeling; session math is translation-invariant)
    # keeps the reference's expectations recognizable at 01:00:00
    monitored = ev.where(
        F.col("request_status").between(400, 499)
        & (F.col("request_method") == "GET")
        & F.col("request_path").rlike("^(?:/t.*)$")
    ).select(
        "source_address",
        (F.col("timestamp") + F.expr("INTERVAL 1 HOUR")).alias("timestamp"),
    )
    panes = session_fire_early_panes(
        monitored, key_col="source_address", ts_col="timestamp",
        gap="1 minute",
    )
    name = f"panes_{uuid.uuid4().hex[:8]}"
    q = (
        panes.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        f"SELECT * FROM {name} ORDER BY key, n_events"
    ).collect()
    got = [
        (r.key, r.n_events, str(r.latest_ts), str(r.session_start))
        for r in rows
    ]
    # 192.168.1.2: the reference's two accumulating panes — 7 errors
    # (all at 00:00:00, batch 1), then 18 once batch 3's errors at
    # 00:00:45 extend the same session. 192.168.1.4's single error
    # emits a sub-threshold pane the alert filter drops.
    assert got == [
        ("192.168.1.2", 7, "1970-01-01 01:00:00", "1970-01-01 01:00:00"),
        ("192.168.1.2", 18, "1970-01-01 01:00:45", "1970-01-01 01:00:00"),
        ("192.168.1.4", 1, "1970-01-01 01:00:45", "1970-01-01 01:00:45"),
    ]
    # the reference's alert threshold (>= 4) leaves exactly its two
    # asserted alerts, in its order, with its timestamps
    alerts = [g for g in got if g[1] >= 4]
    assert [(a[1], a[2]) for a in alerts] == [
        (7, "1970-01-01 01:00:00"),
        (18, "1970-01-01 01:00:45"),
    ]


def test_pane_merge_across_batches(spark, tmpdir):
    """Two sessions opened in batch 1 merge when a bridging event in
    batch 2 lands between them — the merged session's pane carries the
    COMBINED count (Beam merging-window accumulation), and untouched
    keys emit nothing in batches that don't touch them."""
    import json

    src_dir = os.path.join(tmpdir, "in")
    os.makedirs(src_dir)

    def glb(ip, hhmmss):
        return json.dumps({
            "httpRequest": {
                "referer": "https://send.firefox.com/",
                "remoteIp": ip, "requestMethod": "GET",
                "requestSize": "43",
                "requestUrl": "https://send.firefox.com/test",
                "responseSize": "2692", "serverIp": "10.0.0.1",
                "status": 400,
                "userAgent": "Mozilla",
            },
            "insertId": "x", "logName": "projects/test/logs/requests",
            "jsonPayload": {
                "@type": ("type.googleapis.com/google.cloud."
                          "loadbalancing.type.LoadBalancerLogEntry"),
            },
            "resource": {"type": "http_load_balancer"},
            "timestamp": f"1970-01-01T{hhmmss}+00:00",
        })

    b1 = [glb("1.2.3.4", "01:00:00"), glb("1.2.3.4", "01:02:30"),
          glb("9.9.9.9", "01:00:05")]
    b2 = [glb("1.2.3.4", "01:01:10")]  # bridges the two 1.2.3.4 sessions
    for i, lines in ((1, b1), (2, b2)):
        p = os.path.join(src_dir, f"b{i}.txt")
        with open(p, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))

    raw = spark.readStream.option("maxFilesPerTrigger", 1).text(src_dir)
    ev = parse_events(raw, ParserCfg()).select(
        "source_address", "timestamp"
    )
    panes = session_fire_early_panes(
        ev, key_col="source_address", ts_col="timestamp", gap="2 minutes"
    )
    name = f"panes_{uuid.uuid4().hex[:8]}"
    q = (
        panes.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.key, r.n_events, str(r.session_start))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # batch 1: two separate 1.2.3.4 sessions (150 s apart > 2 min gap)
    # + one 9.9.9.9 session; batch 2: the bridge merges the pair into
    # one 3-event session (ONE pane), and 9.9.9.9 stays silent
    assert got == {
        ("1.2.3.4", 1, "1970-01-01 01:00:00"),
        ("1.2.3.4", 1, "1970-01-01 01:02:30"),
        ("1.2.3.4", 3, "1970-01-01 01:00:00"),
        ("9.9.9.9", 1, "1970-01-01 01:00:05"),
    }
