"""HTTPRequest pipeline assembly: toggled heuristics over one parsed
stream -> flattened alerts (the reference's flagship DAG, §3.1)."""

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from foxsec_pipeline_spark.parser.parse import ParserCfg, parse_events
from foxsec_pipeline_spark.plans.httprequest_pipeline import (
    HTTPRequestToggles,
    assemble_httprequest,
)


def _glb(second: int, ip: str, status: int = 200, ua: str = "ok-agent"):
    return json.dumps(
        {
            "timestamp": f"1970-01-01T00:00:{second:02d}.000Z",
            "resource": {"labels": {"project_id": "p"}},
            "jsonPayload": {"@type": "type.googleapis.com/google.cloud"
                            ".loadbalancing.type.LoadBalancerLogEntry"},
            "httpRequest": {
                "remoteIp": ip,
                "requestMethod": "GET",
                "requestUrl": "https://h.example.com/x",
                "status": status,
                "userAgent": ua,
            },
        }
    )


def test_assembled_pipeline_multi_leg(spark):
    lines = (
        # 10.0.0.1: 12 client errors in the minute -> error_rate leg
        [_glb(s, "10.0.0.1", status=404) for s in range(12)]
        # 10.0.0.2: 25 requests -> hard_limit leg (limit 20)
        + [_glb(s, "10.0.0.2") for s in range(25)]
        # 10.0.0.3: blocklisted UA -> ua_blocklist leg
        + [_glb(40, "10.0.0.3", ua="sqlmap/1.7")]
    )
    raw = spark.createDataFrame([Row(value=ln) for ln in lines])
    events = parse_events(raw, ParserCfg(), now="1970-01-01 00:05:00")

    toggles = HTTPRequestToggles(
        enable_hard_limit_analysis=True,
        enable_error_rate_analysis=True,
        enable_ua_blocklist_analysis=True,
        hard_limit_count=20,
        max_client_errors=10,
        ua_blocklist=["sqlmap"],
    )
    alerts = assemble_httprequest(events.cache(), toggles,
                                  monitored_resource="svc-a")
    rows = alerts.collect()
    by_sub = {}
    for r in rows:
        by_sub.setdefault(r.subcategory, []).append(r)

    assert set(by_sub) == {"hard_limit", "error_rate", "ua_blocklist"}
    assert by_sub["error_rate"][0].metadata["source_address"] == "10.0.0.1"
    assert by_sub["hard_limit"][0].metadata["source_address"] == "10.0.0.2"
    assert by_sub["ua_blocklist"][0].metadata["source_address"] == "10.0.0.3"
    assert all(r.category == "httprequest" for r in rows)
    assert all(r.metadata["monitored_resource"] == "svc-a" for r in rows)
    # alert schema is uniform across legs (unionByName contract)
    assert alerts.columns == [
        "alert_id", "timestamp", "category", "subcategory", "severity",
        "summary", "notify_merge", "metadata",
    ]


def test_assembled_pipeline_requires_a_leg(spark):
    import pytest

    df = spark.range(1)
    with pytest.raises(ValueError):
        assemble_httprequest(df, HTTPRequestToggles())
