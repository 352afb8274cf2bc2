"""Unit tests for the scalar function library and predicate DSL —
covers semantics the oracle gate can't see (edge inputs, error paths).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from foxsec_pipeline_spark.filters.event_filter import (
    apply_event_filter,
    compile_event_filter,
)
from foxsec_pipeline_spark.functions.geo import haversine_km
from foxsec_pipeline_spark.functions.net import (
    cidr_in_any,
    exclude_cidrs,
    ipv4_aton,
    xff_select_client,
)
from foxsec_pipeline_spark.functions.text import (
    levenshtein_ratio,
    normalize_email,
    word_shingles,
)


def test_ipv4_aton(spark):
    df = spark.createDataFrame([Row(ip="10.0.0.1"), Row(ip="255.255.255.255")])
    got = [r[0] for r in df.select(ipv4_aton(F.col("ip"))).collect()]
    assert got == [167772161, 4294967295]


def test_cidr_membership(spark):
    df = spark.createDataFrame(
        [Row(ip="10.1.2.3"), Row(ip="172.16.0.1"), Row(ip="8.8.8.8")]
    )
    kept = exclude_cidrs(df, "ip").collect()  # default RFC1918
    assert [r.ip for r in kept] == ["8.8.8.8"]
    hit = df.where(cidr_in_any(F.col("ip"), ["8.8.8.0/24"])).collect()
    assert [r.ip for r in hit] == ["8.8.8.8"]


def test_ipv4_aton_validates_octets(spark):
    # '1.2.3.400' must NOT alias into 1.2.4.x (CidrUtil validates via
    # InetAddresses.isInetAddress); malformed -> NULL
    df = spark.createDataFrame(
        [Row(ip="1.2.3.400"), Row(ip="evil.example.com"), Row(ip="1.2.3"),
         Row(ip="01.2.3.4"), Row(ip="1.2.3.4")]
    )
    got = [r[0] for r in df.select(ipv4_aton(F.col("ip"))).collect()]
    assert got == [None, None, None, None, 16909060]


def test_exclude_cidrs_null_safe(spark):
    # IPv6 / hostname / multi-hop sources must be KEPT by an IPv4
    # exclusion list (membership NULL != match), not silently dropped
    df = spark.createDataFrame(
        [Row(ip="10.0.0.1"), Row(ip="2001:db8::1"),
         Row(ip="host.example"), Row(ip="1.2.3.4, 5.6.7.8")]
    )
    kept = [r.ip for r in exclude_cidrs(df, "ip", ["10.0.0.0/8"]).collect()]
    assert kept == ["2001:db8::1", "host.example", "1.2.3.4, 5.6.7.8"]


def test_ipv6_cidr_membership(spark):
    from foxsec_pipeline_spark.functions.net import cidr_in_any_strict

    df = spark.createDataFrame(
        [Row(ip="2001:db8::1"), Row(ip="2001:db8:0:0:0:0:0:1"),
         Row(ip="2001:db9::1"), Row(ip="fe80::2"), Row(ip="10.0.0.1")]
    )
    hit = [
        r.ip
        for r in df.where(
            cidr_in_any_strict(F.col("ip"), ["2001:db8::/32"])
        ).collect()
    ]
    assert hit == ["2001:db8::1", "2001:db8:0:0:0:0:0:1"]
    # mixed v4+v6 exclusion list: each family matched by its own nets
    both = [
        r.ip
        for r in df.where(
            cidr_in_any_strict(F.col("ip"), ["2001:db8::/32", "10.0.0.0/8"])
        ).collect()
    ]
    assert both == ["2001:db8::1", "2001:db8:0:0:0:0:0:1", "10.0.0.1"]


def test_xff_selection(spark):
    # client, untrusted proxy, trusted LB: trusted entries skipped
    # right-to-left (Parser.java:164-238 semantics)
    df = spark.createDataFrame(
        [Row(xff="203.0.113.7, 198.51.100.9, 10.0.0.1")]
    )
    got = df.select(
        xff_select_client(F.col("xff"), ["10.0.0.0/8"]).alias("c")
    ).collect()[0].c
    assert got == "198.51.100.9"
    # all trusted -> fall back to LAST entry (Parser.java:191:
    # 'return parts[parts.length - 1]')
    df2 = spark.createDataFrame([Row(xff="10.0.0.2, 10.0.0.1")])
    got2 = df2.select(
        xff_select_client(F.col("xff"), ["10.0.0.0/8"]).alias("c")
    ).collect()[0].c
    assert got2 == "10.0.0.1"
    # no trusted list -> last entry
    got3 = df.select(xff_select_client(F.col("xff")).alias("c")).collect()[0].c
    assert got3 == "10.0.0.1"


def test_haversine_known_distance(spark):
    # London -> Paris ~ 343-344 km
    df = spark.createDataFrame([Row(a=51.5074, b=-0.1278, c=48.8566, d=2.3522)])
    km = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()[0].km
    assert 340 < km < 348


def test_levenshtein_ratio_and_email(spark):
    df = spark.createDataFrame([Row(a="kitten", b="sitting", e="Bob+Spam@Mail.com")])
    r = df.select(
        levenshtein_ratio(F.col("a"), F.col("b")).alias("r"),
        normalize_email(F.col("e")).alias("e"),
    ).collect()[0]
    assert abs(r.r - 3 / 7) < 1e-9
    assert r.e == "bob@mail.com"


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([Row(t="one two"), Row(t="a b c d")])
    got = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()
    assert got[0].s == []
    assert got[1].s == ["a b c", "b c d"]


def test_event_filter_except_and_or(spark):
    df = spark.createDataFrame(
        [
            Row(event_type="error", value=5.0, user_id=3),
            Row(event_type="error", value=5.0, user_id=30),
            Row(event_type="click", value=5.0, user_id=30),
            Row(event_type="error", value=99.0, user_id=30),
        ]
    )
    spec = {
        "rules": [
            {
                "types": ["error"],
                "matchers": [{"field": "value", "op": "range", "min": 0, "max": 10}],
                "except": [
                    {"matchers": [{"field": "user_id", "op": "le", "value": 9}]}
                ],
            }
        ]
    }
    got = apply_event_filter(df, spec, type_field="event_type").collect()
    assert [(r.event_type, r.user_id) for r in got] == [("error", 30)]

    or_spec = {
        "rules": [
            {
                "matchers_or": [
                    {"field": "user_id", "op": "eq", "value": 3},
                    {"field": "value", "op": "gt", "value": 50.0},
                ]
            }
        ]
    }
    got2 = apply_event_filter(df, or_spec).count()
    assert got2 == 2


def test_event_filter_bad_op_raises():
    with pytest.raises(ValueError, match="unknown matcher op"):
        compile_event_filter({"rules": [{"matchers": [{"field": "x", "op": "nope"}]}]})


def test_empty_filter_passes_all(spark):
    df = spark.createDataFrame([Row(x=1), Row(x=2)])
    assert apply_event_filter(df, {"rules": []}).count() == 2
