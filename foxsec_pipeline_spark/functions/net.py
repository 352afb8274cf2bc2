"""Network functions — IPv4 math, CIDR membership, XFF selection.

Reference: `CidrUtil.java:126-244` + radix tree `InetRadix.java:7-136`
(CIDR exclusion lists: file lists, cloud-provider ranges, RFC1918);
`parser/Parser.java:164-293` (X-Forwarded-For client selection given
trusted-proxy CIDRs).

The reference walks a radix tree per event in Java. Here IPv4 CIDR
membership is pure integer SQL (aton + mask compare) evaluated inside
whole-stage codegen — no UDF, no broadcast needed for small prefix
lists because the OR-chain constant-folds. For large prefix sets, use
`cidr_join` which joins on a /16 bucket so the probe stays an
equi-join (scales to millions of prefixes).
"""

from __future__ import annotations

import ipaddress
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RFC1918 = ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16"]


def ipv4_aton(ip: Column) -> Column:
    """Dotted-quad string -> int64 (CidrUtil's addressToLong analog)."""
    p = F.split(ip, r"\.")
    return (
        p.getItem(0).cast("long") * F.lit(16777216)
        + p.getItem(1).cast("long") * F.lit(65536)
        + p.getItem(2).cast("long") * F.lit(256)
        + p.getItem(3).cast("long")
    )


def cidr_contains(ip: Column, cidr: str) -> Column:
    """ip ∈ cidr as a constant-folded integer compare."""
    net = ipaddress.ip_network(cidr, strict=False)
    lo = int(net.network_address)
    hi = int(net.broadcast_address)
    a = ipv4_aton(ip)
    return (a >= F.lit(lo)) & (a <= F.lit(hi))


def cidr_in_any(ip: Column, cidrs: list[str]) -> Column:
    """ip ∈ any of cidrs (CidrUtil.java:126-185 exclusion semantics)."""
    return reduce(lambda a, b: a | b, [cidr_contains(ip, c) for c in cidrs])


def exclude_cidrs(df: DataFrame, ip_col: str, cidrs: list[str] | None = None) -> DataFrame:
    """Drop rows whose source address is inside any listed CIDR —
    the HTTPRequest element filter (`HTTPRequestElementFilter.java:33-51`)."""
    return df.where(~cidr_in_any(F.col(ip_col), cidrs or RFC1918))


def cidr_join(df: DataFrame, ip_col: str, prefixes: DataFrame) -> DataFrame:
    """Membership against a large prefix table via equi-join.

    `prefixes` must have (lo: long, hi: long, bucket16: int) where
    bucket16 = lo >> 16 .. hi >> 16 expanded (one row per /16 the
    range covers; ranges wider than /16 expand, which is bounded and
    tiny for real exclusion lists). The probe side computes its /16
    bucket and equi-joins, then range-filters — a broadcast hash join
    for any realistic prefix list, never a cartesian.
    """
    a = ipv4_aton(F.col(ip_col))
    probed = df.withColumn("__ipa", a).withColumn(
        "__b16", (F.col("__ipa") / F.lit(65536)).cast("long")
    )
    hit = probed.join(
        F.broadcast(prefixes),
        (probed["__b16"] == prefixes["bucket16"])
        & (probed["__ipa"] >= prefixes["lo"])
        & (probed["__ipa"] <= prefixes["hi"]),
        "left_semi",
    )
    return hit.drop("__ipa", "__b16")


def xff_select_client(
    xff: Column, trusted_cidrs: list[str] | None = None
) -> Column:
    """Pick the client IP from an X-Forwarded-For chain
    (`parser/Parser.java:164-238`).

    Semantics: entries are comma-separated, rightmost is nearest
    proxy. Walking right-to-left, skip entries inside trusted-proxy
    CIDRs; the first non-trusted entry is the client. With no trusted
    list, take the last entry (reference default: second-from-right
    when behind one LB, expressed by passing the LB range).
    """
    arr = F.transform(F.split(xff, r"\s*,\s*"), lambda s: F.trim(s))
    if not trusted_cidrs:
        return F.element_at(arr, -1)
    trusted = lambda c: cidr_in_any(c, trusted_cidrs)  # noqa: E731
    untrusted = F.filter(arr, lambda s: ~trusted(s))
    # last untrusted entry, else leftmost overall (try_: empty array
    # must yield NULL for the coalesce, not an index error)
    return F.coalesce(F.try_element_at(untrusted, F.lit(-1)), F.element_at(arr, 1))
