"""GeoIP enrichment — mapInPandas over a per-partition-shared reader.

Reference: `parser/GeoIP.java` (MaxMind city/ISP mmdb lookups attached
to normalized events) with deferred resolution
(`parser/ParserCfg.java` deferGeoIpResolution, `Normalized.java:174-191`
— skip lookups for events later filtered away). The Spark analog of
"deferred" is simply placing this enrichment *after* the filters in
the plan; Catalyst never evaluates it for dropped rows.

The real MaxMind reader (`maxminddb` package) is gated behind an
import-try (not in this container). The deterministic fallback derives
a stable fake (lat, lon, city, isp) from the IP's integer value, so
the plumbing — Arrow batching, one reader per partition, schema —
is real and tested; swapping in the mmdb file changes only
`_open_reader`.

Scale: the reader opens once per partition (not per row); lookups are
pure CPU against an mmap'd file broadcast to executors via
SparkFiles/--files. No shuffle; enrichment is a projection stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

GEO_SCHEMA_FIELDS = [
    T.StructField("geo_lat", T.DoubleType()),
    T.StructField("geo_lon", T.DoubleType()),
    T.StructField("geo_city", T.StringType()),
    T.StructField("geo_country", T.StringType()),
    T.StructField("geo_isp", T.StringType()),
    T.StructField("geo_asn", T.LongType()),
    T.StructField("geo_as_org", T.StringType()),
]


def _ipv4_int(ip: str) -> int | None:
    try:
        a, b, c, d = (int(x) for x in ip.split("."))
        return (a << 24) | (b << 16) | (c << 8) | d
    except (ValueError, AttributeError):
        return None


class _FakeReader:
    """Deterministic stand-in for a maxminddb.Reader: stable synthetic
    geo attributes derived from the address integer."""

    def get(self, ip: str) -> dict | None:
        n = _ipv4_int(ip)
        if n is None:
            return None
        return {
            "location": {
                "latitude": round((n * 37 % 18000) / 100.0 - 90.0, 4),
                "longitude": round((n * 73 % 36000) / 100.0 - 180.0, 4),
            },
            "city": {"names": {"en": f"city-{n % 256}"}},
            "country": {"iso_code": f"X{n % 26 + 65:c}"},
            "isp": f"isp-{n % 32}",
            # GeoIP2-ISP record fields (maxminddb returns these keys)
            "autonomous_system_number": 64512 + n % 1024,
            "autonomous_system_organization": f"as-org-{n % 32}",
        }

    def close(self) -> None:
        pass


def _open_reader(mmdb_path: str | None):
    if mmdb_path is None:
        return _FakeReader()
    try:
        import maxminddb  # noqa: PLC0415 (gated optional dep)

        return maxminddb.open_database(mmdb_path)
    except ImportError:
        return _FakeReader()


def enrich_geoip(
    df: DataFrame,
    ip_col: str = "source_address",
    mmdb_path: str | None = None,
    isp_mmdb_path: str | None = None,
) -> DataFrame:
    """Append geo columns to a DataFrame by mmdb lookup on `ip_col`.

    Mirrors `parser/GeoIP.java`'s two-database split: the city db
    supplies location/city/country, the (optional) ISP db supplies the
    isp string. Place AFTER filters (deferred-resolution parity). One
    reader pair per Arrow batch iterator = per partition.
    """
    out_schema = T.StructType(list(df.schema.fields) + GEO_SCHEMA_FIELDS)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        reader = _open_reader(mmdb_path)
        isp_reader = _open_reader(isp_mmdb_path) if (
            isp_mmdb_path or mmdb_path is None
        ) else None
        try:
            for pdf in batches:
                recs = [reader.get(ip) for ip in pdf[ip_col]]
                isp_recs = (
                    [isp_reader.get(ip) for ip in pdf[ip_col]]
                    if isp_reader is not None
                    else [None] * len(recs)
                )
                pdf = pdf.copy()
                pdf["geo_lat"] = [
                    (r or {}).get("location", {}).get("latitude") for r in recs
                ]
                pdf["geo_lon"] = [
                    (r or {}).get("location", {}).get("longitude") for r in recs
                ]
                pdf["geo_city"] = [
                    (r or {}).get("city", {}).get("names", {}).get("en") for r in recs
                ]
                pdf["geo_country"] = [
                    (r or {}).get("country", {}).get("iso_code") for r in recs
                ]
                pdf["geo_isp"] = [(r or {}).get("isp") for r in isp_recs]
                pdf["geo_asn"] = [
                    (r or {}).get("autonomous_system_number") for r in isp_recs
                ]
                pdf["geo_as_org"] = [
                    (r or {}).get("autonomous_system_organization")
                    for r in isp_recs
                ]
                yield pdf
        finally:
            reader.close()
            if isp_reader is not None:
                isp_reader.close()

    return df.mapInPandas(op, out_schema)
