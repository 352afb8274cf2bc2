"""Real minFraud Insights client + reverse-DNS provider behind the
enrichment seams.

Reference: `Minfraud.java:96-170` (getInsights(ip, email) -> Insights
or null on ANY error — enrichment is best-effort, never fatal) and
`parser/Normalized.java:565-590` insightsEnrichment, which consumes
exactly: ip_address.risk plus the six traits booleans (anonymous /
anonymous_vpn / hosting_provider / legitimate_proxy / public_proxy /
tor_exit_node). The wire protocol is MaxMind's public minFraud v2
REST API: POST /minfraud/v2.0/insights with HTTP basic auth
(account_id:license_key) and a {"device": {"ip_address": ...}} body.
DNS reverse lookup (`CidrUtil.java:71` resolvedCanonicalHostMatches)
is stdlib socket.gethostbyaddr — a real resolver, no dependency.

Spark mapping matches the iprepd client: lookups run EXECUTOR-side
over a batch's distinct addresses (mapInPandas, one client per
partition), returning the broadcast dimension the enrich joins
consume. The reference caches per-process (`Minfraud.java:46`);
distinct-first is that cache, relationally.
"""

from __future__ import annotations

import base64
import json
import socket
import urllib.error
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MINFRAUD_TIMEOUT_SECONDS = 5.0

# the Normalized.java:578-586 field set, in dimension-column order
INSIGHTS_SCHEMA = (
    "object string, risk_score double, is_anonymous boolean, "
    "is_anonymous_vpn boolean, is_hosting_provider boolean, "
    "is_legitimate_proxy boolean, is_public_proxy boolean, "
    "is_tor_exit_node boolean"
)


class MinfraudClient:
    """minFraud Insights REST client (public v2 wire protocol),
    best-effort like the reference: any error returns None."""

    def __init__(
        self,
        account_id: str,
        license_key: str,
        endpoint: str = "https://minfraud.maxmind.com",
        timeout: float = MINFRAUD_TIMEOUT_SECONDS,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.timeout = timeout
        token = base64.b64encode(
            f"{account_id}:{license_key}".encode()
        ).decode("ascii")
        self._auth = f"Basic {token}"

    def get_insights(self, ip_address: str,
                     email: str | None = None) -> dict | None:
        """POST /minfraud/v2.0/insights -> parsed response dict, or
        None on any error (`Minfraud.java:104-140`: null ip -> null,
        network/parse failures -> null)."""
        if not ip_address:
            return None
        body: dict = {"device": {"ip_address": ip_address}}
        if email is not None:
            body["email"] = {"address": email}
        req = urllib.request.Request(
            f"{self.endpoint}/minfraud/v2.0/insights",
            data=json.dumps(body).encode("utf-8"),
            headers={
                "Authorization": self._auth,
                "Content-Type": "application/json",
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                if resp.status != 200:
                    return None
                return json.loads(resp.read())
        except (urllib.error.URLError, urllib.error.HTTPError, OSError,
                ValueError):
            return None

    def insights_row(self, ip_address: str) -> tuple:
        """(object, risk, 6 traits) — the Normalized.java:578-586
        projection; None fields when the lookup failed."""
        ir = self.get_insights(ip_address)
        if not isinstance(ir, dict):
            return (ip_address, None, None, None, None, None, None, None)
        ipa = ir.get("ip_address") or {}
        traits = ipa.get("traits") or {}
        return (
            ip_address,
            ipa.get("risk"),
            traits.get("is_anonymous"),
            traits.get("is_anonymous_vpn"),
            traits.get("is_hosting_provider"),
            traits.get("is_legitimate_proxy"),
            traits.get("is_public_proxy"),
            traits.get("is_tor_exit_node"),
        )


def minfraud_insights_provider(
    account_id: str,
    license_key: str,
    endpoint: str = "https://minfraud.maxmind.com",
):
    """Provider: distinct addresses -> executor-side Insights lookups
    -> broadcastable dimension with the Normalized field set."""

    def provider(spark: SparkSession, objects: DataFrame) -> DataFrame:
        def op(batches):
            import pandas as pd

            client = MinfraudClient(account_id, license_key, endpoint)
            cols = [c.split()[0] for c in INSIGHTS_SCHEMA.split(", ")]
            for pdf in batches:
                rows = [client.insights_row(v) for v in pdf["object"]]
                yield pd.DataFrame(rows, columns=cols)

        return objects.select(F.col("object").cast("string")).mapInPandas(
            op, INSIGHTS_SCHEMA
        )

    return provider


def enrich_insights(df: DataFrame, addr_col: str, provider) -> DataFrame:
    """Attach the risk score + traits columns per row
    (`Normalized.java:565-590`; nulls where the lookup failed —
    enrichment never drops rows)."""
    spark = df.sparkSession
    objects = df.select(F.col(addr_col).alias("object")).distinct()
    dim = provider(spark, objects)
    return df.join(
        F.broadcast(dim), df[addr_col] == dim["object"], "left"
    ).drop("object")


def dns_hostname_provider(spark: SparkSession,
                          objects: DataFrame) -> DataFrame:
    """REAL reverse-DNS provider (`CidrUtil.java:71`
    resolvedCanonicalHostMatches): socket.gethostbyaddr executor-side
    over the distinct addresses; unresolvable addresses get a null
    hostname (the reference treats resolution failure as no-match).
    Drop-in for `enrich_hostname`'s provider parameter."""

    def op(batches):
        import pandas as pd

        def resolve(addr: str):
            try:
                return socket.gethostbyaddr(addr)[0]
            except (OSError, UnicodeError):
                return None

        for pdf in batches:
            yield pd.DataFrame({
                "object": pdf["object"],
                "hostname": [resolve(v) for v in pdf["object"]],
            })

    return objects.select(F.col("object").cast("string")).mapInPandas(
        op, "object string, hostname string"
    )
