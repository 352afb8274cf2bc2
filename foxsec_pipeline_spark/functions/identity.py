"""Identity manager — alias->identity resolution and named subnets.

Reference: `identity/IdentityManager.java` (~370 LoC): a JSON config
mapping usernames/aliases from heterogeneous sources onto canonical
identities, plus named CIDR subnets and an AWS account-id map; loaded
process-wide and refreshed under a lock every 5 minutes
(`authprofile/AuthProfile.java:73-103`).

Spark-first shape: the config materializes as two tiny DataFrames
(alias dim, subnet dim) that broadcast-join into event streams.
Refresh = rebuild the dimension per micro-batch (`foreachBatch`), the
broadcast-variable analog of the reference's timed reload — no lock,
no shared mutable state.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .net import cidr_in_any


class IdentityPrefs:
    """Per-identity notification routing (`identity/Identity.java`):
    `notify` is the direct-to-user channel, `alert` the security-team
    channel; each carries an email/slack destination and a Method.
    should_*_via_* mirror Identity.java:81-125 — null prefs or null
    method mean "do not route directly" (the alert falls back to the
    global escalation address, Identity.java:27-38)."""

    def __init__(self, spec: dict):
        self.notify = spec.get("notify")
        self.alert = spec.get("alert")
        self.escalate_to = spec.get("escalate_to")

    @staticmethod
    def _via(prefs, method: str) -> bool:
        return bool(prefs) and prefs.get("method") == method

    def should_notify_via_email(self) -> bool:
        return self._via(self.notify, "EMAIL")

    def should_notify_via_slack(self) -> bool:
        return self._via(self.notify, "SLACK")

    def should_alert_via_email(self) -> bool:
        return self._via(self.alert, "EMAIL")

    def should_alert_via_slack(self) -> bool:
        return self._via(self.alert, "SLACK")

    def alert_email(self):
        return (self.alert or {}).get("email")

    def notify_email(self):
        return (self.notify or {}).get("email")


@dataclass
class IdentityManager:
    """Parsed identity config.

    `identities`: canonical identity -> list of known aliases.
    `named_subnets`: name -> list of CIDRs.
    `aws_accounts`: account id -> human name.
    `prefs`: canonical identity -> IdentityPrefs (notification
    routing, `identity/Identity.java`).
    """

    identities: dict[str, list[str]] = field(default_factory=dict)
    named_subnets: dict[str, list[str]] = field(default_factory=dict)
    aws_accounts: dict[str, str] = field(default_factory=dict)
    prefs: dict[str, IdentityPrefs] = field(default_factory=dict)

    @classmethod
    def from_json(cls, text: str) -> IdentityManager:
        cfg = json.loads(text)
        return cls(
            identities={
                ident: list(spec.get("aliases", []))
                for ident, spec in cfg.get("identities", {}).items()
            },
            prefs={
                ident: IdentityPrefs(spec)
                for ident, spec in cfg.get("identities", {}).items()
            },
            # a named subnet may be one CIDR string or a list
            # (identitymanager.json uses the scalar form:
            # "office": "fd00:0:0:0:0:0:0:0/48")
            named_subnets={
                name: [v] if isinstance(v, str) else list(v)
                for name, v in cfg.get("named_subnets", {}).items()
            },
            # the reference config key is "aws_account_map"
            # (identity/IdentityManager.java; verified against the
            # reference's identitymanager.json) — accept the old
            # "aws_accounts" spelling too
            aws_accounts=dict(
                cfg.get("aws_account_map", cfg.get("aws_accounts", {}))
            ),
        )

    def alias_dim(self, spark: SparkSession) -> DataFrame:
        """(alias, identity) dimension — broadcast side of the
        ExtractIdentity join (`AuthProfile.java:254-307`)."""
        rows = [
            (alias, ident)
            for ident, aliases in self.identities.items()
            for alias in aliases + [ident]
        ]
        return spark.createDataFrame(rows, "alias string, identity string")

    def resolve_identity(
        self, df: DataFrame, user_col: str, keep_unmatched: bool = True
    ) -> DataFrame:
        """Attach `identity` by broadcast alias lookup; unmatched users
        keep NULL identity (the reference routes those to an
        unmapped-identity leg)."""
        dim = self.alias_dim(df.sparkSession)
        how = "left" if keep_unmatched else "inner"
        return df.join(
            F.broadcast(dim), df[user_col] == dim["alias"], how
        ).drop("alias")

    def lookup_alias(self, user):
        """alias -> canonical identity (IdentityManager.lookupAlias:
        the identity name itself resolves too; unknown/empty/None ->
        None)."""
        if not user:
            return None
        for ident, aliases in self.identities.items():
            if user == ident or user in aliases:
                return ident
        return None

    def get_identity(self, ident):
        """canonical identity -> IdentityPrefs, None if unknown."""
        if ident not in self.identities:
            return None
        return self.prefs.get(ident) or IdentityPrefs({})

    def lookup_named_subnet(self, address):
        """address -> first named subnet containing it
        (IdentityManager.java:118-128); None for None/no-match,
        ValueError for a non-IP string like the reference's
        IllegalArgumentException."""
        if address is None:
            return None
        import ipaddress

        addr = ipaddress.ip_address(address)  # raises ValueError
        for name, cidrs in self.named_subnets.items():
            for c in cidrs:
                if addr in ipaddress.ip_network(c, strict=False):
                    return name
        return None

    def subnet_membership(self, ip: Column, name: str) -> Column:
        """ip ∈ the named subnet list (constant-folded CIDR math)."""
        cidrs = self.named_subnets.get(name, [])
        if not cidrs:
            return F.lit(False)
        return cidr_in_any(ip, cidrs)
