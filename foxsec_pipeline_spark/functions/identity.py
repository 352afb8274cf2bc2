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


@dataclass
class IdentityManager:
    """Parsed identity config.

    `identities`: canonical identity -> list of known aliases.
    `named_subnets`: name -> list of CIDRs.
    `aws_accounts`: account id -> human name.
    """

    identities: dict[str, list[str]] = field(default_factory=dict)
    named_subnets: dict[str, list[str]] = field(default_factory=dict)
    aws_accounts: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_json(cls, text: str) -> IdentityManager:
        cfg = json.loads(text)
        return cls(
            identities={
                ident: list(spec.get("aliases", []))
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

    def subnet_membership(self, ip: Column, name: str) -> Column:
        """ip ∈ the named subnet list (constant-folded CIDR math)."""
        cidrs = self.named_subnets.get(name, [])
        if not cidrs:
            return F.lit(False)
        return cidr_in_any(ip, cidrs)
