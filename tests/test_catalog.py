"""Every catalog query with an oracle must hash-match DuckDB on the
same parquet — the local twin of the driver's CORRECTNESS gate."""

import pytest

from foxsec_pipeline_spark.plans.catalog import registry

from tests.conftest import SF_DIR, assert_matches_oracle

SPECS = sorted(registry().values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, ddb, spec):
    df = spec.fn(spark, SF_DIR)
    assert df is not None
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors driver fallback
        return
    assert_matches_oracle(df, ddb, spec.oracle, name=spec.name)


def test_no_wide_integer_oracle_columns(ddb):
    """No oracle may emit a column wider than int64 (HUGEINT / UHUGEINT /
    DECIMAL(>18)): DuckDB silently widens sum(BIGINT) to int128, and the
    driver's value-hash canonicalizes int128 through a different dtype path
    than int64, producing hash-red rows even when every value matches (the
    r2-r4 `large_order_customers` / `embedding_cluster_summary` failures).
    Plan-time type check only — nothing is executed."""
    bad = []
    for spec in SPECS:
        if spec.oracle is None:
            continue
        rel = ddb.sql(spec.oracle)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            wide = t in ("HUGEINT", "UHUGEINT")
            if t.startswith("DECIMAL"):
                width = int(t.split("(")[1].split(",")[0])
                wide = wide or width > 18
            if wide:
                bad.append(f"{spec.name}.{col}: {t}")
    assert not bad, (
        "oracle columns wider than int64 (wrap in CAST(... AS BIGINT)): "
        + "; ".join(bad)
    )
