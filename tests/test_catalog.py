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
