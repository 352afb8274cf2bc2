"""Sketch-family evidence: approx distinct / approx quantile outputs
have no cross-engine oracle (sketches are engine-specific by nature),
so the query emits bound-check BOOLEANS instead of raw sketch values —
the oracle emits constant TRUE, making the driver hash-match itself the
accuracy gate. This test asserts the same thing locally plus the exact
ground-truth column against DuckDB.
"""

from foxsec_pipeline_spark.plans.catalog import registry

from tests.conftest import SF_DIR


def test_sketch_distinct_within_documented_error(spark, ddb):
    df = registry()["sketch_distinct_users"].fn(spark, SF_DIR)
    rows = {r["event_type"]: r for r in df.collect()}
    assert rows, "sketch query returned no groups"
    exact = dict(
        ddb.sql(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(rows) == set(exact)
    for et, r in rows.items():
        # ground-truth column must agree with DuckDB exactly
        assert r["n_exact"] == exact[et], (et, r["n_exact"], exact[et])
        # the bound-check booleans ARE the sketch-accuracy claims:
        # HLL++ rsd=0.02 within 3 sigma, approx-median rank within 1%
        assert r["hll_within_3rsd"] is True, (et, dict(r.asDict()))
        assert r["median_rank_ok"] is True, (et, dict(r.asDict()))
