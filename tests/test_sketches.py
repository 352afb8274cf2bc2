"""Sketch-family evidence: approx distinct / approx quantile outputs
have no cross-engine oracle (sketches are engine-specific by nature),
so the accuracy claim is asserted here instead — approx vs the exact
columns computed in the same query, and the exact columns vs DuckDB.
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
    medians = dict(
        ddb.sql(
            "SELECT event_type, median(value) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(rows) == set(exact)
    for et, r in rows.items():
        # ground-truth column must agree with DuckDB exactly
        assert r["n_exact"] == exact[et], (et, r["n_exact"], exact[et])
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(r["n_approx"] - r["n_exact"]) <= max(
            3, 0.06 * r["n_exact"]
        ), (et, r["n_approx"], r["n_exact"])
        # percentile_approx with accuracy 10000 on small groups is
        # near-exact; allow a loose band vs the true median
        assert abs(r["median_value_approx"] - medians[et]) <= max(
            0.5, 0.05 * abs(medians[et])
        ), (et, r["median_value_approx"], medians[et])
