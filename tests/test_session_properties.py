"""Property test: the row-level `sessionize` (lag/cumsum) and Spark's
`session_window` grouping assign identical sessions — the duality the
sessionized DuckDB oracles rely on."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from foxsec_pipeline_spark.operators import session_analysis
from foxsec_pipeline_spark.operators.customs import sessionize

EVENTS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=36_000),  # seconds offset
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS)
def test_sessionize_matches_session_window(spark, events):
    rows = [
        Row(k=k, ts=f"2024-01-01 {s // 3600:02d}:{s % 3600 // 60:02d}:{s % 60:02d}")
        for k, s in events
    ]
    df = (
        spark.createDataFrame(rows)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    via_window = {
        (r.k, str(r.first_ts), str(r.last_ts), r.n_events)
        for r in session_analysis(df, key="k", ts="ts", gap="30 minutes").collect()
    }
    via_rows = {
        (r.k, str(r.first_ts), str(r.last_ts), r.n_events)
        for r in (
            sessionize(df, key="k", ts="ts", gap="30 minutes")
            .groupBy("k", "session_id")
            .agg(
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .collect()
        )
    }
    assert via_window == via_rows
