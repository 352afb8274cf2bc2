"""Property test: the fixed-count ANN eval query sampler picks the
IDENTICAL id set (and order) in Spark and DuckDB for arbitrary
non-negative int64 id populations — the cross-engine determinism the
r9 `_query_sample` / `_QHASH_SQL` pair relies on (hash is pure int64
arithmetic with a pre-mod keeping every product below 2^63)."""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from foxsec_pipeline_spark.plans.catalog_quality import _QHASH_SQL, _qhash

IDS = st.lists(
    st.integers(min_value=0, max_value=2**62),
    min_size=1,
    max_size=60,
    unique=True,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=IDS, k=st.integers(min_value=1, max_value=20))
def test_query_sample_matches_duckdb(spark, ids, k):
    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    got = [
        r.vec_id
        for r in df.orderBy(
            _qhash(F.col("vec_id")).asc(), F.col("vec_id").asc()
        ).limit(k).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(vec_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    want = [
        r[0]
        for r in con.execute(
            f"SELECT vec_id FROM t ORDER BY {_QHASH_SQL}, vec_id LIMIT {k}"
        ).fetchall()
    ]
    assert got == want
