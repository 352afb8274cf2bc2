"""Storage bucketing: the co-located join actually skips the shuffle.

Asserts the load-bearing physical property behind SCALE.md's
"bucketing for co-located joins" posture: joining two tables bucketed
on the same key with the same bucket count plans with ZERO Exchange
(and, with sortBy, zero per-task Sort), while the identical join over
plain parquet shuffles both sides.
"""

import contextlib
import io

from pyspark.sql import functions as F

from foxsec_pipeline_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark):
    # tables land in the session warehouse dir (static conf); unique
    # names + DROP in finally keep the run re-entrant
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = events.select("user_id", "event_type", "value")
    right = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # baseline: plain-parquet join shuffles both sides
        base = left.join(right, "user_id")
        assert "Exchange" in plan_of(base)

        write_bucketed(left, "bkt_left", key="user_id", buckets=8)
        write_bucketed(right, "bkt_right", key="user_id", buckets=8)
        bl = read_bucketed(spark, "bkt_left")
        br = read_bucketed(spark, "bkt_right")
        joined = bl.join(br, "user_id")
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        # values identical to the unbucketed join
        a = sorted(map(tuple, base.collect()))
        b = sorted(map(tuple, joined.collect()))
        assert a == b
        # aggregation on the bucket key is also exchange-free
        agg = bl.groupBy("user_id").agg(F.sum("value").alias("s"))
        assert "Exchange" not in plan_of(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """A predicate on the partition column must appear as a
    PartitionFilter in the scan (directory prune) — NOT a pushed data
    filter — and the pruned read returns exactly the matching rows.
    (`df.inputFiles()` lists files BEFORE pruning, so the plan line is
    the only honest assertion.)"""
    from foxsec_pipeline_spark.sources.bucketing import write_partitioned

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dated = events.withColumn("event_date", F.to_date("ts"))
    path = str(tmp_path / "events_by_date")
    write_partitioned(dated, path, ["event_date"])

    back = spark.read.parquet(path)
    one_day = back.where(F.col("event_date") == "2024-01-05")
    plan = plan_of(one_day)
    assert "PartitionFilters" in plan
    # the date predicate prunes partitions; it must NOT degrade into a
    # post-scan data filter on event_date
    scan_block = plan[plan.index("PartitionFilters"):]
    assert "event_date" in scan_block.split("PushedFilters")[0]
    expected = dated.where(F.col("event_date") == "2024-01-05").count()
    assert one_day.count() == expected > 0
