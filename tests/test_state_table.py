"""Persistent shared-state table: the cross-JOB state contract
(SURVEY §7 hard part 2 — CustomsStatusComparator writes what
CustomsLoginFailureForAtRiskAccount reads, via Datastore in the
reference, via parquet snapshots + idempotent merge here)."""

import os
import threading

import pytest
from pyspark.sql import functions as F

from foxsec_pipeline_spark.streaming.state_table import (
    AT_RISK_SCHEMA,
    StateTable,
    StateTableError,
    at_risk_state_table,
)

from tests.conftest import SF_DIR


def _tbl(tmp_path, **kw):
    return StateTable(
        str(tmp_path / "state"),
        key_cols=["email"],
        seq_cols=["scanned_at"],
        tie_cols=["scanned_by"],
        **kw,
    )


def test_merge_last_writer_wins(spark, tmp_path):
    t = _tbl(tmp_path)
    t.merge(spark.createDataFrame(
        [("a@x", "1.1.1.1", "2024-01-01"), ("b@x", "2.2.2.2", "2024-01-02")],
        "email string, scanned_by string, scanned_at string",
    ))
    t.merge(spark.createDataFrame(
        [("a@x", "9.9.9.9", "2024-02-01"),   # newer -> wins
         ("b@x", "0.0.0.0", "2024-01-01")],  # older -> loses
        "email string, scanned_by string, scanned_at string",
    ))
    got = {r.email: (r.scanned_by, r.scanned_at)
           for r in t.read(spark).collect()}
    assert got == {
        "a@x": ("9.9.9.9", "2024-02-01"),
        "b@x": ("2.2.2.2", "2024-01-02"),
    }
    # equal seq -> ascending tie column wins, deterministically
    t.merge(spark.createDataFrame(
        [("b@x", "1.0.0.0", "2024-01-02")],
        "email string, scanned_by string, scanned_at string",
    ))
    got = {r.email: r.scanned_by for r in t.read(spark).collect()}
    assert got["b@x"] == "1.0.0.0"  # min("1.0.0.0", "2.2.2.2")


def test_merge_incremental_equals_oneshot(spark, tmp_path):
    """Associativity: merging deltas one at a time must equal one
    merge of their union — the property that makes foreachBatch
    micro-batch merges converge to the batch state."""
    rows = [
        (f"u{i % 7}@x", f"{i}.0.0.1", f"2024-01-{(i % 27) + 1:02d}")
        for i in range(40)
    ]
    schema = "email string, scanned_by string, scanned_at string"
    inc = _tbl(tmp_path / "inc")
    for lo in range(0, 40, 10):
        inc.merge(spark.createDataFrame(rows[lo:lo + 10], schema))
    one = _tbl(tmp_path / "one")
    one.merge(spark.createDataFrame(rows, schema))
    a = sorted(map(tuple, inc.read(spark).collect()))
    b = sorted(map(tuple, one.read(spark).collect()))
    assert a == b


def test_merge_idempotent_replay(spark, tmp_path):
    """foreachBatch replays the last batch after a restart; the
    committed-batch watermark must make the replay a no-op."""
    t = _tbl(tmp_path)
    d = spark.createDataFrame(
        [("a@x", "1.1.1.1", "2024-01-01")],
        "email string, scanned_by string, scanned_at string",
    )
    assert t.merge(d, job_id="j", batch_id=0) is True
    v1 = t.version()
    assert t.merge(d, job_id="j", batch_id=0) is False  # replay
    assert t.version() == v1
    assert t.merge(d, job_id="j", batch_id=1) is True   # next batch
    # a DIFFERENT job's batch 0 is not deduped by job j's watermark
    assert t.merge(d, job_id="k", batch_id=0) is True


def test_read_empty_requires_schema(spark, tmp_path):
    t = _tbl(tmp_path)
    with pytest.raises(StateTableError):
        t.read(spark)
    df = t.read(spark, schema=AT_RISK_SCHEMA)
    assert df.count() == 0 and "email" in df.columns


def test_writer_lock_times_out_loudly(spark, tmp_path):
    t = _tbl(tmp_path, lock_timeout=0.2)
    os.makedirs(t.path, exist_ok=True)
    with open(os.path.join(t.path, "_LOCK"), "w") as f:
        f.write("held")
    with pytest.raises(StateTableError, match="lock"):
        t.merge(spark.createDataFrame(
            [("a@x", "1.1.1.1", "2024-01-01")],
            "email string, scanned_by string, scanned_at string",
        ))
    os.unlink(os.path.join(t.path, "_LOCK"))


def test_concurrent_writers_serialize(spark, tmp_path):
    """Two threads merging disjoint keys through the same table: the
    lock serializes them and both writes land."""
    t = _tbl(tmp_path, lock_timeout=30.0)
    schema = "email string, scanned_by string, scanned_at string"
    errs = []

    def writer(tag):
        try:
            t.merge(spark.createDataFrame(
                [(f"{tag}@x", "1.1.1.1", "2024-01-01")], schema))
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    th = [threading.Thread(target=writer, args=(s,)) for s in "ab"]
    [x.start() for x in th]
    [x.join() for x in th]
    assert not errs
    assert {r.email for r in t.read(spark).collect()} == {"a@x", "b@x"}


def test_snapshot_pruning_keeps_recent(spark, tmp_path):
    t = _tbl(tmp_path, keep_versions=2)
    schema = "email string, scanned_by string, scanned_at string"
    for i in range(5):
        t.merge(spark.createDataFrame(
            [("a@x", f"{i}.0.0.0", f"2024-01-0{i + 1}")], schema))
    vers = sorted(
        n for n in os.listdir(t.path) if n.startswith("v=")
    )
    assert vers == ["v=00000004", "v=00000005"]
    assert t.read(spark).collect()[0].scanned_by == "4.0.0.0"


def test_cross_job_at_risk_handoff(spark, tmp_path):
    """The reference semantics end-to-end: job A (status comparator,
    its OWN streaming query + checkpoint) persists email->ScannedBy
    state through foreachBatch merge; job B — a separately-built
    streaming query on a SEPARATE SparkSession that shares ONLY the
    state-table directory — alerts on login failures for stored
    accounts. B's alerts must equal the in-plan composition
    (status_comparator_state -> login_failure_for_at_risk_account)
    over the same events."""
    from foxsec_pipeline_spark.operators.customs import status_comparator
    from foxsec_pipeline_spark.operators.detectors import (
        login_failure_for_at_risk_account,
        status_comparator_state,
    )

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type")
    )
    table = at_risk_state_table(str(tmp_path / "lfara"))

    # ---- job A: comparator hits -> state table (foreachBatch merge)
    src_a = str(tmp_path / "src_a")
    ev.write.parquet(src_a)
    stream_a = (
        spark.readStream.schema(ev.schema).parquet(src_a)
    )

    def write_state(batch_df, batch_id):
        comp = status_comparator(
            batch_df, key="user_id",
            scan_predicate=F.col("event_type") == "view",
            failure_predicate=F.col("event_type") == "error",
            ts="ts", duration="1 day", min_scans=2, min_failures=1,
        ).withColumn(
            "scanned_by",
            F.concat(F.lit("10."), (F.col("user_id") % 32).cast("string"),
                     F.lit(".0.1")),
        ).select(
            F.col("user_id").cast("string").alias("email"),
            "scanned_by",
            F.col("window_start").alias("scanned_at"),
        )
        table.merge(comp, job_id="status-comparator", batch_id=batch_id)

    qa = (
        stream_a.writeStream.foreachBatch(write_state)
        .option("checkpointLocation", str(tmp_path / "ckpt_a"))
        .trigger(availableNow=True)
        .start()
    )
    qa.awaitTermination(120)
    assert table.version() >= 1

    # ---- job B: separate session, separate checkpoint; only the
    # state-table path is shared (the Datastore-kind analog)
    spark_b = spark.newSession()
    spark_b.conf.set("spark.sql.shuffle.partitions", "8")
    state_b = table.read(spark_b)
    alerts_b = []

    def alert_on_failures(batch_df, batch_id):
        out = login_failure_for_at_risk_account(
            batch_df, state_b, account_col="__email",
            failure_predicate=F.col("event_type") == "error", ts="ts",
        ).select("event_id", "user_id", "scanned_by", "scanned_at")
        alerts_b.extend(map(tuple, out.collect()))

    ev_b = (
        spark_b.readStream.schema(ev.schema).parquet(src_a)
        .withColumn("__email", F.col("user_id").cast("string"))
    )
    qb = (
        ev_b.writeStream.foreachBatch(alert_on_failures)
        .option("checkpointLocation", str(tmp_path / "ckpt_b"))
        .trigger(availableNow=True)
        .start()
    )
    qb.awaitTermination(120)

    # ---- the in-plan composition over the same events
    comp = status_comparator(
        ev, key="user_id",
        scan_predicate=F.col("event_type") == "view",
        failure_predicate=F.col("event_type") == "error",
        ts="ts", duration="1 day", min_scans=2, min_failures=1,
    ).withColumn(
        "addr",
        F.concat(F.lit("10."), (F.col("user_id") % 32).cast("string"),
                 F.lit(".0.1")),
    )
    state = status_comparator_state(comp, account_col="user_id",
                                    addr_col="addr")
    want = sorted(
        map(tuple, login_failure_for_at_risk_account(
            ev.withColumn("__email", F.col("user_id").cast("string")),
            state.withColumn("email", F.col("email").cast("string")),
            account_col="__email",
            failure_predicate=F.col("event_type") == "error", ts="ts",
        ).select("event_id", "user_id", "scanned_by", "scanned_at")
        .collect())
    )
    assert sorted(alerts_b) == want
    assert len(want) > 0, "vacuous: no failures hit the at-risk set"


def test_shared_state_at_risk_plan(spark):
    """The consumer leg's join against the state snapshot must
    broadcast (account-cardinality dim), and the plan must scan the
    on-disk snapshot parquet — proof the handoff went through storage,
    not a lineage shortcut."""
    import contextlib
    import io

    from foxsec_pipeline_spark.plans.catalog import registry

    df = registry()["shared_state_at_risk"].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "lfara_state_" in plan, f"state not read from disk\n{plan}"


def test_per_batch_dim_refresh_sees_new_state(spark, tmp_path):
    """T9 per-batch dim refresh against the state table: the consumer
    re-reads the snapshot INSIDE foreachBatch, so state merged between
    micro-batches affects the next batch — the live-reload behavior
    the reference gets from querying Datastore per bundle."""
    table = _tbl(tmp_path)
    schema = "email string, scanned_by string, scanned_at string"
    table.merge(spark.createDataFrame(
        [("u1", "1.1.1.1", "2024-01-01")], schema))

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "u1"), (2, "u2")], "event_id long, email string"
    ).write.parquet(src)

    seen: list[tuple[int, set]] = []

    def consume(batch_df, batch_id):
        state = {r.email for r in table.read(spark).collect()}
        hits = {r.email for r in batch_df.join(
            table.read(spark).select("email"), "email", "left_semi"
        ).collect()}
        seen.append((batch_id, hits))
        # simulate the producer merging new state between batches
        table.merge(spark.createDataFrame(
            [("u2", "2.2.2.2", "2024-01-02")], schema))
        assert state is not None

    q = (
        spark.readStream.schema("event_id long, email string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(consume)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert seen, "stream produced no batches"
    # first batch sees only u1; once the mid-stream merge lands, a
    # later read returns u2 as well
    final = {r.email for r in table.read(spark).collect()}
    assert final == {"u1", "u2"}
    assert seen[0][1] <= {"u1", "u2"}
