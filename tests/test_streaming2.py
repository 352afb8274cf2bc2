"""Incremental-batch runs (availableNow + checkpoint): file-offset
incrementality and cross-run keyed state — the 'nightly run touches
only the delta' property a growing 100 TB corpus needs."""

import uuid

from pyspark.sql import functions as F

from foxsec_pipeline_spark.streaming.incremental import (
    incremental_dedup_run,
    incremental_run,
)

SCHEMA = "doc_id long, content_hash string, text string"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        path
    )


def test_incremental_run_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / f"ckpt-{uuid.uuid4().hex}")

    _write(spark, src, [(1, "h1", "a"), (2, "h2", "b")])
    incremental_run(
        spark, src, SCHEMA,
        lambda df: df.withColumn("run_len", F.length("text")),
        sink, ckpt,
    )
    assert spark.read.parquet(sink).count() == 2

    # second run with NOTHING new: exactly-once means zero new rows
    incremental_run(
        spark, src, SCHEMA,
        lambda df: df.withColumn("run_len", F.length("text")),
        sink, ckpt,
    )
    assert spark.read.parquet(sink).count() == 2

    # a new file arrives; only IT is processed (old rows not re-emitted)
    _write(spark, src, [(3, "h3", "ccc")])
    incremental_run(
        spark, src, SCHEMA,
        lambda df: df.withColumn("run_len", F.length("text")),
        sink, ckpt,
    )
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert out.where("doc_id = 3").first()["run_len"] == 3


def test_incremental_dedup_state_survives_across_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / f"ckpt-{uuid.uuid4().hex}")

    # run 1: h1 appears twice -> kept once
    _write(spark, src, [(1, "h1", "a"), (2, "h1", "a"), (3, "h2", "b")])
    incremental_dedup_run(spark, src, SCHEMA, ["content_hash"], sink, ckpt)
    assert spark.read.parquet(sink).count() == 2

    # run 2: h2 re-arrives in a NEW file -> suppressed by state carried
    # through the checkpoint; only the genuinely new h3 lands
    _write(spark, src, [(4, "h2", "b"), (5, "h3", "c")])
    incremental_dedup_run(spark, src, SCHEMA, ["content_hash"], sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert sorted(r["content_hash"] for r in out.collect()) == ["h1", "h2", "h3"]
    # the duplicate h2 arrival (doc 4) must NOT be the surviving row
    assert out.where("content_hash = 'h2'").first()["doc_id"] == 3
