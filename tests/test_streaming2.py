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


def test_seasonal_anomaly_streaming_twin(spark, tmp_path):
    """The seasonal-anomaly detector runs unchanged as a stream: the
    hour-of-day profile (tiny, computed from history batch-side)
    broadcasts onto a STREAMING hourly count, and the final-window
    flags match the batch catalog query row-for-row on the same data
    — batch/stream unification on the r5 detector, the same
    static-dim-onto-stream shape as the identity/watchlist joins."""
    from pyspark.sql import functions as F

    from foxsec_pipeline_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.001"
    ev = load_tables(spark, sf_dir, "events")["events"].select(
        "event_type", "ts"
    )
    src = str(tmp_path / "events")
    ev.write.parquet(src)

    # batch truth: the catalog query on the same rows
    import __spark_entry__ as entrymod

    expected = {
        (r["event_type"], str(r["window_start"])): r["flagged"]
        for r in entrymod.queries()["seasonal_anomaly"](
            spark, sf_dir
        ).collect()
    }

    # profile from history (identical data here; in production,
    # trailing N days), broadcast onto the streaming hourly agg
    hourly_hist = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("window_start")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    prof = hourly_hist.groupBy(
        "event_type", F.hour("window_start").cast("long").alias("hod")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )

    stream = (
        spark.readStream.schema("event_type string, ts timestamp")
        .parquet(src)
        .groupBy(
            "event_type", F.window("ts", "1 hour").alias("w")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            "event_type", F.col("w.start").alias("window_start"), "c",
            F.hour(F.col("w.start")).cast("long").alias("hod"),
        )
        .join(F.broadcast(prof), ["event_type", "hod"])
    )
    dev = F.col("n") * F.col("c") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    out = stream.select(
        "event_type", "window_start",
        ((dev > 0) & (dev * dev > 9 * var_n2)).alias("flagged"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("seasonal_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_type"], str(r["window_start"])): r["flagged"]
        for r in spark.sql("select * from seasonal_stream").collect()
    }
    assert got == expected
    assert any(got.values())  # the fixture has real anomalies


def test_countmin_cells_streaming_twin(spark, tmp_path):
    """The Count-Min counter grid is a plain hash-aggregation, so it
    is streaming-legal AS-IS: the same cell expression under a
    readStream complete-mode agg converges to the batch sketch
    exactly. This is the operational point of a mergeable sketch —
    the stream maintains it incrementally with bounded (d*w) state,
    and any point-in-time snapshot can be probed or merged with other
    days' grids."""
    from pyspark.sql import functions as F

    from foxsec_pipeline_spark.operators.ingest import countmin_cells
    from foxsec_pipeline_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.001"
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    items = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("item")
    )
    expected = {
        (r.cm_row, r.cm_col): r.cm_count
        for r in countmin_cells(items, "item", depth=4, width=64).collect()
    }

    src = str(tmp_path / "items")
    items.write.parquet(src)
    stream_items = spark.readStream.schema("item string").parquet(src)
    cells = (
        stream_items.select(
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("cm_row"),
            "item",
        )
        .select(
            "cm_row",
            F.expr(
                "cast(conv(substring(md5(concat(cast(cm_row as string), "
                "'|', item)), 1, 8), 16, 10) as bigint) % 64"
            ).alias("cm_col"),
        )
        .groupBy("cm_row", "cm_col")
        .agg(F.count(F.lit(1)).alias("cm_count"))
    )
    q = (
        cells.writeStream.format("memory")
        .queryName("cm_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.cm_row, r.cm_col): r.cm_count
        for r in spark.sql("select * from cm_stream").collect()
    }
    assert got == expected
    assert len(got) <= 4 * 64


def test_corpus_ingestion_streaming_twin(spark, tmp_path):
    """The corpus keep/drop pipeline runs as a STREAM: the batch
    catalog query (`quality_filter_pipeline`) joins four legs over
    one scan; the streaming twin fuses the same gates (quality,
    language id, within-doc repetition) into ONE stateless per-row
    projection — the repetition leg's per-doc window becomes an
    array-HOF over the doc's own tokens, legal because a document is
    a bounded row, not a partition — plus ONE dropDuplicates state on
    the content hash (keep-first == the batch min-id keeper under
    ordered arrival). Survivor set and every per-doc decision column
    match the batch pipeline exactly."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from foxsec_pipeline_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.001"
    expected = {
        r["doc_id"]: (r["quality"], r["pred_lang"],
                      r["dup_shingle_ratio"], r["keep"], r["drop_reason"])
        for r in entrymod.queries()["quality_filter_pipeline"](
            spark, sf_dir).collect()
        if r["is_keeper"]
    }

    docs = load_tables(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text"
    )
    src = str(tmp_path / "docs")
    # one file, ordered by doc_id: first-arrival dedup == min-id keeper
    docs.orderBy("doc_id").coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        src
    )
    tok = F.split(F.trim("text"), r"\s+")
    n = F.size(tok)
    stop = {
        "en": ["the", "a", "of", "and", "is", "to", "in"],
        "es": ["el", "la", "de", "y", "es", "en", "un"],
        "fr": ["le", "la", "de", "et", "est", "en", "un"],
        "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    }

    def ratio(words):
        return F.size(F.filter(tok, lambda t: t.isin(words))) / F.greatest(
            n, F.lit(1)
        )

    diversity = F.size(F.array_distinct(tok)) / F.greatest(n, F.lit(1))
    len_ok = F.when((n >= 10) & (n <= 10000), 1.0).otherwise(0.0)
    quality = F.round(
        0.4 * len_ok
        + 0.3 * F.least(diversity * 2, F.lit(1.0))
        + 0.3 * F.least(ratio(stop["en"]) * 10, F.lit(1.0)),
        6,
    )
    scores = F.array(*[
        F.struct(F.round(ratio(w), 6).alias("score"), F.lit(la).alias("lang"))
        for la, w in sorted(stop.items())
    ])
    best = F.array_max(scores)
    pred_lang = F.when(best["score"] > 0, best["lang"]).otherwise("und")
    sh = F.expr(
        "transform(sequence(1, size(_tok) - 2), i -> concat_ws(' ', "
        "element_at(_tok, i), element_at(_tok, i + 1), "
        "element_at(_tok, i + 2)))"
    )
    rep = F.when(
        n >= 3,
        F.round(
            1.0 - F.size(F.array_distinct(sh)) / F.size(sh).cast("double"),
            6,
        ),
    ).otherwise(0.0)

    from foxsec_pipeline_spark.functions.text import doc_fingerprint

    gated = (
        stream.withColumn("_tok", tok)
        .select(
            "doc_id",
            quality.alias("quality"),
            pred_lang.alias("pred_lang"),
            rep.alias("dup_shingle_ratio"),
            doc_fingerprint(F.col("text")).alias("ch"),
        )
        .dropDuplicates(["ch"])
    )
    keep = (
        (F.col("pred_lang") == "en")
        & (F.col("quality") >= 0.5)
        & (F.col("dup_shingle_ratio") <= 0.6)
    )
    reason = (
        F.when(F.col("pred_lang") != "en", "language")
        .when(F.col("quality") < 0.5, "quality")
        .when(F.col("dup_shingle_ratio") > 0.6, "repetition")
        .otherwise("keep")
    )
    out = gated.select(
        "doc_id", "quality", "pred_lang", "dup_shingle_ratio",
        keep.alias("keep"), reason.alias("drop_reason"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("corpus_ingest_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["doc_id"]: (r["quality"], r["pred_lang"],
                      r["dup_shingle_ratio"], r["keep"], r["drop_reason"])
        for r in spark.sql("select * from corpus_ingest_stream").collect()
    }
    assert set(got) == set(expected)
    assert got == expected
    assert any(v[3] for v in got.values())       # some docs kept
    assert any(not v[3] for v in got.values())   # some gated out


def test_hll_hourly_sketch_streaming_twin(spark, tmp_path):
    """The hourly HLL sketch table behind sliding_distinct_hll_merge
    is a plain hash-aggregation of mergeable sketch buffers, so the
    stream maintains it AS-IS (complete-mode groupBy agg with bounded
    per-(type,hour) state); the sliding 3-hour union over the
    STREAMED sketch snapshot must estimate identically to the batch
    path — the operational point: raw events flow once, window
    rollups only ever merge sketches."""
    from pyspark.sql import functions as F

    from foxsec_pipeline_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.001"
    ev = load_tables(spark, sf_dir, "events")["events"].select(
        "event_type",
        "user_id",
        F.expr("unix_micros(ts) div 3600000000").alias("eh"),
    )

    def window_estimates(hourly_sk):
        # cut lineage so the semi-join back onto the same derivation
        # is unambiguous (the catalog query does the same)
        hours = hourly_sk.select("event_type", "eh").localCheckpoint(
            eager=False
        )
        return {
            (r.event_type, r.win_eh): r.n_est
            for r in hourly_sk.select(
                "event_type",
                "eh",
                "sk",
                F.explode(F.sequence(F.lit(0), F.lit(2))).alias("d"),
            )
            .select(
                "event_type",
                (F.col("eh") + F.col("d")).alias("win_eh"),
                "sk",
            )
            .join(
                hours.select("event_type", F.col("eh").alias("win_eh")),
                ["event_type", "win_eh"],
                "semi",
            )
            .groupBy("event_type", "win_eh")
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("sk"))
                .cast("long")
                .alias("n_est")
            )
            .collect()
        }

    batch_sk = ev.groupBy("event_type", "eh").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    expected = window_estimates(batch_sk)

    src = str(tmp_path / "ev")
    ev.write.parquet(src)
    stream_ev = spark.readStream.schema(
        "event_type string, user_id long, eh long"
    ).parquet(src)
    q = (
        stream_ev.groupBy("event_type", "eh")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed_sk = spark.table("hll_stream")
    got = window_estimates(streamed_sk)
    assert got == expected and len(got) > 0


def test_benford_digit_counts_streaming_twin(spark, tmp_path):
    """The Benford screen's state is just the (segment, first-digit)
    count grid — at most 9 cells per segment — so the stream maintains
    it as a complete-mode agg over a stream-static broadcast join with
    the customer dim, and the deviation math (max/TV vs the hardcoded
    log10(1+1/d) ppm expectations) runs on any point-in-time snapshot.
    The snapshot finished exactly like the batch catalog query."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from foxsec_pipeline_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.001"
    expected = {
        r.segment: (r.n_orders, r.max_dev_ppm, r.tv_ppm)
        for r in entrymod.queries()["benford_first_digit"](
            spark, sf_dir
        ).collect()
    }

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    cust = load_tables(spark, sf_dir, "customer")["customer"].select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"),
    )
    src = str(tmp_path / "orders")
    orders.select("o_custkey", "o_totalprice").write.parquet(src)
    stream = spark.readStream.schema(
        "o_custkey long, o_totalprice double"
    ).parquet(src)
    counts = (
        stream.join(F.broadcast(cust), "o_custkey")
        .select(
            "seg",
            F.expr(
                "cast(substr(cast(cast(round(o_totalprice * 100) as"
                " bigint) as string), 1, 1) as bigint)"
            ).alias("d"),
        )
        .groupBy("seg", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("benford_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # finish the deviation math on the streamed snapshot (plain batch
    # SQL over the tiny grid — segments x 9 rows)
    exp = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
           6: 66947, 7: 57992, 8: 51153, 9: 45757}
    grid = {}
    for r in spark.sql("select * from benford_stream").collect():
        grid.setdefault(r.seg, {})[r.d] = r.cnt
    got = {}
    for seg, c in grid.items():
        n = sum(c.values())
        devs = [abs(c.get(d, 0) * 1_000_000 // n - p)
                for d, p in exp.items()]
        got[seg] = (n, max(devs), sum(devs) // 2)
    assert got == expected
    assert all(len(c) <= 9 for c in grid.values())


def test_ks_drift_counts_streaming_twin(spark, tmp_path):
    """The KS drift monitor's state is the (segment, cents, side)
    count grid — distinct observed values per segment, not raw rows —
    maintained as a complete-mode streaming agg over a stream-static
    broadcast dim join. The CDF-gap finishing math over the snapshot
    matches the batch catalog query exactly (including the argmax
    value), so a continuously ingested fact stream gets a live drift
    readout without re-scanning history."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from foxsec_pipeline_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.001"
    expected = {
        r.segment: (r.n_before, r.n_after, r.ks_ppm, r.ks_at_cents)
        for r in entrymod.queries()["ks_drift_orders"](
            spark, sf_dir
        ).collect()
    }

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    cust = load_tables(spark, sf_dir, "customer")["customer"].select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"),
    )
    src = str(tmp_path / "orders_ks")
    orders.select("o_custkey", "o_totalprice", "o_orderdate").write.parquet(
        src
    )
    stream = spark.readStream.schema(
        "o_custkey long, o_totalprice double, o_orderdate timestamp"
    ).parquet(src)
    counts = (
        stream.join(F.broadcast(cust), "o_custkey")
        .select(
            "seg",
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("v"),
            F.expr(
                "case when o_orderdate < timestamp'1998-05-01 00:00:00'"
                " then 0 else 1 end"
            ).alias("side"),
        )
        .groupBy("seg", "v", "side")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("ks_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    grid: dict[str, dict[int, list[int]]] = {}
    for r in spark.sql("select * from ks_stream").collect():
        grid.setdefault(r.seg, {}).setdefault(r.v, [0, 0])[r.side] = r.cnt
    got = {}
    for seg, cnt in grid.items():
        na = sum(c[0] for c in cnt.values())
        nb = sum(c[1] for c in cnt.values())
        cuma = cumb = 0
        best, best_v = -1, None
        for v in sorted(cnt):
            cuma += cnt[v][0]
            cumb += cnt[v][1]
            d = abs(cuma * 1_000_000 // na - cumb * 1_000_000 // nb)
            if d > best:
                best, best_v = d, v
        got[seg] = (na, nb, best, best_v)
    assert got == expected


def test_ivm_foreachbatch_streaming_twin(spark, tmp_path):
    """The serving-view refresh loop end to end: a fact stream feeds
    foreachBatch, each micro-batch pre-aggregates its delta and merges
    it into the materialized view with ivm_merge_agg (O(delta + view),
    history never rescanned), and the final view equals the batch
    aggregate over all facts. The merge is guarded by the batch id —
    foreachBatch can REPLAY a batch after a failure, and an
    unconditional merge would double-count it, so idempotence is part
    of the contract (asserted by re-applying the last batch)."""
    from pyspark.sql import functions as F

    from foxsec_pipeline_spark.operators.ingest import ivm_merge_agg
    from foxsec_pipeline_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.001"
    ev = load_tables(spark, sf_dir, "events")["events"].select(
        "event_type",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )

    expected = {
        r.event_type: (r.n_events, r.sum_cents, r.min_cents, r.max_cents)
        for r in agg(ev).collect()
    }

    src = str(tmp_path / "ivm_events")
    # several files so availableNow + maxFilesPerTrigger yields
    # multiple micro-batches (multiple merge rounds)
    ev.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("event_type string, cents long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    state = {"view": None, "seen": set(), "replayable": None}

    def apply_batch(batch_df, batch_id):
        if batch_id in state["seen"]:
            return  # replayed batch: already merged, skip (idempotence)
        state["seen"].add(batch_id)
        delta = agg(batch_df).localCheckpoint()  # detach from the stream
        state["replayable"] = (delta, batch_id)
        if state["view"] is None:
            state["view"] = delta
        else:
            state["view"] = ivm_merge_agg(
                state["view"], delta, keys=["event_type"]
            ).localCheckpoint()

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(state["seen"]) >= 2  # genuinely incremental

    got = {
        r.event_type: (r.n_events, r.sum_cents, r.min_cents, r.max_cents)
        for r in state["view"].collect()
    }
    assert got == expected

    # replay the last batch: the batch-id guard must make it a no-op
    delta, bid = state["replayable"]
    before = got
    apply_batch(delta, bid)
    after = {
        r.event_type: (r.n_events, r.sum_cents, r.min_cents, r.max_cents)
        for r in state["view"].collect()
    }
    assert after == before


def test_reputation_decay_streaming_twin(spark, tmp_path):
    """The reputation ledger's state is the (user, violation-hour)
    count grid — bounded by entities x retention window — maintained
    as a complete-mode streaming agg; the decay/floor math runs on
    any snapshot against that snapshot's own max event time and
    matches the batch catalog query exactly. (In production the grid
    ages out beyond 60h — five half-lives — where the penalty is
    exactly 0, so state is bounded by the decay horizon, not
    history.)"""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from foxsec_pipeline_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.001"
    expected = {
        r.user_id: (r.n_violations, r.raw_penalty, r.decayed_penalty,
                    r.reputation)
        for r in entrymod.queries()["reputation_decay"](
            spark, sf_dir
        ).collect()
    }

    ev = load_tables(spark, sf_dir, "events")["events"]
    src = str(tmp_path / "rep_events")
    ev.select("user_id", "event_type", "ts").write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).parquet(src)
    # grid keyed at SECOND granularity here because the batch query
    # decays from exact event times; a production grid buckets to the
    # half-life resolution
    grid = (
        stream.groupBy(
            "user_id",
            "event_type",
            F.expr("cast(unix_micros(ts) div 1000000 as bigint)").alias("t"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    q = (
        grid.writeStream.format("memory")
        .queryName("rep_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.sql("select * from rep_stream").collect()
    tnow = max(r.t for r in rows)
    got = {}
    for r in rows:
        if r.event_type != "error":
            continue
        k = min((tnow - r.t) // 43200, 5)
        pen = [20, 10, 5, 2, 1, 0][k]
        n, raw, dec = got.get(r.user_id, (0, 0, 0))
        got[r.user_id] = (n + r.cnt, raw + 20 * r.cnt, dec + pen * r.cnt)
    final = {
        u: (n, raw, dec, max(0, 100 - dec))
        for u, (n, raw, dec) in got.items()
    }
    assert final == expected
