"""End-to-end readStream parity for the two COMPOSED pipelines that
only had batch driver rows + per-component streaming tests (round-3
verdict ask #7): the same events, read as a file stream, must produce
exactly the batch catalog output.

Streaming restrictions shape the twins honestly:
- distinct aggregations are unsupported in streaming, so the
  distinct-count legs run as a tagged-union -> dropDuplicates ->
  windowed conditional count chain (multi-stateful, one query) — the
  same function, computed with streaming-legal operators;
- a lag-over-aggregated-windows (summary_delta) cannot follow its
  aggregation inside one streaming query (the append-mode watermark
  would hold the aggregate back), so the delta leg chains through a
  durable sink: streaming windowed counts -> parquet, batch delta on
  top — the documented two-query composition pattern
  (streaming/suppress.py docstrings, SURVEY §7 hard part 1).
"""

import os
import uuid

from pyspark.sql import functions as F

from foxsec_pipeline_spark.session import load_tables

SF = "/root/testdata/sf0.001"


def _stream_events(spark, tmpdir):
    ev = load_tables(spark, SF, "events")["events"]
    path = os.path.join(str(tmpdir), "ev")
    ev.write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    return ev, spark.readStream.schema(schema).parquet(path)


def _run(df, mode="complete"):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def test_streaming_customs_pipeline_matches_batch(spark, tmpdir):
    """customs_pipeline's three detector legs under readStream ==
    the batch catalog rows on the same events."""
    from foxsec_pipeline_spark.plans.catalog import registry

    batch = {
        (str(r.window_start), r.user_id, r.detector, r.n)
        for r in registry()["customs_pipeline"].fn(spark, SF).collect()
    }
    assert batch, "batch pipeline empty at sf0.001 — fixture problem"

    _, sev = _stream_events(spark, tmpdir)
    sev = sev.withWatermark("ts", "10 days")

    # leg 1: source_login_failure — plain windowed count, directly
    # streaming-legal
    slf = (
        sev.where(F.col("event_type") == "error")
        .groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 3)
        .select(
            F.col("w.start").alias("window_start"), "user_id",
            F.lit("source_login_failure").alias("detector"), "n",
        )
    )
    n1 = _run(slf)

    # legs 2+3: the distinct counts (props per user-day; plus the
    # enumeration variance gate) via tagged-union -> dropDuplicates ->
    # ONE windowed agg with conditional counts — the streaming-legal
    # form of count(DISTINCT x) FILTER (...)
    tagged = (
        sev.where(F.col("event_type") == "view")
        .select("ts", "user_id", F.lit("pra").alias("tag"),
                F.col("props").alias("val"))
        .unionByName(
            sev.select("ts", "user_id", F.lit("acct").alias("tag"),
                       F.col("props").alias("val"))
        )
        .unionByName(
            sev.select("ts", "user_id", F.lit("typ").alias("tag"),
                       F.col("event_type").alias("val"))
        )
        .withColumn("day", F.date_trunc("day", "ts"))
    )
    deduped = tagged.dropDuplicates(["tag", "user_id", "val", "day"])
    counts = (
        deduped.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(
            F.count(F.when(F.col("tag") == "pra", 1)).alias("n_props"),
            F.count(F.when(F.col("tag") == "acct", 1)).alias("n_accounts"),
            F.count(F.when(F.col("tag") == "typ", 1)).alias("n_types"),
        )
    )
    n2 = _run(counts)

    got = {
        (str(r.window_start), r.user_id, r.detector, r.n)
        for r in spark.sql(f"SELECT * FROM {n1}").collect()
    }
    c = spark.sql(f"SELECT * FROM {n2}").collect()
    for r in c:
        if r.n_props >= 3:
            got.add((str(r.w.start), r.user_id, "password_reset_abuse",
                     r.n_props))
        if r.n_accounts >= 6 and r.n_types > 1:
            got.add((str(r.w.start), r.user_id, "account_enumeration",
                     r.n_accounts))
    assert got == batch


def test_streaming_postprocessing_pipeline_matches_batch(spark, tmpdir):
    """postprocessing_pipeline under readStream: the stateless
    watchlist leg streams straight through (append mode, broadcast
    join); the volume-anomaly leg chains streaming windowed counts
    through a durable sink into the batch lag/delta — union equals
    the batch catalog rows."""
    from foxsec_pipeline_spark.plans.catalog import registry

    def key(r):
        return (r.subcategory, str(r.ts), r.severity, r.summary,
                r.matched_key, r.matched_object, r.notify_email,
                r.pct_change)

    batch = {key(r) for r in
             registry()["postprocessing_pipeline"].fn(spark, SF).collect()}
    assert batch

    _, sev = _stream_events(spark, tmpdir)
    alerts = sev.select(
        F.col("event_id").alias("alert_id"), "ts",
        F.col("event_type").alias("category"),
        F.concat(F.lit("10."), (F.col("user_id") % 32).cast("string"),
                 F.lit(".0.1")).alias("ip"),
        F.concat(F.lit("u"), F.col("user_id").cast("string"),
                 F.lit("@example.com")).alias("email"),
    )

    # leg A (stateless -> append mode): unpivot + broadcast watchlist
    kv = alerts.select(
        "alert_id", "ts",
        F.expr(
            "stack(2, 'source_address', ip, 'ip', 'email', email, 'email') "
            "AS (matched_key, obj, kind)"
        ),
    )
    wl = spark.createDataFrame(
        [("ip", "10.3.0.1", "warn"), ("ip", "10.7.0.1", "critical"),
         ("email", "u17@example.com", "critical"),
         ("email", "u42@example.com", "warn")],
        "wl_type string, wl_object string, wl_severity string",
    )
    wl_leg = (
        kv.join(F.broadcast(wl),
                (kv["obj"] == wl["wl_object"]) & (kv["kind"] == wl["wl_type"]))
        .select(
            F.lit("watchlist").alias("subcategory"), "ts",
            F.col("wl_severity").alias("severity"),
            F.concat(F.lit("matched watchlist object found in alert "),
                     F.col("alert_id").cast("string")).alias("summary"),
            "matched_key",
            F.col("wl_object").alias("matched_object"),
            F.when(F.col("wl_severity") == "critical",
                   "critical@example.com")
            .otherwise("warning@example.com").alias("notify_email"),
            F.lit(None).cast("double").alias("pct_change"),
        )
    )
    n_wl = _run(wl_leg, mode="append")

    # leg B stage 1 (streaming agg -> sink): daily counts. COMPLETE
    # mode so the assertion covers FINAL windows — append would
    # withhold every window the watermark hasn't passed, i.e. the
    # newest days of the stream (SURVEY §7 hard part 1); a production
    # deployment appends behind the watermark and accepts that lag
    counts = (
        alerts.withWatermark("ts", "10 days")
        .groupBy(F.window("ts", "1 day").alias("w"), "category")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "category", "n")
    )
    n_counts = _run(counts, mode="complete")

    # leg B stage 2 (batch over the sink): lag/delta + threshold
    from pyspark.sql import Window

    d = spark.sql(f"SELECT * FROM {n_counts}").withColumn(
        "prev_n",
        F.lag("n").over(Window.partitionBy("category").orderBy("window_start")),
    )
    pct = (F.col("n") - F.col("prev_n")) * 100.0 / F.col("prev_n")
    sm = (
        d.where(F.col("prev_n").isNotNull()
                & (F.floor(F.abs(pct)).cast("long") > 10))
        .select(
            F.lit("summary").alias("subcategory"),
            F.col("window_start").alias("ts"),
            F.lit("warn").alias("severity"),
            F.concat(F.lit("alert volume anomaly: "),
                     F.col("category")).alias("summary"),
            F.lit(None).cast("string").alias("matched_key"),
            F.lit(None).cast("string").alias("matched_object"),
            F.lit(None).cast("string").alias("notify_email"),
            F.round(pct, 6).alias("pct_change"),
        )
    )
    got = {key(r) for r in spark.sql(f"SELECT * FROM {n_wl}").collect()}
    got |= {key(r) for r in sm.collect()}
    assert got == batch
