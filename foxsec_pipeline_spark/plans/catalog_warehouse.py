"""Catalog tranche: warehouse maintenance + robust-statistics shapes
over the events stream — SCD Type-2 history building, MAD-based
robust outlier flagging, and last-touch attribution.

These are the follow-on jobs a reference operator runs against the
warehouse the pipeline feeds (`output/CompositeOutput.java:86-105`
ships events/alerts to BigQuery): maintaining a slowly-changing
dimension from an event stream, flagging outliers with estimators
that survive skew (the reference's ThresholdAnalysis uses the mean,
which one whale drags; median/MAD do not), and attributing
conversions to the touch that preceded them.

Determinism: orderings always carry an event_id tie-break; medians
are the LOWER median selected by explicit row_number rank (both
engines run the identical rank logic — interpolating percentile
built-ins are NOT cross-engine stable); money through integer cents.

Scale: every query is one-or-two window passes over a single shuffle
on the natural key (user / event_type), plus broadcast joins of
tiny per-group statistic rows. The exact-median rank pass is a
per-group sort — the honest cost of an exact median; the at-scale
escape hatch is percentile_approx/KLL (see `sketch_distinct_users`),
which trades the cross-engine-exact property for a streaming sketch.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..session import load_tables
from .catalog import register


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir, "events")["events"]


@register(
    "scd2_user_segment",
    """
WITH obs AS (
  SELECT user_id, ts, event_id,
         CAST(regexp_extract(props, '([0-9]+)', 1) AS INTEGER) % 5
           AS segment
  FROM events
), flagged AS (
  SELECT *, lag(segment) OVER w AS prev_segment
  FROM obs
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, segment, ts AS valid_from, event_id
  FROM flagged
  WHERE prev_segment IS NULL OR segment != prev_segment
)
SELECT user_id, segment, valid_from,
       lead(valid_from) OVER w AS valid_to,
       CAST(row_number() OVER w AS BIGINT) AS version,
       (lead(valid_from) OVER w IS NULL) AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
""",
    doc="SCD Type-2 dimension build from an event stream: each user's "
        "observed segment (a deterministic attribute derived from the "
        "event payload) becomes validity-interval rows "
        "[valid_from, valid_to) with a version counter and a "
        "current-row flag. Plan: ONE shuffle on user_id serves both "
        "window passes (lag to find change points, lead/row_number to "
        "close intervals — same partitioning, Catalyst reuses the "
        "exchange and sort). Consecutive equal observations collapse; "
        "ordering ties break on event_id so duplicate timestamps "
        "cannot flip versions between engines. This is the MERGE-free "
        "formulation: at 100 TB the history table is rebuilt "
        "partition-incrementally (by user-hash bucket), never "
        "row-by-row upserted",
)
def q_scd2_user_segment(spark, sf_dir):
    ev = _events(spark, sf_dir)
    obs = ev.select(
        "user_id", "ts", "event_id",
        (F.regexp_extract(F.col("props"), r"([0-9]+)", 1).cast("int") % 5)
        .alias("segment"),
    )
    w_obs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        obs.withColumn("prev_segment", F.lag("segment").over(w_obs))
        .where(
            F.col("prev_segment").isNull()
            | (F.col("segment") != F.col("prev_segment"))
        )
        .select(
            "user_id", "segment",
            F.col("ts").alias("valid_from"), "event_id",
        )
    )
    w_ver = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id", "segment", "valid_from",
        F.lead("valid_from").over(w_ver).alias("valid_to"),
        F.row_number().over(w_ver).cast("long").alias("version"),
        F.lead("valid_from").over(w_ver).isNull().alias("is_current"),
    )


@register(
    "robust_outlier_mad",
    """
WITH ranked AS (
  SELECT event_type, value, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), med AS (
  SELECT event_type, n, value AS med FROM ranked WHERE rn = (n + 1) // 2
), dev AS (
  SELECT r.event_type, r.n, m.med, abs(r.value - m.med) AS d, r.event_id
  FROM ranked r JOIN med m USING (event_type)
), dranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY d, event_id) AS rn2
  FROM dev
), mad AS (
  SELECT event_type, n, med, d AS mad FROM dranked WHERE rn2 = (n + 1) // 2
)
SELECT d.event_type, CAST(max(d.n) AS BIGINT) AS n,
       round(max(m.med), 6) AS median,
       round(max(m.mad), 6) AS mad,
       count(CASE WHEN d.d > 3 * m.mad THEN 1 END) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1
""",
    doc="robust outlier screen per event_type: LOWER median of value, "
        "median absolute deviation, and the count of rows beyond "
        "3*MAD. The reference's ThresholdAnalysis flags against the "
        "MEAN (`ThresholdAnalysis.java:88-199`), which a single whale "
        "key drags; median/MAD have a 50% breakdown point. Exact "
        "medians are selected by explicit row_number rank with an "
        "event_id tie-break — NOT percentile built-ins, whose "
        "interpolation differs between engines — so the result is "
        "cross-engine exact. Plan: one shuffle on event_type, two "
        "rank passes over the same partitioning (exchange reused), "
        "per-type statistic rows broadcast back. Exact medians cost "
        "a per-group sort; at 100 TB swap in percentile_approx (KLL) "
        "per the sketch_distinct_users pattern",
)
def q_robust_outlier_mad(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w_rank = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_all = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type", "value", "event_id",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    # lower median: rank (n+1)//2 — floor only ever trims the .5
    med = (
        ranked.where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("value").alias("med"))
    )
    dev = (
        ranked.join(F.broadcast(med), "event_type")
        .select(
            "event_type", "n",
            "med", F.abs(F.col("value") - F.col("med")).alias("d"),
            "event_id",
        )
    )
    w_rank2 = Window.partitionBy("event_type").orderBy("d", "event_id")
    mad = (
        dev.withColumn("rn2", F.row_number().over(w_rank2))
        .where(F.col("rn2") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("d").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(F.max("med"), 6).alias("median"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.count(
                F.when(F.col("d") > 3 * F.col("mad"), F.lit(1))
            ).alias("n_outliers"),
        )
    )


@register(
    "last_touch_attribution",
    """
WITH purchases AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), views AS (
  SELECT user_id, ts FROM events WHERE event_type = 'view'
), attributed AS (
  SELECT p.event_id, p.cents, p.ts, v.ts AS view_ts
  FROM purchases p ASOF LEFT JOIN views v
    ON p.user_id = v.user_id AND p.ts >= v.ts
)
SELECT CASE
         WHEN view_ts IS NULL
           OR epoch_us(ts) - epoch_us(view_ts) > 604800000000 THEN 'none'
         WHEN epoch_us(ts) - epoch_us(view_ts) <= 3600000000 THEN '0-1h'
         WHEN epoch_us(ts) - epoch_us(view_ts) <= 86400000000 THEN '1-24h'
         ELSE '1-7d'
       END AS lag_bucket,
       count(*) AS n_purchases,
       sum(cents) / 100.0 AS revenue
FROM attributed
GROUP BY 1
""",
    doc="last-touch attribution: each purchase credits the user's "
        "most recent prior view, bucketed by attribution lag with a "
        "7-day window (older or absent touches fall to 'none'). The "
        "as-of probe reuses the `asof_join` shape (union-tagged "
        "streams + one last-ignorenulls window pass carrying the "
        "view timestamp forward — one shuffle on user_id, O(1)/row "
        "state, no range join; the DuckDB oracle runs its native "
        "ASOF LEFT JOIN, proving SQL-standard semantics). Lags "
        "compare in integer epoch micros; revenue in integer cents",
)
def q_last_touch_attribution(spark, sf_dir):
    ev = _events(spark, sf_dir)
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            "user_id", F.col("ts").alias("__ts"),
            F.lit(0).alias("__tag"),
            F.col("ts").alias("__vts"),
            F.lit(None).cast("long").alias("__cents"),
            F.lit(None).cast("long").alias("__pid"),
        )
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id", F.col("ts").alias("__ts"),
            F.lit(1).alias("__tag"),
            F.lit(None).cast("timestamp").alias("__vts"),
            F.round(F.col("value") * 100).cast("long").alias("__cents"),
            F.col("event_id").alias("__pid"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(purchases).withColumn(
        "__asof_vts", F.last("__vts", ignorenulls=True).over(w)
    )
    lag_us = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__asof_vts"))
    bucket = (
        F.when(
            F.col("__asof_vts").isNull() | (lag_us > 604_800_000_000),
            F.lit("none"),
        )
        .when(lag_us <= 3_600_000_000, F.lit("0-1h"))
        .when(lag_us <= 86_400_000_000, F.lit("1-24h"))
        .otherwise(F.lit("1-7d"))
    )
    return (
        merged.where(F.col("__tag") == 1)
        .select(bucket.alias("lag_bucket"), F.col("__cents"))
        .groupBy("lag_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (F.sum("__cents") / 100.0).alias("revenue"),
        )
    )


@register(
    "scd2_point_in_time_join",
    """
WITH obs AS (
  SELECT user_id, ts, event_id,
         CAST(regexp_extract(props, '([0-9]+)', 1) AS INTEGER) % 5
           AS segment
  FROM events
), flagged AS (
  SELECT *, lag(segment) OVER w AS prev_segment
  FROM obs
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, segment, ts AS valid_from, event_id
  FROM flagged
  WHERE prev_segment IS NULL OR segment != prev_segment
), dim AS (
  SELECT user_id, segment, valid_from,
         lead(valid_from) OVER w AS valid_to,
         CAST(row_number() OVER w AS BIGINT) AS version
  FROM changes
  WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
), fact AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, f.ts, d.segment, d.version
FROM fact f JOIN dim d
  ON f.user_id = d.user_id
 AND f.ts >= d.valid_from
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)
""",
    doc="point-in-time (AS OF) enrichment against the SCD2 dimension: "
        "every purchase event picks the segment version whose "
        "[valid_from, valid_to) interval contains its timestamp — "
        "the temporal-correctness join that prevents feature leakage "
        "in training-data builds (enriching with TODAY'S dimension "
        "row is the classic label-leak). The oracle is the literal "
        "SQL range join; the Spark plan is JOINLESS: version-start "
        "rows and facts union into one stream, one last-ignorenulls "
        "window per user carries the in-effect version onto each "
        "fact (dim rows sort before facts at equal ts, so a version "
        "is effective AT its own valid_from — matching the range "
        "join's inclusive lower bound; zero-length intervals from "
        "same-ts changes resolve to the later event_id on both "
        "paths). Scale: the range join would explode on hot users "
        "(every fact x every version per user); the union+window "
        "form is one shuffle on user_id, linear in rows, and the "
        "same exchange serves the SCD2 build itself",
)
def q_scd2_point_in_time_join(spark, sf_dir):
    ev = _events(spark, sf_dir)
    obs = ev.select(
        "user_id", "ts", "event_id",
        (F.regexp_extract(F.col("props"), r"([0-9]+)", 1).cast("int") % 5)
        .alias("segment"),
    )
    w_obs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        obs.withColumn("prev_segment", F.lag("segment").over(w_obs))
        .where(
            F.col("prev_segment").isNull()
            | (F.col("segment") != F.col("prev_segment"))
        )
        .select("user_id", "segment", F.col("ts").alias("vts"), "event_id")
    )
    w_ver = Window.partitionBy("user_id").orderBy("vts", "event_id")
    dim = changes.select(
        "user_id", "segment", "vts", "event_id",
        F.row_number().over(w_ver).cast("long").alias("version"),
    )
    tagged_dim = dim.select(
        "user_id",
        F.col("vts").alias("ts"),
        F.lit(0).alias("tag"),
        "event_id",
        "segment",
        "version",
        F.lit(None).cast("long").alias("fact_event_id"),
    )
    tagged_fact = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast("int").alias("segment"),
        F.lit(None).cast("long").alias("version"),
        F.col("event_id").alias("fact_event_id"),
    )
    w_asof = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_dim.unionByName(tagged_fact).select(
        "user_id", "ts", "tag", "fact_event_id",
        F.last("segment", ignorenulls=True).over(w_asof).alias("segment"),
        F.last("version", ignorenulls=True).over(w_asof).alias("version"),
    )
    return carried.where(F.col("tag") == 1).select(
        F.col("fact_event_id").alias("event_id"),
        "user_id", "ts", "segment", "version",
    )
