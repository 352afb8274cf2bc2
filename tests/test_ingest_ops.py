"""Round-4 ingestion/serving operators: accuracy and semantics
evidence beyond the DuckDB parity gate (which proves cross-engine
equality, not that the approximations are any good).

- sample-quantile sketch: rank error vs the EXACT deciles
- two-phase bottom-k: identical to the naive single-window selection
- bloom decontamination: zero false negatives vs the exact operator,
  false-positive rate under the analytic bound
- containment: catches a subset-duplicate that Jaccard misses
- pack_sequences: window partitions provably bounded by the sub-shard
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _events(spark):
    from foxsec_pipeline_spark.session import load_tables

    return load_tables(spark, SF_DIR, "events")["events"]


def _docs(spark):
    from foxsec_pipeline_spark.session import load_tables

    return load_tables(spark, SF_DIR, "documents")["documents"]


def test_sample_quantiles_rank_accuracy(spark):
    """Each sketched decile must sit within ±3/sqrt(k) of its target
    rank in the TRUE distribution (k=200 -> ±0.22 quantile units is
    the loose 3-sigma bound; typical error is far smaller)."""
    from foxsec_pipeline_spark.operators.ingest import sample_quantiles

    ev = _events(spark)
    approx = sample_quantiles(
        ev, group_col="event_type", value_col="value", id_col="event_id",
        k=200, n_quantiles=10,
    ).collect()
    assert approx, "sketch returned nothing"

    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    exact = (
        ev.withColumn("r", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
        .select("event_type", "value", "r", "n")
        .collect()
    )
    # true quantile position of a value = r / n
    by_group = {}
    for row in exact:
        by_group.setdefault(row.event_type, []).append((row.value, row.r, row.n))

    tol = 3.0 / (200 ** 0.5)  # 3-sigma sample-quantile rank bound
    for row in approx:
        vals = by_group[row.event_type]
        n = vals[0][2]
        target = row.quantile / 10.0
        # rank of the sketched value within the full distribution
        v = row.value_cents / 100.0
        rank = sum(1 for x, _, _ in vals if x <= v + 1e-9)
        err = abs(rank / n - target)
        assert err <= tol, (row.event_type, row.quantile, err)


def test_bottomk_two_phase_equals_naive(spark):
    """The salted two-phase bottom-k must select EXACTLY the global
    per-group bottom-k that a single (unbounded-partition) window
    selects — the bounded plan is an optimization, not a semantics
    change."""
    from foxsec_pipeline_spark.operators.ingest import bottomk_sample

    ev = _events(spark)
    two_phase = {
        (r.event_type, r.event_id)
        for r in bottomk_sample(
            ev, "event_type", "event_id", k=50, salt_buckets=8
        ).select("event_type", "event_id").collect()
    }
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    naive = {
        (r.event_type, r.event_id)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .select("event_type", "event_id")
        .collect()
    }
    assert two_phase == naive


def test_bloom_no_false_negatives_and_low_fpr(spark):
    """Bloom-flagged must be a SUPERSET of exactly-contaminated docs
    (no false negatives — the direction that matters), and the
    over-flagging must stay under the analytic Bloom bound with
    headroom."""
    from foxsec_pipeline_spark.operators.dedup import (
        bloom_decontaminate,
        decontaminate,
    )

    docs = _docs(spark)
    probe = F.col("doc_id") % 50 == 0
    exact = {
        r.doc_id
        for r in decontaminate(docs, probe_predicate=probe).collect()
    }
    bloom_rows = bloom_decontaminate(docs, probe_predicate=probe).collect()
    flagged = {r.doc_id for r in bloom_rows if r.is_contaminated}
    assert exact <= flagged, f"false negatives: {exact - flagged}"

    clean = [r for r in bloom_rows if r.doc_id not in exact]
    fp = sum(1 for r in clean if r.is_contaminated)
    # analytic per-shingle fpr (1 - e^{-kn/m})^k with n = probe
    # shingles; a doc is FP if ANY of its shingles false-hits, so
    # bound by n_shingles * fpr. Assert the loose corpus-level form.
    n_probe = (
        docs.where(probe)
        .select(F.explode(F.split(F.trim("text"), r"\s+")))
        .count()
    )
    import math

    per_shingle = (1 - math.exp(-3 * n_probe / 63488.0)) ** 3
    max_sh = max((r.n_shingles for r in clean), default=0)
    bound = len(clean) * min(1.0, max_sh * per_shingle)
    assert fp <= max(5, 2 * bound), (fp, bound)


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment 1.0,
    jaccard well under threshold — the case class this operator
    exists for."""
    from foxsec_pipeline_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = " ".join(f"tok{i}" for i in range(12))
    long_ = short + " " + " ".join(f"pad{i}" for i in range(300))
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "unrelated words entirely here")],
        "doc_id long, text string",
    )
    cont = {
        (r.doc_a, r.doc_b): r.containment_ppm
        for r in containment_pairs(df, threshold_ppm=800_000).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] == 1_000_000
    jac = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert not any(
        {r.doc_a, r.doc_b} == {1, 2} for r in jac
    ), "jaccard should miss the subset pair at 0.5"


def test_pack_sequences_partitions_bounded(spark):
    """No (shard, subshard) window partition may exceed
    docs_per_shard rows — the 100 TB safety property the round-3
    verdict flagged."""
    from foxsec_pipeline_spark.operators.textanalysis import pack_sequences

    docs = _docs(spark)
    out = pack_sequences(docs, seq_len=512, docs_per_shard=64)
    sizes = (
        out.groupBy("source", "subshard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sizes and max(r.n for r in sizes) <= 64
    # and sequences never cross a sub-shard: every doc's seq_id is
    # derived within its own (source, subshard) group
    assert (
        out.groupBy("source", "subshard")
        .agg(F.min("seq_id").alias("m"))
        .where(F.col("m") != 0)
        .count()
        == 0
    )


def test_cdc_apply_latest_semantics(spark):
    """Insert -> update -> delete -> re-insert on one key; snapshot
    keeps only keys whose LAST op is not the delete marker."""
    from foxsec_pipeline_spark.operators.ingest import cdc_apply_latest

    rows = [
        (1, "I", 10.0, 1), (1, "U", 11.0, 2), (1, "D", 0.0, 3),
        (2, "I", 20.0, 4), (2, "D", 0.0, 5), (2, "I", 22.0, 6),
        (3, "I", 30.0, 7),
    ]
    df = spark.createDataFrame(
        rows, "k long, op string, v double, seq long"
    )
    out = {
        r.k: (r.v, r.n_changes)
        for r in cdc_apply_latest(
            df, key_cols=["k"], op_col="op", delete_op="D",
            seq_cols=["seq"], value_cols=["v"],
        ).collect()
    }
    assert out == {2: (22.0, 3), 3: (30.0, 1)}


@pytest.mark.parametrize("n_dups", [0, 3])
def test_dedup_keep_latest(spark, n_dups):
    from foxsec_pipeline_spark.operators.ingest import dedup_keep_latest

    rows = [(1, 100 + i, float(i)) for i in range(n_dups + 1)]
    df = spark.createDataFrame(rows, "k long, id long, v double")
    out = dedup_keep_latest(
        df, key_cols=["k"], seq_cols=["id"], keep_cols=["id", "v"]
    ).collect()
    assert len(out) == 1
    assert out[0].id == 100 + n_dups and out[0].n_dups == n_dups


def test_assign_splits_total_disjoint_and_leakage_safe(spark):
    """assign_splits: every row gets exactly one split; fractions are
    approximately honored; and keying by a cluster id sends whole
    near-duplicate families to a single split (the leakage-safety
    contract)."""
    from foxsec_pipeline_spark.operators.textanalysis import assign_splits

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 137).alias("cluster_id")
    )
    out = assign_splits(
        df, [("train", 0.8), ("val", 0.1), ("test", 0.1)], key_col="doc_id"
    )
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000          # total
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85  # ~fractions
    # determinism: same assignment on re-run
    again = {r["doc_id"]: r["split"] for r in out.collect()}
    assert {r["doc_id"]: r["split"] for r in assign_splits(
        df, [("train", 0.8), ("val", 0.1), ("test", 0.1)]).collect()} == again

    # leakage safety: keyed by cluster, a family never straddles splits
    fam = assign_splits(
        df, [("train", 0.8), ("val", 0.1), ("test", 0.1)],
        key_col="cluster_id",
    )
    straddle = (
        fam.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert straddle == 0

    with pytest.raises(ValueError):
        assign_splits(df, [("train", 0.5), ("val", 0.1)])


def test_budget_sample_exact_counts_deterministic(spark):
    """budget_sample: per-stratum output counts equal the budget
    exactly (capped by stratum size), identical row set on re-run."""
    from foxsec_pipeline_spark.operators.textanalysis import budget_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("lang"),
    )
    out = budget_sample(df, {"s0": 10, "s1": 250, "s2": 0, "s3": 17})
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"s0": 10, "s1": 250, "s3": 17}
    ids = sorted(r["doc_id"] for r in out.collect())
    again = sorted(
        r["doc_id"] for r in
        budget_sample(df, {"s0": 10, "s1": 250, "s2": 0, "s3": 17}).collect()
    )
    assert ids == again


def test_ivm_merge_agg_edge_cases(spark):
    """view-only keys pass through, delta-only keys appear, shared
    keys combine (count/sum add; min/max tighten toward the extreme);
    null-safe on the join path."""
    from foxsec_pipeline_spark.operators.ingest import ivm_merge_agg

    schema = ("k string, n_events long, sum_cents long, "
              "min_cents long, max_cents long")
    view = spark.createDataFrame(
        [("a", 2, 100, 40, 60), ("b", 1, 10, 10, 10)], schema
    )
    delta = spark.createDataFrame(
        [("a", 3, 33, 5, 90), ("c", 1, 7, 7, 7)], schema
    )
    got = {r.k: r for r in ivm_merge_agg(view, delta, keys=["k"]).collect()}
    assert set(got) == {"a", "b", "c"}
    assert (got["a"].n_events, got["a"].sum_cents) == (5, 133)
    assert (got["a"].min_cents, got["a"].max_cents) == (5, 90)
    # view-only key unchanged
    assert (got["b"].n_events, got["b"].sum_cents,
            got["b"].min_cents, got["b"].max_cents) == (1, 10, 10, 10)
    # delta-only key materializes
    assert (got["c"].n_events, got["c"].sum_cents,
            got["c"].min_cents, got["c"].max_cents) == (1, 7, 7, 7)
