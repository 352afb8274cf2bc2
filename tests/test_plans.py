"""Physical-plan assertions — the load-bearing scale properties from
SCALE.md, checked on the real optimized plans so a regression fails
here instead of on a 1000-executor cluster.

What is asserted:
- broadcast joins where a dimension/side-input must broadcast,
- parquet filter pushdown + column pruning on selective scans,
- shuffle-free plans for pure projections,
- no row-at-a-time Python UDF (BatchEvalPython) in any catalog query.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from foxsec_pipeline_spark.plans.catalog import registry

from tests.conftest import SF_DIR

SPECS = sorted(registry().values(), key=lambda s: s.name)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_broadcast_dimension_joins(spark, reg):
    """J1/J7: stats view, dim tables, and watchlists must broadcast —
    a shuffled sort-merge join here re-shuffles the fact side."""
    for name in ("threshold_analysis", "segment_revenue", "events_dim_join",
                 "watchlist_match"):
        plan = plan_of(reg[name].fn(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, f"{name}: expected broadcast join\n{plan}"


def test_semijoin_stays_semi(spark, reg):
    plan = plan_of(reg["priority_semijoin"].fn(spark, SF_DIR))
    assert "LeftSemi" in plan, plan


def test_parquet_pushdown_and_pruning(spark, reg):
    """The Q1-shaped scan must push the date filter into parquet and
    read only the referenced columns."""
    plan = plan_of(reg["pricing_summary"].fn(spark, SF_DIR))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0], plan
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_comment" not in read_schema, f"column pruning failed: {read_schema}"


def test_partitioned_layout_prunes_partitions(spark, tmp_path_factory):
    """The 100 TB layout claim (SCALE.md: parquet partitioned by
    (resource, dt-hour) → partition pruning on the universal filters):
    a resource-partitioned write + resource filter must prune at the
    source — the scan's PartitionFilters carries the predicate and the
    pruned directories never appear as input files."""
    from foxsec_pipeline_spark.session import load_tables

    path = str(tmp_path_factory.mktemp("layout") / "events_by_type")
    ev = load_tables(spark, "/root/testdata/sf0.001", "events")["events"]
    ev.write.partitionBy("event_type").mode("overwrite").parquet(path)
    q = (
        spark.read.parquet(path)
        .where(F.col("event_type") == "error")
        .groupBy("user_id")
        .count()
    )
    plan = plan_of(q)
    # the filter must land in PartitionFilters (directory-level prune
    # at the file index), NOT as a post-scan Filter over all partitions
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "event_type" in pf, plan


def test_parse_is_shuffle_free(spark, reg):
    """S8 parse is a pure projection pipeline — a key-based Exchange
    means a regression added an accidental shuffle to the 100TB hot
    path. The one permitted Exchange is skew.spread's round-robin
    fan-out, which only fires when the scan is narrower than the
    cluster (a no-op on a real 100TB split count)."""
    plan = plan_of(reg["parse_normalize"].fn(spark, SF_DIR))
    for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert kind not in plan, f"key shuffle in parse path ({kind})\n{plan}"


def _exchange_nodes(plan: str) -> int:
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))


def test_single_shuffle_aggs(spark, reg):
    """A1-family heuristics are one-shuffle plans (partial+final agg
    around a single Exchange); exact countDistinct legitimately adds
    one more (Spark's two-phase distinct expansion)."""
    for name in ("hard_limit_analysis", "error_rate_analysis"):
        plan = plan_of(reg[name].fn(spark, SF_DIR))
        assert _exchange_nodes(plan) <= 1, f"{name}\n{plan}"
    plan = plan_of(reg["detect_nat"].fn(spark, SF_DIR))
    assert _exchange_nodes(plan) <= 2, plan


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_no_python_udf_in_batch_plans(spark, spec):
    """UDFs are the slow path; every batch operator must stay JVM-side
    (Arrow mapInPandas is allowed only in the multimodal decode stubs,
    which are not catalog queries)."""
    plan = plan_of(spec.fn(spark, SF_DIR))
    assert "BatchEvalPython" not in plan, f"{spec.name} uses a row Python UDF"


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    """Co-located join via bucketing (SCALE.md): both sides bucketed by
    the join key => SortMergeJoin with ZERO Exchange nodes."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from foxsec_pipeline_spark.sources.bucketed import read_table, write_bucketed

    suffix = _uuid.uuid4().hex[:8]
    ta, tb = f"bt_events_{suffix}", f"bt_alerts_{suffix}"
    ev = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    al = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("sev")
    )
    try:
        write_bucketed(ev, ta, ["k"], num_buckets=8, sort_cols=["k"])
        write_bucketed(al, tb, ["k"], num_buckets=8, sort_cols=["k"])
        # disable broadcast so the join exercises the bucketed SMJ path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = read_table(spark, ta).join(read_table(spark, tb), "k")
            plan = plan_of(joined)
            assert "SortMergeJoin" in plan, plan
            assert _exchange_nodes(plan) == 0, plan
            assert joined.count() == 1000
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_customs_features_single_shuffle(spark, reg):
    """A3 is one hash-aggregate: the typed counters, distinct paths and
    retained lists must not add extra shuffles beyond the two-phase
    distinct expansion."""
    plan = plan_of(reg["customs_features"].fn(spark, SF_DIR))
    assert _exchange_nodes(plan) <= 2, plan


def test_assume_role_is_joinless(spark, reg):
    """J6 resolves provider subjects with a running window function —
    one shuffle on the key, and crucially no join node."""
    plan = plan_of(reg["assume_role_correlate"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert _exchange_nodes(plan) <= 1, plan


def test_ann_broadcasts_queries(spark, reg):
    """The corpus never shuffles for top-k scoring: the (small) query
    side broadcasts into the corpus scan."""
    for name in ("ann_cosine_topk", "ann_cosine_lsh"):
        plan = plan_of(reg[name].fn(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
            f"{name}\n{plan}"
        )


def test_multiprobe_lsh_single_equijoin(spark, reg):
    """OR-amplified LSH must stay ONE equi-join on (table, bucket) —
    an OR-of-bucket-conditions join would plan as a nested-loop
    cartesian over the corpus."""
    plan = plan_of(reg["ann_cosine_lsh_multiprobe"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # candidate generation is ONE bucket equi-join; the two extra
    # joins re-attach vectors by id to the id-only candidates (so
    # 64-float arrays never ride through the bucket join/distinct).
    # All three are hash equi-joins — at local scale the planner may
    # broadcast any of them.
    tree = plan.split("\n\n")[0]
    n_joins = sum(
        ("BroadcastHashJoin" in ln) or ("SortMergeJoin" in ln)
        or ("ShuffledHashJoin" in ln)
        for ln in tree.splitlines()
    )
    assert n_joins == 3, plan
    assert "__bkt" in plan, plan


def test_ivf_no_cartesian_and_broadcast_centroids(spark, reg):
    """IVF assignment: the corpus joins BROADCAST centroid components
    on the dimension index and probes via a cell equi-join — the
    corpus must never self-join or plan a cartesian."""
    plan = plan_of(reg["ann_cosine_ivf"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "__cell" in plan, plan


def test_pq_no_cartesian_and_broadcast_codebook(spark, reg):
    """PQ: encoding joins the BROADCAST codebook on (subspace,
    position); ADC joins the code table against the BROADCAST lookup
    table — the raw corpus must never self-join, shuffle its vectors
    on a score key, or plan a cartesian."""
    plan = plan_of(reg["ann_cosine_pq"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "__approx" in plan, plan


def test_timeseries_joins_never_plan_nested_loop(spark, reg):
    """The as-of join must be a window pass (no join of points against
    snapshots at all) and the interval join must be an EQUI-join on
    (key, bucket) — a naive non-equi formulation of either plans as
    BroadcastNestedLoopJoin/cartesian, the classic 100 TB killer."""
    asof = plan_of(reg["asof_join_purchase"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in asof, asof
    assert "CartesianProduct" not in asof, asof
    assert "SortMergeJoin" not in asof, asof  # union+window, no join at all
    iv = plan_of(reg["interval_error_click_count"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in iv, iv
    assert "CartesianProduct" not in iv, iv
    assert "__bkt" in iv, iv


def test_quality_filter_pipeline_no_cartesian(spark, reg):
    """The composed keep/drop pipeline is four 1:1 legs joined on
    doc_id/content-hash — every join must stay an equi-join (language
    id's tiny marker 'cross join' broadcasts a 4-row literal table,
    which is fine; a real cartesian over documents is not)."""
    plan = plan_of(reg["quality_filter_pipeline"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan


def test_hot_group_flag_is_broadcast(spark):
    """account_creation_dist's hot-group detection joins a broadcast
    flag (few hot groups by definition) — a shuffled join here would
    re-shuffle the whole input just to mark rows."""
    from pyspark.sql import Row

    from foxsec_pipeline_spark.operators.customs import account_creation_dist

    df = spark.createDataFrame(
        [Row(g="d.com", id=i, name=f"n{i}", addr=f"a{i}") for i in range(10)]
    )
    plan = plan_of(account_creation_dist(
        df, group_col="g", id_col="id", name_col="name", addr_col="addr",
        max_ratio=0.3, hot_group_cutoff=5, n_blocks=2,
    ))
    assert "BroadcastHashJoin" in plan, plan


def test_postprocessing_watchlist_broadcasts(spark, reg):
    """T8/PostProcessing: the watchlist side must broadcast — the
    alert stream never reshuffles for watchlist matching."""
    plan = plan_of(reg["postprocessing_pipeline"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_global_topk_is_take_ordered(spark, reg):
    """shipping_priority / ngram_corpus_stats: a global ORDER BY +
    LIMIT must plan as TakeOrderedAndProject (distributed per-partition
    heaps), never a full global Sort before the limit."""
    for name in ("shipping_priority", "ngram_corpus_stats"):
        plan = plan_of(reg[name].fn(spark, SF_DIR))
        assert "TakeOrderedAndProject" in plan, (name, plan)


def test_relational_subquery_shapes(spark, reg):
    """Q17/Q18/Q22 shapes: decorrelated scalar thresholds must
    broadcast and anti joins must stay anti — a shuffled join on the
    big side would re-shuffle the fact scan at 100 TB."""
    p17 = plan_of(reg["small_lot_revenue"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in p17, p17
    assert "SortMergeJoin" not in p17, f"Q17 shuffled a join:\n{p17}"
    p18 = plan_of(reg["large_order_customers"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in p18, p18
    assert "SortMergeJoin" not in p18, f"Q18 shuffled a join:\n{p18}"
    p22 = plan_of(reg["dormant_customer_balance"].fn(spark, SF_DIR))
    assert "LeftAnti" in p22, p22
    assert "BroadcastNestedLoopJoin" in p22 or "BroadcastHashJoin" in p22, p22


def test_retention_firsts_broadcasts(spark, reg):
    """The per-user firsts table is one row per user — it must
    broadcast into events, never shuffle the event stream."""
    plan = plan_of(reg["retention_cohorts"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_resample_no_nested_loop(spark, reg):
    """Grid-to-bucket is an equi-join on (user, hour); a range
    formulation would plan BroadcastNestedLoopJoin and explode."""
    plan = plan_of(reg["timeseries_resample"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_relational2_no_pathological_joins(spark, reg):
    """The Q2/Q7/Q8/Q9/Q10/Q11/Q14/Q15/Q19/Q21 tranche: no plan may
    contain a cartesian product or nested-loop join except the
    single-row broadcast scalars (Q11/Q15), and every dimension join
    must be a broadcast hash join — a SortMergeJoin against part/
    supplier/nation/customer means the fact table re-shuffled for a
    dimension lookup."""
    scalar_ok = {"important_parts_value", "top_revenue_supplier"}
    for name in (
        "min_cost_supplier", "nation_volume_shipping",
        "nation_market_share", "product_type_profit",
        "returned_item_customers", "important_parts_value",
        "promo_revenue_ratio", "top_revenue_supplier",
        "disjunctive_quantity_revenue", "waiting_orders_suppliers",
    ):
        plan = plan_of(reg[name].fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, f"{name}:\n{plan}"
        if name in scalar_ok:
            # the only join is the single-row scalar broadcast
            assert "BroadcastExchange" in plan, f"{name}:\n{plan}"
        else:
            assert "BroadcastNestedLoopJoin" not in plan, f"{name}:\n{plan}"
            assert "BroadcastHashJoin" in plan, (
                f"{name} has no broadcast join:\n{plan}"
            )


def test_relational2_fact_scans_keep_pushed_filters(spark, reg):
    """Date/flag predicates must reach the lineitem/orders parquet
    scans (PushedFilters) — at 100 TB the difference between scanning
    a month and scanning the table."""
    p10 = plan_of(reg["returned_item_customers"].fn(spark, SF_DIR))
    assert "l_returnflag" in p10.split("PushedFilters", 1)[1][:2000], p10
    p14 = plan_of(reg["promo_revenue_ratio"].fn(spark, SF_DIR))
    assert "l_shipdate" in p14.split("PushedFilters", 1)[1][:2000], p14


def test_waiting_orders_single_fact_join(spark, reg):
    """Q21's textbook plan joins lineitem three times (self-exists +
    self-not-exists); the decorrelated per-order aggregate form must
    touch lineitem ONCE."""
    plan = plan_of(reg["waiting_orders_suppliers"].fn(spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, plan


def test_scd2_single_user_shuffle(spark, reg):
    """SCD2's lag pass and lead/version pass share the user_id
    partitioning — exactly ONE exchange on user_id may appear; a
    second means Catalyst failed to reuse the sort order."""
    plan = plan_of(reg["scd2_user_segment"].fn(spark, SF_DIR))
    import re
    n_ex = _exchange_nodes(plan)
    n_user = len(re.findall(r"hashpartitioning\(user_id", plan))
    assert n_ex == 1 and n_user >= 1, (
        f"expected exactly 1 exchange (on user_id), saw {n_ex}:\n{plan}"
    )


def test_mad_statistics_broadcast_back(spark, reg):
    """The per-type median/MAD rows (5 rows) must broadcast onto the
    event scan, and the rank passes must not plan a nested loop."""
    plan = plan_of(reg["robust_outlier_mad"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_attribution_is_joinless(spark, reg):
    """Last-touch attribution is the union+window as-of shape — no
    join may appear at all (a range join would explode)."""
    plan = plan_of(reg["last_touch_attribution"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan


def test_semdedup_no_cartesian_blocked_pairs(spark, reg):
    """SemDeDup candidate pairs come from a grouped combination
    explode keyed on (cell, LSH bucket) — the corpus must never plan
    a cartesian or nested-loop self-join, and the vectors re-attach
    by id through hash equi-joins only."""
    plan = plan_of(reg["semdedup"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the composite blocking keys must both appear in the plan
    assert "bkt" in plan, plan
    assert "cell" in plan, plan


def test_split_leakage_broadcasts_split_dims(spark, reg):
    """split_leakage_check joins the (tiny, per-doc) split dims onto
    the candidate pair list — both joins must be broadcast equi-joins
    (a shuffled join would re-shuffle the pair list twice per keying),
    and nothing in the composite may plan a cartesian."""
    plan = plan_of(reg["split_leakage_check"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_split_assign_is_projection_only(spark, reg):
    """dataset_split_assign: the assignment itself is map-side — the
    only exchange in the plan is the readout aggregation's hash
    partitioning (plus the explicit _docs spread), never a join or
    sort."""
    plan = plan_of(reg["dataset_split_assign"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_corpus_drift_is_take_ordered(spark, reg):
    """corpus_drift's top-20 must plan as TakeOrderedAndProject (a
    bounded per-partition heap + merge), never a global sort of the
    full vocabulary."""
    plan = plan_of(reg["corpus_drift"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_phash_dedup_no_cartesian(spark, reg):
    """multimodal_phash_dedup must pair bucket-locally (the banded
    equi-join machinery), never a cartesian/nested-loop over
    fingerprints — and the pair stage must be the r11 chunk-grid
    form (_chunked_self_pairs): >= 2 Generate nodes over an
    explicit-width REPARTITION_BY_NUM spread, so a hot band bucket's
    quadratic emission neither runs in one task nor shuffles its
    full struct array per element (the 8 GB quadratic array shuffle
    measured at the 30x corpus, 50x the steady wall)."""
    plan = plan_of(reg["multimodal_phash_dedup"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Generate") >= 2, plan
    assert "REPARTITION_BY_NUM" in plan, plan
    # same operator backs the simhash pair family
    plan_sh = plan_of(reg["dedup_simhash_pairs"].fn(spark, SF_DIR))
    assert plan_sh.count("Generate") >= 2, plan_sh
    assert "REPARTITION_BY_NUM" in plan_sh, plan_sh
    assert "CartesianProduct" not in plan_sh, plan_sh


def test_oov_vocab_is_broadcast(spark, reg):
    """oov_rate_filter's fixed-size vocabulary must broadcast onto the
    token stream — the probe side never shuffles for the join."""
    plan = plan_of(reg["oov_rate_filter"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_seasonal_profile_is_broadcast(spark, reg):
    """seasonal_anomaly's hour-of-day profile (types x 24 rows) must
    broadcast back onto the hourly windows — the window stream never
    reshuffles for the baseline join."""
    plan = plan_of(reg["seasonal_anomaly"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_frequent_itemsets_single_scan_no_self_join(spark, reg):
    """frequent_itemsets: the basket design reads lineitem exactly once
    (localCheckpoint fan-out), the pair explode is map-side over the
    basket array (no self-join -> no SortMergeJoin anywhere), supports
    attach as broadcasts, and the only nested-loop is the 1-row totals
    cross join."""
    plan = plan_of(reg["frequent_itemsets"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Scan parquet") == 0, plan  # checkpoint feeds all
    assert "BroadcastHashJoin" in plan, plan


def test_changepoint_is_joinless(spark, reg):
    """changepoint_mean_shift: hash-agg to (type, hour) then windows
    over the bounded hourly table — no join operator of any kind."""
    plan = plan_of(reg["changepoint_mean_shift"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan


def test_snapshot_diff_single_pk_join(spark, reg):
    """snapshot_diff: exactly one full-outer sort-merge join on the
    unique order key; no other join, no cartesian."""
    plan = plan_of(reg["snapshot_diff"].fn(spark, SF_DIR))
    assert "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_markov_normalizer_is_broadcast(spark, reg):
    """markov_transitions: the per-source-state row-count normalizer
    (type-cardinality rows) must broadcast back onto the transition
    matrix."""
    plan = plan_of(reg["markov_transitions"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_inverted_index_no_join_no_window(spark, reg):
    """inverted_index_stats: two partial-combinable hash-aggs; the
    top-posting argmax is an integer-encoded max() — no join and no
    window anywhere, so stopword skew cannot concentrate a posting
    list into one partition."""
    plan = plan_of(reg["inverted_index_stats"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_winnowing_pairs_bucket_local(spark, reg):
    """winnowing_plagiarism_pairs: pairing must be the df-capped
    bucket-local equi-join on fp_hash — no cartesian/nested-loop."""
    plan = plan_of(reg["winnowing_plagiarism_pairs"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_prefix_jaccard_bounded_joins(spark, reg):
    """prefix_jaccard_join: on the driver corpus (vocab 31 <= 62) the
    adaptive operator takes the bitmask path — the only loop join
    allowed is the BROADCAST of the compressed distinct-mask table
    (bounded by min(#docs, 2^vocab)); no cartesian may appear. On
    real-text vocabularies the prefix path has no loop join at all
    (pinned by the 120-word brute-force test)."""
    plan = plan_of(reg["prefix_jaccard_join"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # the mask loop
    assert "SortMergeJoin" not in plan, plan


def test_prefix_jaccard_dense_and_chunked_shapes(spark, reg):
    """r11 shapes of the adaptive Jaccard join on a >62-word corpus.

    DENSE path (emission factor forced to 0): the block-nested mask
    sweep must be two fused Generates over an explicit-width
    REPARTITION_BY_NUM exchange — the tiny chunk-grid nested-loop
    join is the ONLY loop join, there is no pair-key SortMergeJoin,
    no pair distinct (HashAggregate on doc_a/doc_b), and the probe
    scoring is static bit_count math (no array_intersect).

    SPARSE path (emission factor forced high): chunk-grid candidate
    generation must show the grouped two-Generate expansion with an
    explicit-width hash exchange on the pair keys feeding the
    distinct — never an AQE-sized read (the compresses-20x int-pair
    exchange coalesced the dedup to 10 tasks of 64M-entry hash maps
    at the 10x corpus, a GC freeze)."""
    from foxsec_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + k) % 100:03d}" for k in range(12)))
         for i in range(200)],
        "doc_id long, text string",
    )
    dense = plan_of(
        prefix_filter_jaccard_pairs(docs, dense_emission_factor=0.0)
    )
    assert "CartesianProduct" not in dense, dense
    assert dense.count("Generate") >= 2, dense
    assert "REPARTITION_BY_NUM" in dense, dense
    assert "SortMergeJoin" not in dense, dense
    assert "array_intersect" not in dense, dense
    assert "bit_count" in dense, dense

    sparse = plan_of(
        prefix_filter_jaccard_pairs(docs, dense_emission_factor=1e18)
    )
    assert "CartesianProduct" not in sparse, sparse
    assert sparse.count("Generate") >= 2, sparse
    # the pair-dedup aggregate reads the explicit pair-key exchange
    assert "hashpartitioning(doc_a" in sparse, sparse
    assert "REPARTITION_BY_NUM" in sparse, sparse


def test_triangles_no_cartesian_checkpointed_edges(spark, reg):
    """copurchase_triangles: wedge and closing joins are equi-joins on
    the oriented edge list (no cartesian/nested-loop); the edge list
    materializes once (localCheckpoint) so its four consumers plan
    zero parquet re-scans."""
    plan = plan_of(reg["copurchase_triangles"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Scan parquet") == 0, plan


def test_pareto_two_phase_no_join(spark, reg):
    """pareto_frontier_parts: pure window pipeline (bucketed phase then
    frontier-union phase) — no join anywhere."""
    plan = plan_of(reg["pareto_frontier_parts"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_weighted_median_windows_distinct_prices(spark, reg):
    """weighted_median_price: the cumulative window must sit ABOVE the
    (group, price) hash-agg — HashAggregate appears below Window in
    the plan — and no join exists."""
    plan = plan_of(reg["weighted_median_price"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "HashAggregate" in plan and "Window" in plan, plan


def test_theil_sen_pairs_over_hourly_table(spark, reg):
    """theil_sen_trend: the pair self-join must sit above the hourly
    hash-agg (quadratic only in observed hours), and the median window
    runs over distinct slope values — HashAggregate below the Window,
    no cartesian."""
    plan = plan_of(reg["theil_sen_trend"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan and "Window" in plan, plan


# ---------------------------------------------------------------------------
# r9 additions


def test_ann_eval_query_sets_fixed_count(spark, reg):
    """The brute ANN eval queries (r8 weak flag) pick their query set
    as a FIXED-COUNT deterministic sample: the plan must show
    TakeOrderedAndProject (per-partition top-K + merge, never a global
    sort) and broadcast the K-row query side into the corpus scan."""
    # mmr_diversified_topk shares the same _query_sample pick but its
    # final plan is a union of localCheckpointed per-round picks, so
    # the TakeOrderedAndProject sits behind an RDD scan boundary and
    # can't be string-asserted here.
    for name in ("ann_range_search", "knn_label_vote"):
        plan = plan_of(reg[name].fn(spark, SF_DIR))
        assert "TakeOrderedAndProject" in plan, f"{name}\n{plan}"
        assert (
            "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        ), f"{name}\n{plan}"


def test_range_ivf_no_cartesian(spark, reg):
    """ann_range_search_ivf: cell-probed candidates — equi-joins only
    (broadcast centroids + cell id), never a corpus cartesian; the
    query pick is the same TakeOrderedAndProject sample."""
    plan = plan_of(reg["ann_range_search_ivf"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "__cell" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_pmi_topk_and_no_cartesian(spark, reg):
    """bigram_pmi_collocations: final top-50 is TakeOrderedAndProject;
    the only nested-loop is the broadcast SCALAR totals attach."""
    plan = plan_of(reg["bigram_pmi_collocations"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_simpson_is_joinless_two_aggs(spark, reg):
    """token_simpson_index: two stacked hash-aggs, no join anywhere."""
    plan = plan_of(reg["token_simpson_index"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_dup_ngram_fraction_joinless_window(spark, reg):
    """duplicate_ngram_fraction: corpus frequency is a count WINDOW
    over the shingle key so the shingle generation evaluates once —
    no join anywhere (the freq-agg + join-back form re-evaluates the
    generation on both sides; measured 7.2 s vs 1.3 s at sf0.1)."""
    plan = plan_of(reg["duplicate_ngram_fraction"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "Window" in plan, plan
    assert "shingle" in plan, plan


def test_slo_multiwindow_equijoin_only(spark, reg):
    """slo_multiwindow_burn: hourly x daily aggregates meet in an
    equi-join on (service, day) — no cartesian/nested-loop."""
    plan = plan_of(reg["slo_multiwindow_burn"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_fano_is_joinless(spark, reg):
    """burstiness_fano_factor: arithmetic zero-fill means NO generated
    time series and no join — two stacked hash-aggs only."""
    plan = plan_of(reg["burstiness_fano_factor"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_mh_estimate_error_equijoins_only(spark, reg):
    """minhash_jaccard_estimate_error: every join keys on ids/hashes —
    no cartesian, no nested-loop anywhere in the eval plan."""
    plan = plan_of(reg["minhash_jaccard_estimate_error"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_copurchase_edges_codegen_expansion(spark):
    """kcore/khop edge expansion (r10): the shared _copurchase_edges
    helper must expand basket pairs with two chained codegen Generate
    stages (posexplode + slice-explode) — no interpreted
    flatten/transform lambda anywhere in the plan (the r9 verdict's
    three missed HOF sites)."""
    from foxsec_pipeline_spark.plans.catalog_curation import (
        _copurchase_edges,
    )
    from foxsec_pipeline_spark.session import load_tables

    li = load_tables(spark, SF_DIR, "lineitem")["lineitem"]
    plan = plan_of(_copurchase_edges(li))
    assert plan.count("Generate") >= 2, plan
    assert "lambdafunction" not in plan.lower(), plan


def test_simhash_pairs_banding_scales():
    """dedup_simhash_pairs parametrization (r10, the r9 weak flag):
    band-slice keys must number >= 2^20 so banded pair volume stays
    ~linear in corpus size, and the pigeonhole completeness bound
    max_hamming <= bands - 1 must hold."""
    from foxsec_pipeline_spark.plans.catalog_data import (
        _SIMHASH_PAIR_BANDS,
        _SIMHASH_PAIR_BITS,
        _SIMHASH_PAIR_MAXHAM,
    )

    assert _SIMHASH_PAIR_BITS % _SIMHASH_PAIR_BANDS == 0
    assert _SIMHASH_PAIR_MAXHAM <= _SIMHASH_PAIR_BANDS - 1
    band_width = _SIMHASH_PAIR_BITS // _SIMHASH_PAIR_BANDS
    assert 2 ** band_width >= 2 ** 20


def test_neardup_pair_recall_plan_and_values(spark, reg):
    """neardup_pair_recall (r11): candidate generation stays banded
    equi-joins — no CartesianProduct and no nested-loop join EXCEPT
    the deliberate 1-row broadcast of the n_true scalar; and at
    sf0.01 the eval is non-vacuous: >= 20 true pairs, both methods
    catch > 0, minhash recall strictly between 0 and 1e6 ppm (the
    truncation ladder spans grazing Jaccard by construction)."""
    # the non-vacuity thresholds below are calibrated at sf0.01
    # specifically, so this test pins that scale — but resolves it
    # relative to SF_DIR's corpus root rather than hardcoding the
    # absolute path (r11 ADVICE)
    import os

    df = reg["neardup_pair_recall"].fn(
        spark, os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    )
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, plan
    # the only nested-loop joins allowed are the two scalar n_true
    # broadcasts (crossJoin of a 1-row aggregate); the formatted plan
    # prints each node twice (tree line + detail header), so 2 joins
    # -> 4 occurrences
    assert plan.count("BroadcastNestedLoopJoin") <= 4, plan
    rows = {r["method"]: r for r in df.collect()}
    assert set(rows) == {"minhash_lsh", "simhash_banded"}
    mh, sh = rows["minhash_lsh"], rows["simhash_banded"]
    assert mh["n_true"] >= 20
    assert 0 < mh["n_caught"] <= mh["n_true"]
    assert 0 < mh["recall_ppm"] < 1_000_000
    assert sh["n_caught"] > 0


# ---------------------------------------------------------------------------
# r12 additions


def _dense_corpus(spark, n=200):
    """>62-word corpus where every prefix token is hot (vocab 100,
    12 tokens/doc over 200 docs) — the shape that exercises the
    multiword/dense machinery of the adaptive Jaccard join."""
    return spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + k) % 100:03d}" for k in range(12)))
         for i in range(n)],
        "doc_id long, text string",
    )


def test_dense_path_docs_cap_gates_single_task_sort(spark):
    """r11 verdict item 6 pin: the dense mask sweep's chunk-id
    assignment is a SINGLE-TASK row_number sort, bounded only by the
    `dense_docs_cap` gate in `_jaccard_prefix_path` — a future cap
    bump must not silently un-bound it. Forcing the density test TRUE
    (emission factor 0) while the corpus EXCEEDS the cap must fall
    through to the sparse prefix path (pair-key exchange present, no
    chunk-grid loop join), and the gated fallback returns the same
    exact pairs."""
    from foxsec_pipeline_spark.operators import dedup as D

    docs = _dense_corpus(spark)
    dense_df = D.prefix_filter_jaccard_pairs(docs, dense_emission_factor=0.0)
    assert D._LAST_STATS["path"] == "dense", D._LAST_STATS
    gated_df = D.prefix_filter_jaccard_pairs(
        docs, dense_emission_factor=0.0, dense_docs_cap=100
    )
    assert D._LAST_STATS["path"] == "sparse", D._LAST_STATS
    gated = plan_of(gated_df)
    assert "hashpartitioning(doc_a" in gated, gated
    key = ["doc_a", "doc_b"]
    assert sorted(map(tuple, dense_df.select(*key).collect())) == sorted(
        map(tuple, gated_df.select(*key).collect())
    )


def test_array_verify_broadcast_byte_bounded(spark, monkeypatch):
    """r11 verdict item 2: the REAL-TEXT array verify must gate its
    broadcast on estimated BYTES (the mask tier's 512 MB discipline),
    not a row count. Below the cap the token-array dims broadcast
    (BroadcastExchange present); forcing the cap to 0 must drop the
    hint and fall back to the AQE shuffle join — same corpus, fewer
    broadcast exchanges, a shuffled join on the pair keys."""
    from foxsec_pipeline_spark.operators import dedup as D

    # vocab 300*35 unique + 20 shared = 10520 > multiword_vocab_cap,
    # so verification takes the ARRAYS tier; the shared pool creates
    # real candidates.
    docs = spark.createDataFrame(
        [(i,
          " ".join(f"u{i * 35 + k:06d}" for k in range(35))
          + " " + " ".join(f"shared{(i + k) % 20:02d}" for k in range(5)))
         for i in range(300)],
        "doc_id long, text string",
    )
    bounded = plan_of(D.prefix_filter_jaccard_pairs(docs))
    assert D._LAST_STATS["path"] == "sparse", D._LAST_STATS
    assert "array_intersect" in bounded, bounded
    assert bounded.count("BroadcastExchange") >= 1, bounded

    monkeypatch.setattr(D, "_BROADCAST_BYTES_CAP", 0)
    unbounded = plan_of(D.prefix_filter_jaccard_pairs(docs))
    assert "array_intersect" in unbounded, unbounded
    assert unbounded.count("BroadcastExchange") < bounded.count(
        "BroadcastExchange"
    ), unbounded
    assert (
        "SortMergeJoin" in unbounded or "ShuffledHashJoin" in unbounded
    ), unbounded


def test_pair_dedup_width_emission_derived(spark, monkeypatch):
    """r11 verdict item 4: the sparse path's pair-dedup exchange width
    must derive from the measured candidate emission (ceil(emission /
    pairs-per-task), floored at machine parallelism) — two forced
    emission targets yield two different widths, and the chosen width
    is the one in the plan's REPARTITION_BY_NUM exchange."""
    from foxsec_pipeline_spark.operators import dedup as D

    docs = _dense_corpus(spark)
    par = spark.sparkContext.defaultParallelism

    D.prefix_filter_jaccard_pairs(docs, dense_emission_factor=1e18)
    s1 = dict(D._LAST_STATS)
    assert s1["path"] == "sparse" and s1["emission"] > par, s1
    # default 25M-pairs/task target: tiny corpus floors at par
    assert s1["width"] == par, s1

    monkeypatch.setattr(D, "_PAIRS_PER_DEDUP_TASK", 1)
    plan = plan_of(
        D.prefix_filter_jaccard_pairs(docs, dense_emission_factor=1e18)
    )
    s2 = dict(D._LAST_STATS)
    assert s2["width"] == max(par, s2["emission"]) > s1["width"], (s1, s2)
    assert f", {s2['width']}), REPARTITION_BY_NUM" in plan, plan
