#!/usr/bin/env python
"""Build a K-times scaled copy of a testdata directory for scale-up
benchmarking (SCALE.md round-7 step-up datapoint).

Scaling rule: K shifted replicas per fact table, with primary keys
remapped into disjoint ranges so cardinalities grow K-fold while the
per-key distributions (events per user, lines per order, chars per
doc) stay exactly the shape the sf0.1 generator produced — the growth
mode of a real corpus (more users/orders/docs), NOT K exact copies of
each row (which would turn every document into a K-way duplicate
group and quadratically distort the dedup operators this exists to
measure). Content columns are perturbed deterministically per replica
(documents get a replica-tagged token; embeddings are rolled by one
position per replica, preserving norms) so replicas are near but not
exact neighbors. Dimension tables with fixed vocabularies
(region/nation) are copied unchanged; customer/supplier/part scale
with remapped keys so FK joins keep their fan-out.

Near-dup replica mode (--neardup-pct, default 1): that percentage of
base documents (those with >= 20 tokens) become TRUE cross-replica
near-duplicate groups — replicas 1..K-1 of a selected doc have their
text rewritten to doc-salted unique tokens ("nd<doc_id>w<j>"),
differing from each other only in the final token. Rep 0 is ALWAYS
the unmodified base row, so the scaled corpus is a strict superset of
the base corpus and content-derived queries keep base comparability;
each near-dup group has K-1 members (C(K-1,2) true pairs). Why the salting: replication multiplies every shingle's
document frequency by K, so at K=10 the base corpus's typical-DF-7-25
shingles all blow past the dedup operators' df_cap=64 boilerplate
guard and threshold-grazing pairs vanish (the r9 STEPUP 0-row rows
for dedup_ngram_jaccard / containment_dedup). Salted groups have
base-DF-1 shingles (scaled DF = K <= 64 for K <= 60), replicas share
all but <= 3 shingles (jaccard ~(s-3)/(s+3), containment ~(s-3)/s —
both clear the 0.5 / 0.8 thresholds at >= 20 tokens), so the scaled
corpus carries measurable near-dup structure the way a real 10x
corpus would.

Usage: python scripts/make_scale_data.py [--base /root/testdata/sf0.1]
       [--out /tmp/sfscale1] [--k 10] [--neardup-pct 1]
Writes nothing outside --out.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfscale1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--neardup-pct", type=int, default=1)
    args = ap.parse_args()
    # The DF-cap guard only matters when near-dup groups exist: their
    # salted shingles have base DF 1 -> scaled DF K, which must stay
    # <= the dedup operators' df_cap=64. A plain replica corpus
    # (--neardup-pct 0, e.g. the 90x third-decade band) has no salted
    # groups and may scale past 60.
    assert args.k <= 60 or args.neardup_pct == 0, (
        "near-dup groups need scaled shingle DF <= 64; pass "
        "--neardup-pct 0 for K > 60"
    )
    # Near-dup groups are formed from replicas 1..K-1 only (rep 0 is
    # the unmodified base row), so K=2 gives single-member "groups"
    # and ZERO true near-dup pairs — the ladder silently vanishes
    # (r11 ADVICE: the K >= 3 constraint lived only in a comment).
    assert args.k >= 3 or args.neardup_pct == 0, (
        f"--k {args.k} with --neardup-pct {args.neardup_pct}: near-dup "
        "groups need K >= 3 (rep 0 stays the base row, so groups are "
        "replicas 1..K-1); pass --neardup-pct 0 for K < 3"
    )

    from pyspark.sql import functions as F

    from foxsec_pipeline_spark.session import get_spark

    spark = get_spark(app_name="make-scale-data")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    os.makedirs(args.out, exist_ok=True)
    K = args.k

    def replicas(df, *exprs):
        """Union of K per-replica projections; `rep` is the replica
        index column available to the shift expressions."""
        reps = spark.range(K).select(F.col("id").alias("rep"))
        return df.crossJoin(F.broadcast(reps)).select(*exprs)

    def shift(col, stride):
        return (F.col(col) + F.col("rep") * F.lit(stride)).alias(col)

    def write(name, df):
        df.write.mode("overwrite").parquet(
            os.path.join(args.out, f"{name}.parquet")
        )
        print(f"{name}: {df.count()} rows", file=sys.stderr)

    rd = lambda n: spark.read.parquet(f"{args.base}/{n}.parquet")  # noqa: E731

    # key strides: one above each table's max key, computed once
    ev = rd("events")
    emax = ev.agg(F.max("event_id"), F.max("user_id")).first()
    write("events", replicas(
        ev, shift("event_id", emax[0] + 1), "ts",
        shift("user_id", emax[1] + 1), "event_type", "value", "props",
    ))

    docs = rd("documents")
    dmax = docs.agg(F.max("doc_id")).first()[0]
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    is_nd = (F.col("doc_id") % 100 < F.lit(args.neardup_pct)) & (
        ntok >= 20
    )
    # doc-salted unique token body (base doc_id, SAME across replicas)
    # + a replica-varying final token: replicas of one base doc share
    # all but <= 3 shingles and nothing with any other doc
    nd_body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), ntok - F.lit(2)),
            lambda j: F.concat(
                F.lit("nd"), F.col("doc_id").cast("string"),
                F.lit("w"), j.cast("string"),
            ),
        ),
        " ",
    )
    nd_last = F.concat(F.lit("rep"), F.col("rep").cast("string"))
    nd_text = F.concat(nd_body, F.lit(" "), nd_last)
    # rep 0 is ALWAYS the original row (r10 ADVICE): the scaled corpus
    # stays a strict superset of the base corpus, so content-derived
    # queries (tfidf, shingle stats) keep rep-0 comparability with the
    # base run. Near-dup groups are formed by replicas 1..K-1 only
    # (group size K-1, sharing the salted body and differing in the
    # final "rep<i>" token — still >= 2 members and C(K-1,2) true
    # pairs per group for K >= 3).
    text_expr = F.when(F.col("rep") == 0, F.col("text")).otherwise(
        F.when(is_nd, nd_text).otherwise(
            F.concat(F.col("text"), F.lit(" rep"),
                     F.col("rep").cast("string"))
        )
    )
    # TWO stages, not one select: Spark's lateral column alias
    # resolution would bind the salt's doc_id reference to the
    # already-shifted alias in the same projection, giving every
    # replica a DIFFERENT salt (measured: group size 1, 0 near-dup
    # pairs). Stage 1 perturbs text against the base doc_id; stage 2
    # shifts the key. n_chars = length(text) is the generator
    # invariant (verified: 0 violations in the base data).
    dreps = spark.range(K).select(F.col("id").alias("rep"))
    staged = docs.crossJoin(F.broadcast(dreps)).select(
        "doc_id", "rep", text_expr.alias("__text"), "lang", "source",
    )
    write("documents", staged.select(
        (F.col("doc_id") + F.col("rep") * F.lit(dmax + 1)).alias("doc_id"),
        F.col("__text").alias("text"),
        "lang", "source",
        F.length("__text").cast("long").alias("n_chars"),
    ))

    emb = rd("embeddings")
    vmax = emb.agg(F.max("vec_id")).first()[0]
    dim = len(emb.select("embedding").first()[0])
    # roll by `rep` positions: same norm, different direction
    rolled = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.col("embedding")[
            (i + F.col("rep").cast("int")) % F.lit(dim)
        ],
    )
    write("embeddings", replicas(
        emb, shift("vec_id", vmax + 1), rolled.alias("embedding"), "label",
    ))

    # Each dimension key's stride is computed over BOTH the dimension's
    # own max key and every fact FK column that references it, and the
    # SAME stride shifts the dim PK and the fact FKs. A fact-side-only
    # stride would collide replica PK ranges whenever the dimension
    # holds keys above the fact max (customers with no orders, parts
    # never ordered), duplicating primary keys and inflating join
    # fan-out in the scaled data.
    orders = rd("orders")
    li = rd("lineitem")
    cust = rd("customer")
    part = rd("part")
    supp = rd("supplier")

    omax = orders.agg(F.max("o_orderkey")).first()[0]
    cstride = max(
        orders.agg(F.max("o_custkey")).first()[0],
        cust.agg(F.max("c_custkey")).first()[0],
    ) + 1
    limax = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()
    pstride = max(limax[0], part.agg(F.max("p_partkey")).first()[0]) + 1
    sstride = max(limax[1], supp.agg(F.max("s_suppkey")).first()[0]) + 1

    write("orders", replicas(
        orders, shift("o_orderkey", omax + 1),
        shift("o_custkey", cstride),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    ))

    # l_orderkey follows orders; part/supp FKs shift by the shared
    # dim strides, so FK fan-out to the (also scaled) dims is
    # preserved replica-by-replica
    write("lineitem", replicas(
        li, shift("l_orderkey", omax + 1),
        shift("l_partkey", pstride), shift("l_suppkey", sstride),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    ))

    write("customer", replicas(
        cust, shift("c_custkey", cstride),
        F.concat(F.col("c_name"), F.lit("#"),
                 F.col("rep").cast("string")).alias("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment",
    ))

    write("part", replicas(
        part, shift("p_partkey", pstride),
        F.concat(F.col("p_name"), F.lit(" #"),
                 F.col("rep").cast("string")).alias("p_name"),
        "p_brand", "p_type", "p_size", "p_retailprice",
    ))

    write("supplier", replicas(
        supp, shift("s_suppkey", sstride),
        F.concat(F.col("s_name"), F.lit("#"),
                 F.col("rep").cast("string")).alias("s_name"),
        "s_nationkey", "s_acctbal",
    ))

    for name in ("region", "nation"):
        write(name, rd(name))


if __name__ == "__main__":
    main()
