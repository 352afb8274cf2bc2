"""Catalog tranche: the remaining classic warehouse join/subquery
shapes (TPC-H Q2/Q7/Q8/Q9/Q10/Q11/Q14/Q15/Q19/Q21 analogs), adapted
to the driver's star schema (no partsupp / shipmode / receiptdate
columns — supply cost is derived from lineitem unit prices, and
"late" is defined against o_orderdate; each doc string states the
adaptation).

The reference ships its alert/event output to a warehouse for
analyst SQL (`output/CompositeOutput.java:86-105` writes BigQuery
tables); this tranche proves the engine itself handles the full
span of investigation shapes those analysts run — min-cost
correlated subqueries, market-share conditional ratios, global
scalar HAVING thresholds, disjunctive pushdown predicates, and the
EXISTS/NOT-EXISTS double correlation — with every one decorrelated
into broadcast joins.

Determinism rules (same as catalog_relational.py): money through
integer cents (`round(x * 10^k)` as BIGINT — both engines compute
the identical IEEE double product, then round), comparisons against
derived scalars as exact integer cross-multiplication, ratios
divided once at the very end from identical integers.

Scale notes: the only shuffles in this tranche are (a) lineitem
pre-aggregations keyed on their natural group keys and (b) the
lineitem-orders equi-join on orderkey; every dimension (part,
supplier, nation, region, customer, derived qualifying-key sets) is
broadcast, so the fact table is never shuffled for a dimension
lookup. AQE handles the orderkey join's skew at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..session import load_tables
from .catalog import register

# revenue in integer "deci-milli-cents" (4 decimal places of a cent
# are impossible; 10^4 scaling keeps the double->int round exact for
# the discount product) — identical to catalog_data's Q1/Q5 idiom
_REV = "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"


def _rev_cents():
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")


@register(
    "min_cost_supplier",
    """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT))
           AS unit_cents
  FROM lineitem GROUP BY 1, 2
), eligible AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
), parts AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_size <= 5 AND p_type = 'STANDARD'
), best AS (
  SELECT l_partkey, min(unit_cents) AS best_cents
  FROM cost
  JOIN eligible ON l_suppkey = s_suppkey
  JOIN parts ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT p_partkey, p_name, s_name, n_name,
       round(s_acctbal, 2) AS s_acctbal,
       best_cents / 100.0 AS unit_cost
FROM cost
JOIN eligible ON l_suppkey = s_suppkey
JOIN parts ON l_partkey = p_partkey
JOIN best ON cost.l_partkey = best.l_partkey
         AND cost.unit_cents = best.best_cents
""",
    doc="TPC-H Q2-shaped min-cost-supplier (MinimumCostSupplierQuery "
        "pattern over the analyst warehouse). No partsupp table in "
        "this schema, so supply cost is the min observed unit price "
        "per (part, supplier) derived from lineitem — one grouped agg "
        "keyed (partkey, suppkey), the only shuffle. The correlated "
        "`cost = (SELECT min ...)` subquery is decorrelated into a "
        "per-part min over the region-eligible cost rows that "
        "broadcasts back for the equality probe; supplier, nation, "
        "region, and the filtered part slice are all broadcast. Unit "
        "cost via integer cents so the min/equality is exact "
        "cross-engine",
)
def q_min_cost_supplier(spark, sf_dir):
    t = load_tables(
        spark, sf_dir, "lineitem", "supplier", "nation", "region", "part"
    )
    cost = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.round(
                    F.col("l_extendedprice") / F.col("l_quantity") * 100
                ).cast("long")
            ).alias("unit_cents")
        )
    )
    eligible = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        t["part"]
        .where((F.col("p_size") <= 5) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    slice_ = (
        cost.join(F.broadcast(eligible), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    best = (
        slice_.groupBy("l_partkey")
        .agg(F.min("unit_cents").alias("best_cents"))
        .withColumnRenamed("l_partkey", "__bk")
    )
    return (
        slice_.join(
            F.broadcast(best),
            (F.col("l_partkey") == F.col("__bk"))
            & (F.col("unit_cents") == F.col("best_cents")),
        )
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.round(F.col("s_acctbal"), 2).alias("s_acctbal"),
            (F.col("best_cents") / 100.0).alias("unit_cost"),
        )
    )


@register(
    "nation_volume_shipping",
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       date_trunc('year', l_shipdate) AS l_year,
       sum({rev}) / 10000.0 AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
""".format(rev=_REV),
    doc="TPC-H Q7-shaped volume shipping between a nation pair, by "
        "ship year. The nation-pair filter pushes to BOTH fact "
        "inputs before the orderkey join (lineitem keeps only "
        "lines of suppliers in the pair ~2/25 of rows, orders keeps "
        "only customers in the pair), so the one real shuffle — the "
        "lineitem-orders equi-join on orderkey — moves a small "
        "fraction of either table; supplier/customer/nation are "
        "broadcast dims",
)
def q_nation_volume_shipping(spark, sf_dir):
    t = load_tables(
        spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation"
    )
    pair = ("NATION_1", "NATION_2")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_name").isin(*pair))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t["customer"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_name").isin(*pair))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = (
        t["lineitem"]
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey", "supp_nation",
            F.date_trunc("year", F.col("l_shipdate")).alias("l_year"),
            _rev_cents().alias("__rev"),
        )
    )
    od = (
        t["orders"]
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum("__rev") / 10000.0).alias("revenue"))
    )


@register(
    "nation_market_share",
    """
SELECT date_trunc('year', o_orderdate) AS o_year,
       round(sum(CASE WHEN n1.n_name = 'NATION_5' THEN {rev} ELSE 0 END)
             * 1.0 / sum({rev}), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
GROUP BY 1
""".format(rev=_REV),
    doc="TPC-H Q8-shaped market share: NATION_5's fraction of ECONOMY "
        "part revenue sold into EUROPE customers, per order year. "
        "The numerator/denominator are both exact integer cent sums "
        "accumulated in ONE conditional aggregation pass (no second "
        "scan, no self-join); the single division happens once per "
        "year row at the very end so cross-engine floats agree. Part "
        "filter broadcasts into lineitem before the orderkey shuffle",
)
def q_nation_market_share(spark, sf_dir):
    t = load_tables(
        spark, sf_dir, "lineitem", "part", "supplier", "orders",
        "customer", "nation", "region",
    )
    parts = t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "supp_nation", _rev_cents().alias("__rev"))
    )
    eu_cust = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"]
                .join(
                    F.broadcast(
                        t["region"].where(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    od = (
        t["orders"]
        .join(F.broadcast(eu_cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            F.date_trunc("year", F.col("o_orderdate")).alias("o_year"),
        )
    )
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("__rev"))
                    .otherwise(F.lit(0))
                )
                * 1.0
                / F.sum("__rev"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "product_type_profit",
    """
SELECT n_name AS nation, date_trunc('year', o_orderdate) AS o_year,
       sum({rev}
           - CAST(round(p_retailprice * l_quantity * 10000) AS BIGINT))
         / 10000.0 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
""".format(rev=_REV),
    doc="TPC-H Q9-shaped product profit by supplier nation and order "
        "year. No partsupp.ps_supplycost in this schema, so cost = "
        "p_retailprice * l_quantity (the same double product on both "
        "engines, rounded to integer 10^-4 units before the sum, so "
        "profit is an exact integer difference). The p_name LIKE "
        "filter prunes part BEFORE its broadcast into lineitem; the "
        "orderkey equi-join is the only shuffle",
)
def q_product_type_profit(spark, sf_dir):
    t = load_tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders"
    )
    parts = (
        t["part"]
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    cost = F.round(
        F.col("p_retailprice") * F.col("l_quantity") * 10000
    ).cast("long")
    li = (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey", "nation",
            (_rev_cents() - cost).alias("__amount"),
        )
    )
    od = t["orders"].select(
        "o_orderkey", F.date_trunc("year", F.col("o_orderdate")).alias("o_year")
    )
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", "o_year")
        .agg((F.sum("__amount") / 10000.0).alias("profit"))
    )


@register(
    "returned_item_customers",
    """
SELECT c_custkey, c_name, n_name,
       round(c_acctbal, 2) AS c_acctbal,
       sum({rev}) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate < TIMESTAMP '1998-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY sum({rev}) DESC, c_custkey
LIMIT 20
""".format(rev=_REV),
    doc="TPC-H Q10-shaped returned-item top customers: revenue lost "
        "to 'R' lines for a half-year order window, top 20. The "
        "returnflag + orderdate predicates reach both parquet scans "
        "(PushedFilters) before the orderkey shuffle; customer and "
        "nation broadcast onto the small aggregated result, not the "
        "fact rows. The LIMIT is deterministic cross-engine because "
        "revenue is an exact integer-cents sum and ties break on "
        "c_custkey",
)
def q_returned_item_customers(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    li = (
        t["lineitem"]
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", _rev_cents().alias("__rev"))
    )
    od = (
        t["orders"]
        .where(
            (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("__rev").alias("__cents"))
    )
    cust = t["customer"].join(
        F.broadcast(t["nation"]),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        per_cust.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .select(
            "c_custkey", "c_name", "n_name",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            (F.col("__cents") / 10000.0).alias("revenue"),
            F.col("__cents"),
        )
        .orderBy(F.col("__cents").desc(), F.col("c_custkey"))
        .limit(20)
        .drop("__cents")
    )


@register(
    "important_parts_value",
    """
WITH per_part AS (
  SELECT l_partkey, sum({rev}) AS cents
  FROM lineitem GROUP BY 1
), total AS (
  SELECT sum(cents) AS t, count(*) AS c FROM per_part
)
SELECT l_partkey, cents / 10000.0 AS part_value
FROM per_part, total
WHERE cents * c * 2 > 3 * t
""".format(rev=_REV),
    doc="TPC-H Q11-shaped important stock: parts whose revenue "
        "exceeds 1.5x the average part's (Q11's fixed fraction made "
        "scale-invariant: a threshold tied to the corpus total alone "
        "goes vacuous as the part count grows — measured 242 rows at "
        "sf0.01 but 0 at sf0.1 — so the cut is against the mean). "
        "The global (total, count) is a single broadcast-scalar row "
        "and the HAVING threshold is an exact integer cross-multiply "
        "(cents * count * 2 > 3 * total) — no float fraction can "
        "flip a boundary part between engines. "
        "One shuffle (the per-part agg); the scalar never shuffles "
        "anything",
)
def q_important_parts_value(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem")
    per_part = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(F.sum(_rev_cents()).alias("cents"))
    )
    total = per_part.agg(
        F.sum("cents").alias("__t"), F.count(F.lit(1)).alias("__c")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("cents") * F.col("__c") * 2 > F.col("__t") * 3)
        .select("l_partkey", (F.col("cents") / 10000.0).alias("part_value"))
    )


@register(
    "promo_revenue_ratio",
    """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {rev} ELSE 0 END)
       / sum({rev}), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-03-01'
  AND l_shipdate < TIMESTAMP '1998-04-01'
""".format(rev=_REV),
    doc="TPC-H Q14-shaped promotion effect: PROMO parts' share of one "
        "ship month's revenue. Single conditional-aggregation pass "
        "over the date-pruned lineitem slice with part broadcast in; "
        "numerator and denominator are integer cent sums, divided "
        "once in the one output row. The shipdate range reaches the "
        "parquet scan as a pushed filter",
)
def q_promo_revenue_ratio(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1998-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    return (
        li.join(
            F.broadcast(t["part"].select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _rev_cents())
                    .otherwise(F.lit(0))
                )
                / F.sum(_rev_cents()),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "top_revenue_supplier",
    """
WITH rev AS (
  SELECT l_suppkey, sum({rev}) AS cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate < TIMESTAMP '1998-04-01'
  GROUP BY 1
), m AS (SELECT max(cents) AS mx FROM rev)
SELECT s_suppkey, s_name, cents / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey, m
WHERE cents = mx
""".format(rev=_REV),
    doc="TPC-H Q15-shaped top supplier: the supplier(s) whose revenue "
        "equals the quarter's max. The revenue view aggregates ONCE "
        "(Q15's CREATE VIEW used twice becomes one cached agg), the "
        "max is a broadcast scalar, and the equality is exact on "
        "integer cents so ties surface identically on both engines",
)
def q_top_revenue_supplier(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_cents()).alias("cents"))
    )
    mx = rev.agg(F.max("cents").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("cents") == F.col("__mx"))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey", "s_name",
            (F.col("cents") / 10000.0).alias("total_revenue"),
        )
    )


@register(
    "disjunctive_quantity_revenue",
    """
SELECT sum({rev}) / 10000.0 AS revenue, count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
""".format(rev=_REV),
    doc="TPC-H Q19-shaped disjunctive predicate: OR-of-ANDs mixing "
        "part and lineitem columns. Catalyst extracts the "
        "join-key-independent conjuncts: the part side is pre-pruned "
        "to the two brands before broadcasting (p_brand IN "
        "(Brand#3, Brand#7) is implied by the OR and pushed below "
        "the join), lineitem keeps its quantity envelope (1..35) at "
        "the scan, and the residual OR evaluates post-join. One "
        "broadcast join, zero shuffles",
)
def q_disjunctive_quantity_revenue(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem", "part")
    cond = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#7")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .where(cond)
        .agg(
            (F.sum(_rev_cents()) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "waiting_orders_suppliers",
    """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 1400 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late,
         min(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
  FROM li GROUP BY 1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY 1, 2
""",
    doc="TPC-H Q21-shaped suppliers-who-kept-orders-waiting: in "
        "finished multi-supplier orders, the supplier who was the "
        "ONLY late one. No receiptdate/commitdate in this schema, so "
        "late = shipped > 1400 days after the order date (the ~p90 "
        "of the synthetic lag distribution). The EXISTS (another "
        "supplier) + NOT EXISTS (another late supplier) double "
        "correlation is decorrelated into ONE per-order aggregate "
        "(distinct suppliers, distinct late suppliers, and min-late "
        "identifies the unique offender when n_late = 1) — no "
        "self-joins of lineitem at all, versus the textbook plan's "
        "two extra fact-table joins. Shuffles: the orderkey "
        "equi-join and the per-order agg (same key, so the exchange "
        "is reused), then a tiny per-supplier count",
)
def q_waiting_orders_suppliers(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    od = (
        t["orders"]
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        t["lineitem"]
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey", "l_suppkey",
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 1400 DAYS"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("late"),
        )
    )
    late_supp = F.when(F.col("late") == 1, F.col("l_suppkey"))
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(late_supp).alias("n_late"),
        F.min(late_supp).alias("late_supp"),
    )
    return (
        per_order.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("late_supp") == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
