"""Catalog tranche: time-series join/window operators over the events
stream — as-of join, bucketized interval join, rolling range-frame
aggregates (`operators/timeseries.py`). These are the operators a
Spark user reaches for where the reference's per-key DoFn state
carried values forward imperatively (`customs/CustomsVelocity.java`,
`heuristics/` session folds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.timeseries import asof_join, interval_count_join, rolling_counts
from ..session import load_tables
from .catalog import register


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir, "events")["events"]


@register(
    "asof_join_purchase",
    """
WITH snap AS (
  SELECT user_id, ts, max(value) AS sv
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), pts AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts, s.sv AS asof_value
FROM pts p ASOF LEFT JOIN snap s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
    doc="as-of join: each click gets the value of the user's most "
        "recent purchase at-or-before it. Spark has no ASOF JOIN "
        "primitive and a naive range join explodes; the plan is "
        "union-tagged streams + ONE window pass carrying the last "
        "snapshot forward (one shuffle on the key, O(1)/row state) — "
        "the DuckDB oracle uses its native ASOF LEFT JOIN, so the "
        "window formulation is proven equivalent to the SQL standard "
        "semantics",
)
def q_asof_join_purchase(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return asof_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        key="user_id",
    )


@register(
    "interval_error_click_count",
    """
SELECT e.event_id, e.user_id, e.ts, count(c.ts) AS n_points
FROM events e LEFT JOIN events c
  ON c.event_type = 'click' AND c.user_id = e.user_id
     AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 30 MINUTE
WHERE e.event_type = 'error'
GROUP BY 1, 2, 3
""",
    doc="interval join: per error event, clicks by the same user in "
        "the following 30 minutes. A non-equi join plans as "
        "BroadcastNestedLoopJoin/cartesian; bucketizing time makes it "
        "an equi-join on (user, 30-min bucket) with a bounded 2x "
        "interval fan-out and a residual filter — each qualifying "
        "pair meets exactly once (a point lives in one bucket), "
        "zero-match intervals restored by a left join on the counts",
)
def q_interval_error_click_count(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return interval_count_join(
        ev.where(F.col("event_type") == "error"),
        ev.where(F.col("event_type") == "click"),
        key="user_id",
        length="30 minutes",
    )


@register(
    "rolling_user_value",
    """
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_trailing,
       (sum(CAST(round(value * 100) AS BIGINT)) OVER w) / 100.0
         AS value_trailing
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
    doc="rolling trailing-window aggregate: per event, the user's "
        "event count and exact money-sum over the previous hour via a "
        "RANGE window frame on integer epoch micros — one window pass "
        "per key partition, money through integer cents so shuffled "
        "partial sums match the oracle bit-for-bit",
)
def q_rolling_user_value(spark, sf_dir):
    return rolling_counts(_events(spark, sf_dir), key="user_id")
