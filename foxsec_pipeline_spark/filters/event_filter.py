"""EventFilter — the reference's JSON predicate DSL compiled to a
Catalyst ``Column``.

Reference semantics (`parser/EventFilter.java:72-88`,
`parser/EventFilterRule.java:32-79`, `parser/EventFilterPayload.java:22-156`,
`parser/EventFilterPayloadOr.java`, `parser/EventFilterPayloadRange.java`):

- A filter is an OR over rules (any rule matching passes the event).
- A rule is an AND of matchers: payload/normalized type equality,
  string equality / regex / integer equality / integer range over
  named properties, plus nested ``except`` rules that negate.
- The whole thing is JSON-(de)serializable — the reference uses it as
  the per-pipeline configurable pre-filter.

Here the DSL compiles to one boolean Column expression tree, so
Catalyst can push it into the parquet/json scan (predicate pushdown) —
the reference applies it row-at-a-time inside a DoFn
(`parser/ParserDoFn.java:83-122`), paying full parse cost first.

JSON shape::

    {"rules": [
       {"types": ["error"],                # value of `type_field` IN (...)
        "matchers": [
          {"field": "value", "op": "range", "min": 1.0, "max": 9.9},
          {"field": "props", "op": "re", "value": ".*k.*"},
          {"field": "user_id", "op": "eq", "value": 7}
        ],
        "matchers_or": [ {..}, {..} ],     # OR-of-matchers group
        "except": [ {<rule>}, ... ]        # negated sub-rules
       }, ...
    ]}

ops: eq, ne, re (regex match), contains, in, range (min/max inclusive),
gt, ge, lt, le, is_null, not_null.
"""

from __future__ import annotations

import json
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _nn(c: Column) -> Column:
    """Two-valued matcher semantics: a comparison against a NULL
    property is FALSE, not NULL (the reference's matchers return false
    on a missing property — `EventFilterPayload.java:81-156`). Without
    this, SQL three-valued logic leaks through `except` negation:
    NOT(NULL) is NULL, which silently DROPS rows the reference keeps.
    Found by tests/test_filter_properties.py."""
    return F.coalesce(c, F.lit(False))


def _compile_matcher(m: dict) -> Column:
    raw = _compile_matcher_raw(m)
    if m.get("op") in ("is_null", "not_null"):
        return raw  # never null already
    return _nn(raw)


def _compile_matcher_raw(m: dict) -> Column:
    col = F.col(m["field"])
    op = m.get("op", "eq")
    if op == "eq":
        return col == F.lit(m["value"])
    if op == "ne":
        return col != F.lit(m["value"])
    if op == "re":
        # FULL match, not find: the reference compiles the pattern and
        # requires Matcher.matches() (EventFilterPayload.java:102-118)
        return col.rlike("^(?:" + m["value"] + ")$")
    if op == "contains":
        return col.contains(m["value"])
    if op == "in":
        return col.isin(list(m["values"]))
    if op == "range":
        lo, hi = m.get("min"), m.get("max")
        parts = []
        if lo is not None:
            parts.append(col >= F.lit(lo))
        if hi is not None:
            parts.append(col <= F.lit(hi))
        return reduce(lambda a, b: a & b, parts) if parts else F.lit(True)
    if op == "gt":
        return col > F.lit(m["value"])
    if op == "ge":
        return col >= F.lit(m["value"])
    if op == "lt":
        return col < F.lit(m["value"])
    if op == "le":
        return col <= F.lit(m["value"])
    if op == "is_null":
        return col.isNull()
    if op == "not_null":
        return col.isNotNull()
    raise ValueError(f"unknown matcher op: {op}")


def _compile_rule(rule: dict, type_field: str | None) -> Column:
    parts: list[Column] = []
    types = rule.get("types")
    if types:
        if type_field is None:
            raise ValueError("rule has 'types' but no type_field configured")
        parts.append(_nn(F.col(type_field).isin(list(types))))
    for m in rule.get("matchers", []):
        parts.append(_compile_matcher(m))
    m_or = [_compile_matcher(m) for m in rule.get("matchers_or", [])]
    if m_or:
        parts.append(reduce(lambda a, b: a | b, m_or))
    cond = reduce(lambda a, b: a & b, parts) if parts else F.lit(True)
    # nested negation rules (`EventFilterRule.java` except semantics):
    # the rule matches only if no except-rule matches.
    for ex in rule.get("except", []):
        cond = cond & ~_compile_rule(ex, type_field)
    return cond


def compile_event_filter(spec: dict | str, type_field: str | None = None) -> Column:
    """Compile a JSON EventFilter spec into a boolean Column.

    OR-of-rules, each rule AND-of-matchers with nested except
    negation — exactly the reference's evaluation order
    (`EventFilter.java:72-88` matchAny over rules).
    """
    if isinstance(spec, str):
        spec = json.loads(spec)
    rules = [_compile_rule(r, type_field) for r in spec.get("rules", [])]
    if not rules:
        return F.lit(True)
    return reduce(lambda a, b: a | b, rules)


def apply_event_filter(
    df: DataFrame, spec: dict | str, type_field: str | None = None
) -> DataFrame:
    return df.where(compile_event_filter(spec, type_field))
