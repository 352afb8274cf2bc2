"""Property-based tests for the EventFilter JSON->Column compiler:
random specs evaluated by an independent pure-Python interpreter must
agree with the compiled Catalyst predicate row-for-row. (The reference
has no property tests — SURVEY §5; this guards the compiler's
operator/nesting semantics, the part most likely to drift.)"""

import re

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from foxsec_pipeline_spark.filters.event_filter import apply_event_filter

ROWS = [
    {"rid": i, "event_type": t, "value": v, "props": p, "user_id": u}
    for i, (t, v, p, u) in enumerate(
        [
            ("error", 1.5, "k9", 3),
            ("error", None, "x", 95),
            ("click", 7.0, "k42", 12),
            ("view", 12.5, None, 7),
            ("signup", 0.0, "k9x", 50),
            ("purchase", 19.9, "z", 88),
            ("view", 5.5, "k", None),
        ]
    )
]

_FIELDS = {"event_type": str, "value": float, "props": str, "user_id": int}


def _eval_matcher(m, row):
    v = row.get(m["field"])
    op = m.get("op", "eq")
    if op == "is_null":
        return v is None
    if op == "not_null":
        return v is not None
    if v is None:
        return False  # SQL three-valued logic: comparisons to NULL fail
    if op == "eq":
        return v == m["value"]
    if op == "ne":
        return v != m["value"]
    if op == "re":
        # full-match like the reference's Matcher.matches()
        return re.fullmatch(m["value"], str(v)) is not None
    if op == "contains":
        return m["value"] in str(v)
    if op == "in":
        return v in m["values"]
    if op == "range":
        lo, hi = m.get("min"), m.get("max")
        return (lo is None or v >= lo) and (hi is None or v <= hi)
    if op == "gt":
        return v > m["value"]
    if op == "ge":
        return v >= m["value"]
    if op == "lt":
        return v < m["value"]
    if op == "le":
        return v <= m["value"]
    raise AssertionError(op)


def _eval_rule(rule, row):
    ok = True
    if rule.get("types"):
        ok = ok and row.get("event_type") in rule["types"]
    for m in rule.get("matchers", []):
        ok = ok and _eval_matcher(m, row)
    if rule.get("matchers_or"):
        ok = ok and any(_eval_matcher(m, row) for m in rule["matchers_or"])
    for ex in rule.get("except", []):
        ok = ok and not _eval_rule(ex, row)
    return ok


def _eval_filter(spec, row):
    rules = spec.get("rules", [])
    return True if not rules else any(_eval_rule(r, row) for r in rules)


def _matchers():
    num_field = st.sampled_from(["value", "user_id"])
    str_field = st.sampled_from(["event_type", "props"])
    num = st.one_of(
        st.integers(min_value=-5, max_value=100),
        st.floats(min_value=0, max_value=25, allow_nan=False),
    )
    return st.one_of(
        st.builds(lambda f, v: {"field": f, "op": "eq", "value": v}, num_field, num),
        st.builds(
            lambda f, v: {"field": f, "op": "eq", "value": v},
            str_field, st.sampled_from(["error", "click", "k9", "x", "zzz"]),
        ),
        st.builds(
            lambda f, lo, hi: {"field": f, "op": "range", "min": lo, "max": hi},
            num_field, num, num,
        ),
        st.builds(lambda f, v: {"field": f, "op": "gt", "value": v}, num_field, num),
        st.builds(lambda f, v: {"field": f, "op": "le", "value": v}, num_field, num),
        st.builds(
            lambda f, v: {"field": f, "op": "contains", "value": v},
            str_field, st.sampled_from(["k", "9", "err", "q"]),
        ),
        st.builds(
            lambda f, v: {"field": f, "op": "re", "value": v},
            str_field, st.sampled_from(["^k", "9$", "e.r", "k[0-9]+"]),
        ),
        st.builds(lambda f: {"field": f, "op": "is_null"}, st.sampled_from(list(_FIELDS))),
        st.builds(lambda f: {"field": f, "op": "not_null"}, st.sampled_from(list(_FIELDS))),
    )


def _rules(depth: int):
    base = st.fixed_dictionaries(
        {},
        optional={
            "types": st.lists(
                st.sampled_from(["error", "click", "view", "signup", "purchase"]),
                min_size=1, max_size=3, unique=True,
            ),
            "matchers": st.lists(_matchers(), max_size=3),
            "matchers_or": st.lists(_matchers(), min_size=1, max_size=3),
        },
    )
    if depth <= 0:
        return base
    return st.builds(
        lambda r, ex: {**r, **({"except": ex} if ex else {})},
        base,
        st.lists(_rules(depth - 1), max_size=2),
    )


SPECS = st.fixed_dictionaries({"rules": st.lists(_rules(depth=2), max_size=3)})


@pytest.fixture(scope="module")
def filter_df(spark):
    return spark.createDataFrame([Row(**r) for r in ROWS]).cache()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=SPECS)
def test_compiled_filter_matches_python_semantics(spark, filter_df, spec):
    got = {
        r.rid
        for r in apply_event_filter(filter_df, spec, type_field="event_type")
        .select("rid")
        .collect()
    }
    want = {r["rid"] for r in ROWS if _eval_filter(spec, r)}
    assert got == want, f"spec={spec}"


# --- parser totality fuzz -------------------------------------------------

_JUNK_LINES = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\n\r\x00"
        ),
        min_size=0,
        max_size=200,
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=_JUNK_LINES)
# pinned regressions: exotic whitespace-only lines must DROP, and
# mixed lines must survive, deterministically on every run (round-3
# failure was \x0c; \x1c and \xa0 are isspace() but outside both
# Java \\s and Unicode White_Space / trim semantics respectively)
@example(lines=["\x0c"])
@example(lines=["\x1c", "\x85", "\xa0", "\u2028", "\u3000"])
@example(lines=["\xa0x\xa0", " ok ", ""])
def test_parser_total_on_arbitrary_input(spark, lines):
    """Parse is TOTAL on non-blank input: any junk line lands in the
    raw fallback (or a real payload if it happens to match a probe) —
    never an exception, never a dropped row (Parser.java's Raw payload
    terminates the probe chain the same way). Whitespace-only lines
    are the one deliberate exception: they carry no event and are
    dropped at the scan (blank separators / trailing newlines in real
    log files). Property-based because the probe cascade has 22
    branches of regex/JSON paths that hand-written goldens can't
    sweep."""
    from foxsec_pipeline_spark.parser.parse import ParserCfg, parse_events

    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    out = parse_events(df, ParserCfg())
    rows = out.select("payload_type").collect()
    n_nonblank = sum(1 for ln in lines if ln.strip())
    assert len(rows) == n_nonblank
    assert all(r.payload_type is not None for r in rows)
