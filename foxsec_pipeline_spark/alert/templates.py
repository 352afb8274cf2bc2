"""Deterministic alert-body templating — the engine analog of the
reference's FreeMarker stack (`alert/TemplateManager.java`,
`alert/AlertSlack.java` createAlertBody, `alert/AlertMailer.java`
createAlertMailBody, template files under
`src/main/resources/alert/templates/`).

Design: a template is an ordered list of sections; each section has a
text body with ``${placeholder}`` substitutions and renders only when
its guard passes — the deterministic subset of FreeMarker the
reference's templates actually use (`<#if key == "v">`, `<#if key??>`).
Placeholders resolve to alert columns (``alert.alert_id``,
``summary`` …) or metadata map entries. A template compiles ONCE to a
single Catalyst concat expression, so rendering is a JVM-side
projection over the alerts DataFrame — no per-row Python, no UDF.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALERT_COLS = {
    "alert.alertId": "alert_id",
    "alert.alert_id": "alert_id",
    "alert.summary": "summary",
    "summary": "summary",
    "category": "category",
    "subcategory": "subcategory",
    "severity": "severity",
    "timestamp": "timestamp",
}

_PLACEHOLDER_RX = re.compile(r"\$\{([^}]+)\}")


@dataclass
class Section:
    """One conditional block of a template.

    `when` is an optional (key, value) equality guard over a metadata
    entry or alert column (`<#if key == "value">` analog); `require`
    lists placeholders that must be non-null for the section to render
    (`<#if key??>` analog — missing keys skip the section instead of
    erroring like FreeMarker does).
    """

    text: str
    when: tuple[str, str] | None = None
    require: list[str] = field(default_factory=list)


def _ref(name: str) -> Column:
    col = _ALERT_COLS.get(name)
    if col is not None:
        return F.col(col).cast("string")
    return F.col("metadata").getItem(name)


def _section_column(s: Section) -> Column:
    parts: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER_RX.finditer(s.text):
        if m.start() > pos:
            parts.append(F.lit(s.text[pos : m.start()]))
        parts.append(F.coalesce(_ref(m.group(1)), F.lit("")))
        pos = m.end()
    if pos < len(s.text):
        parts.append(F.lit(s.text[pos:]))
    body = F.concat(*parts) if parts else F.lit("")
    cond = F.lit(True)
    if s.when is not None:
        cond = cond & (_ref(s.when[0]) == F.lit(s.when[1]))
    for req in s.require:
        cond = cond & _ref(req).isNotNull()
    return F.when(cond, body).otherwise(F.lit(""))


def compile_template(sections: list[Section]) -> Column:
    """Sections -> one string Column; compose with select/withColumn."""
    return F.concat(*[_section_column(s) for s in sections])


def render_template(alerts: DataFrame, sections: list[Section],
                    out_col: str = "body") -> DataFrame:
    """Render a template over an alerts DataFrame (ALERT_SCHEMA rows)."""
    return alerts.withColumn(out_col, compile_template(sections))


# --- FreeMarker-subset compiler for the reference's .ftlh files -----------
#
# The reference renders alert bodies with FreeMarker
# (`alert/TemplateManager.java`; templates under
# `src/main/resources/alert/templates/`). Its template files use a
# small deterministic subset — line-level `<#if k == "v">`,
# `<#if k != "v">`, `<#if k??>`, `<#elseif ...>`, `<#else>`, `</#if>`
# (nested), and `${placeholder}` — which compiles directly to ONE
# Catalyst conditional-concat expression: rendering stays a JVM-side
# projection, no per-row Python. Byte-parity with the reference's own
# golden outputs (src/test/resources/testdata/templateoutput/) is
# asserted in tests/test_templates.py.
#
# Documented divergences from full FreeMarker: a `== / !=` comparison
# against a MISSING key evaluates false / true respectively instead of
# raising (FreeMarker errors on undefined variables; the reference's
# pipelines always set the compared keys, and erroring per-row inside
# a projection is not a thing a column expression should do).

_FTL_DIRECTIVE_RX = re.compile(r"^\s*<(#if|#elseif|#else|/#if)(\s+[^>]*?|/)?>\s*$")
_FTL_EQ_RX = re.compile(r'^(\S+)\s*(==|!=)\s*"([^"]*)"$')
_FTL_DEF_RX = re.compile(r"^(\S+)\s*\?\?$")


@dataclass
class _FtlIf:
    # branches: [(condition-string | None for <#else>, child nodes)]
    branches: list[tuple[str | None, list]] = field(default_factory=list)


def parse_ftlh(text: str) -> list:
    """Parse the deterministic FreeMarker subset into an AST of
    str (verbatim content incl. newline) and `_FtlIf` nodes.

    Directive-only LINES vanish with their newline (FreeMarker's
    default white-space handling for tag lines — confirmed against the
    reference's golden outputs); all other lines are content."""
    root: list = []
    stack: list[_FtlIf] = []

    def _bucket() -> list:
        if not stack:
            return root
        return stack[-1].branches[-1][1]

    for line in text.splitlines(keepends=True):
        m = _FTL_DIRECTIVE_RX.match(line)
        if m is None:
            _bucket().append(line)
            continue
        kind = m.group(1)
        arg = (m.group(2) or "").strip().rstrip("/").strip()
        if kind == "#if":
            node = _FtlIf(branches=[(arg, [])])
            _bucket().append(node)
            stack.append(node)
        elif kind == "#elseif":
            if not stack:
                raise ValueError("elseif outside if")
            stack[-1].branches.append((arg, []))
        elif kind == "#else":
            if not stack:
                raise ValueError("else outside if")
            stack[-1].branches.append((None, []))
        else:  # /#if
            if not stack:
                raise ValueError("unbalanced </#if>")
            stack.pop()
    if stack:
        raise ValueError("unterminated <#if>")
    return root


def _ftl_cond(expr: str) -> Column:
    m = _FTL_EQ_RX.match(expr)
    if m:
        key, op, value = m.groups()
        if op == "==":
            return _ref(key) == F.lit(value)
        # missing key counts as "not equal" (renders the section)
        return F.coalesce(_ref(key) != F.lit(value), F.lit(True))
    m = _FTL_DEF_RX.match(expr)
    if m:
        return _ref(m.group(1)).isNotNull()
    raise ValueError(f"unsupported FreeMarker condition: {expr!r}")


def _ftl_text_col(chunk: str) -> list[Column]:
    parts: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER_RX.finditer(chunk):
        if m.start() > pos:
            parts.append(F.lit(chunk[pos : m.start()]))
        parts.append(F.coalesce(_ref(m.group(1)).cast("string"), F.lit("")))
        pos = m.end()
    if pos < len(chunk):
        parts.append(F.lit(chunk[pos:]))
    return parts


def _ftl_nodes_col(nodes: list) -> Column:
    parts: list[Column] = []
    buf: list[str] = []

    def _flush():
        if buf:
            parts.extend(_ftl_text_col("".join(buf)))
            buf.clear()

    for nd in nodes:
        if isinstance(nd, str):
            buf.append(nd)
            continue
        _flush()
        col = F.lit("")
        for cond, children in reversed(nd.branches):
            child = _ftl_nodes_col(children)
            col = child if cond is None else F.when(_ftl_cond(cond), child).otherwise(col)
        parts.append(col)
    _flush()
    return F.concat(*parts) if parts else F.lit("")


def compile_ftlh(text: str) -> Column:
    """FreeMarker-subset template source -> one string Column."""
    return _ftl_nodes_col(parse_ftlh(text))


def render_ftlh(alerts: DataFrame, text: str, out_col: str = "body") -> DataFrame:
    """Render a .ftlh template source over an alerts DataFrame."""
    return alerts.withColumn(out_col, compile_ftlh(text))


# --- built-in templates mirroring the reference's resources ---------------


def render_amo_slack_catchall(alerts: DataFrame, out_col: str = "body") -> DataFrame:
    """slack/catchall/amo.ftlh semantics (Amo.java:34
    SLACK_CATCHALL_TEMPLATE): special body for amo_cloud_submission,
    plain summary otherwise, alert id appended. FreeMarker expresses
    the fallback as `<#if category != ...>`; the Section guard is
    equality-only, so the inequality lives in an explicit when() here."""
    cloud = compile_template(
        [
            Section(
                text="${monitored_resource} cloud provider addon submission "
                     "from ${sourceaddress}, guid ${addon_guid} isapi "
                     "${addon_from_api} user_id ${addon_user_id} "
                     "(${alert.alertId})"
            )
        ]
    )
    fallback = compile_template([Section(text="${summary} (${alert.alertId})")])
    return alerts.withColumn(
        out_col,
        F.when(F.col("subcategory") == "amo_cloud_submission", cloud).otherwise(
            fallback
        ),
    )


# slack/authprofile.ftlh: auth vs auth_session phrasing + optional
# state-action explanation + alert id footer
AUTHPROFILE_SLACK = [
    Section(
        text="An authentication event for user ${username} was detected to "
             "access ${object} from ${sourceaddress}.",
        when=("auth_alert_type", "auth"),
    ),
    Section(
        text="A sensitive event within ${object} was performed by user "
             "${username} from ${sourceaddress}.",
        when=("auth_alert_type", "auth_session"),
    ),
    Section(
        text=" This event occurred at ${event_timestamp}.",
        require=["event_timestamp"],
    ),
    Section(
        text=" The source address was new, and does not appear to be near "
             "any previously known location.",
        when=("state_action_type", "unknown_ip_outside_geo"),
    ),
    Section(
        text=" The source address was new, however is near a previously "
             "known location so this message is informational.",
        when=("state_action_type", "unknown_ip_within_geo"),
    ),
    Section(text=" alert id: ${alert.alertId}"),
]


# email body (AlertMailer.createAlertMailBody): subject is the
# summary; the text body carries summary + metadata footer
EMAIL_BODY = [
    Section(text="${summary}\n\n"),
    Section(text="alert id: ${alert.alertId}\ncategory: ${category}\n"
                 "severity: ${severity}\n"),
]
