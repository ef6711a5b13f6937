"""R2RML IRI/literal templates: parse, expand, invert — in Python, Spark
Column, and DuckDB SQL form.

Semantics mirror the reference exactly:

- parsing/expansion = ``string.Formatter().parse`` over ``.../{col}...``
  (reference: rdflib_r2r/conversion_utils.py:497-514 ``format_template``);
- inversion = regex fullmatch with one greedy ``(.*)`` group per column
  (reference: rdflib_r2r/conversion_utils.py:517-531 ``parse_with_template``).

Inversion is the reference's key optimizer trick (SURVEY.md §4): a concrete
IRI compared against a template collapses to typed comparisons on the raw key
columns — we reuse it at mapping-compile time so joins/filters run on narrow
key columns, never on rendered concat() strings.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from string import Formatter

from pyspark.sql import Column
from pyspark.sql import functions as F

from rdflib_r2r_spark.terms import (
    iri_safe_col,
    iri_safe_py,
    iri_safe_sql,
    iri_safe_sql_spark,
)


@dataclass(frozen=True)
class TemplatePart:
    prefix: str
    column: str | None


def parse_template(template: str) -> list[TemplatePart]:
    # R2RML allows \{ and \} escapes in templates (R2RML §7.3); shield them
    # from the Formatter and restore them as literal braces in prefixes
    shielded = template.replace("\\{", "\x00").replace("\\}", "\x01")
    parts: list[TemplatePart] = []
    for prefix, colname, _spec, _conv in Formatter().parse(shielded):
        prefix = (prefix or "").replace("\x00", "{").replace("\x01", "}")
        parts.append(TemplatePart(prefix=prefix, column=colname or None))
    return parts


def template_columns(template: str) -> list[str]:
    return [p.column for p in parse_template(template) if p.column]


def expand_template_py(template: str, row: dict, iri: bool = True) -> str | None:
    """Expand with Python values; IRI templates percent-encode each slot.
    Returns None if any referenced value is NULL (R2RML: no term, no triple)."""
    out: list[str] = []
    for part in parse_template(template):
        out.append(part.prefix)
        if part.column:
            v = row.get(part.column)
            if v is None:
                return None
            s = _canonical_str(v)
            out.append(iri_safe_py(s) if iri else s)
    return "".join(out)


def _canonical_str(v) -> str:
    # bool before int (bool is an int subclass)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(v)  # keep '20.0' — matches str(float) on both engines
    return str(v)


def template_to_column(
    template: str,
    resolve,
    iri: bool = True,
    wrap: bool = True,
) -> Column:
    """Build a Spark Column that renders the template.

    ``resolve(colname) -> Column`` lets the caller qualify columns
    (aliases, joined parents). NULL in any slot propagates to NULL via
    F.concat's null semantics. ``wrap`` adds the ``<...>`` IRI lexical
    wrapper of our term encoding.
    """
    exprs: list[Column] = []
    for part in parse_template(template):
        if part.prefix:
            exprs.append(F.lit(part.prefix))
        if part.column:
            c = resolve(part.column).cast("string")
            exprs.append(iri_safe_col(c) if iri else c)
    if wrap and iri:
        exprs = [F.lit("<"), *exprs, F.lit(">")]
    if not exprs:
        return F.lit("")
    return F.concat(*exprs)


def template_to_spark_expr(
    template: str,
    qualify,
    iri: bool = True,
    wrap: bool = True,
) -> Column:
    """Fast-path twin of :func:`template_to_column`: render the SAME
    expression as one Spark-SQL text parsed by a single ``F.expr`` call.

    Why: the Column-API construction is ~100 Py4J round trips per term
    (one per replace/lit in the iri-safe chain), which made SPARQL query
    COMPILE time rival execution time (bi4: ~2.1s compile, ~1.5s of it
    in template renders).  ``F.expr`` ships the whole tree in one round
    trip; the generated text is the engine-neutral dialect subset
    (template_to_sql/iri_safe_sql) that both Spark and DuckDB parse, so
    the expression semantics are byte-identical to the slow path (pinned
    by tests).

    ``qualify(colname) -> str`` must return a Spark-SQL expression string
    for the source column (e.g. backtick-qualified ``alias.col``).

    Round 7: slots render via :func:`terms.iri_safe_sql_spark` — the
    RLIKE-gated chain (29 string rebuilds per row -> one containment scan
    for clean values).  The oracle side keeps the ungated
    ``template_to_sql`` text (frozen); value parity is pinned by tests.
    """
    return F.expr(
        template_to_sql(template, qualify=qualify, iri=iri, wrap=wrap,
                        _safe_fn=iri_safe_sql_spark)
    )


def template_to_sql(
    template: str,
    qualify=lambda c: f'"{c}"',
    iri: bool = True,
    wrap: bool = True,
    _safe_fn=None,
) -> str:
    """DuckDB-SQL twin of :func:`template_to_column` (same bytes).

    Uses ``||`` concatenation, which propagates NULL like F.concat.
    Default text is the FROZEN oracle dialect; ``_safe_fn`` lets the
    Spark fast path substitute the gated encoder (never reaches DuckDB).
    """
    safe = _safe_fn or iri_safe_sql
    def lit_sql(s: str) -> str:
        # engine-neutral string literal: Spark C-escapes backslashes inside
        # quotes, DuckDB does not — emit backslash as chr(92) so the same
        # text parses identically in both (see iri_safe_sql)
        parts = s.split("\\")
        quoted = ["'" + p.replace("'", "''") + "'" for p in parts]
        return " || chr(92) || ".join(quoted) if len(quoted) > 1 else quoted[0]

    exprs: list[str] = []
    for part in parse_template(template):
        if part.prefix:
            exprs.append(lit_sql(part.prefix))
        if part.column:
            c = f"CAST({qualify(part.column)} AS STRING)"
            exprs.append(safe(c) if iri else c)
    if wrap and iri:
        exprs = ["'<'", *exprs, "'>'"]
    if not exprs:
        return "''"
    return " || ".join(exprs)


def invert_template_py(s: str, template: str) -> dict[str, str] | None:
    """Match a concrete string against the template; greedy ``(.*)`` per
    column, full match (reference parse_with_template semantics). Returns
    still-percent-encoded captured strings."""
    pattern: list[str] = []
    columns: list[str] = []
    for part in parse_template(template):
        if part.prefix:
            pattern.append(re.escape(part.prefix))
        if part.column:
            columns.append(part.column)
            pattern.append("(.*)")
    m = re.fullmatch("".join(pattern), s)
    if not m:
        return None
    return {col: m.group(i + 1) for i, col in enumerate(columns)}


def templates_compatible(t1: str, t2: str) -> bool:
    """Can two templates ever render the same string? Conservative check used
    for impossible-branch pruning and template-aware equality
    (reference: rdflib_r2r/conversion_utils.py:293-353 ``try_match_templates``):
    equal skeletons (prefixes) => compare keys; different skeletons => treat
    as never-equal only when neither could match the other's shape."""
    skel1 = [p.prefix for p in parse_template(t1)]
    skel2 = [p.prefix for p in parse_template(t2)]
    return skel1 == skel2
