"""Generate ANSI/DuckDB SQL that reproduces the compiler's triple dump
byte-for-byte — the oracle side of the driver's correctness gate.

This is exactly the shape of the reference's legacy dump engine goldens
(reference: docs/test-results/sqlite-rdb2rdf/R2RMLTC0000.md:7-15 — every
triples-map becomes a ``SELECT s,p,o,g`` arm of a UNION ALL), regenerated
from our mapping dataclasses so Spark plan and SQL text share one source of
truth for templates, encoding, and NULL guards.

For cross-engine byte parity, column term maps used in oracle-paired queries
should set ``datatype`` explicitly.  Double/timestamp columns render via the
canonical XSD lexical twins (canonical.py) when declared in ``column_types``
— pass it for any mapping whose source has such columns.  float32 columns
remain inadvisable (the engines' shortest-round-trip float renderings can
disagree; doubles always agree).
"""

from __future__ import annotations

from rdflib_r2r_spark import terms
from rdflib_r2r_spark.canonical import canonical_datetime_sql, canonical_double_sql
from rdflib_r2r_spark.mapping import TermMap, TriplesMap
from rdflib_r2r_spark.templates import template_to_sql


import re as _re

_SIMPLE_IDENT = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

# union of common DuckDB + Spark SQL reserved words: a table/column named one
# of these parses as a keyword when left bare, so it must be quoted even
# though it matches _SIMPLE_IDENT
_RESERVED = frozenset("""
all alter and any anti array as asc at authorization between both by case cast check
collate column create cross cube current current_date current_time
current_timestamp current_user database delete desc describe distinct div drop
else end escape except exists external extract false fetch filter following
for foreign from full function grant group grouping having if ignore ilike in
inner insert intersect interval into is join lateral leading left like limit
local natural not null nulls offset on only or order outer over overlaps
partition pivot position preceding primary qualify range references regexp
respect right rlike rollup row rows select semi session_user set show some
sort struct table tablesample then time timestamp to trailing true truncate
union unique unknown unpivot update user using values when where window with
""".split())


def _q(ident: str) -> str:
    # simple identifiers stay bare so the emitted SQL runs on BOTH DuckDB
    # (double-quote dialect) and Spark (backtick dialect); exotic names or
    # reserved words get double quotes (DuckDB always, Spark with
    # ansi.doubleQuotedIdentifiers)
    if _SIMPLE_IDENT.match(ident) and ident.lower() not in _RESERVED:
        return ident
    return '"' + ident.replace('"', '""') + '"'


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def term_sql(tm: TermMap, position: str, qualify,
             column_types: dict[str, str] | None = None) -> tuple[str, str, str]:
    """column_types: optional col -> 'double'|'float'|'timestamp' map; those
    columns render via the canonical XSD lexical twins (canonical.py), so the
    oracle stays hash-identical to the Spark compiler's output."""
    ttype = tm.inferred_term_type(position)
    dt = _sq(tm.datatype) if tm.datatype else "CAST(NULL AS STRING)"
    lang = _sq(tm.language) if tm.language else "CAST(NULL AS STRING)"
    null_s = "CAST(NULL AS STRING)"

    if tm.constant is not None:
        if ttype == "RawIRI":  # pre-rendered lexical (chain predicates)
            return _sq(tm.constant), null_s, null_s
        if ttype == "IRI":
            return _sq(terms.wrap_iri(tm.constant)), null_s, null_s
        if ttype == "BlankNode":
            return _sq("_:" + tm.constant), null_s, null_s
        return _sq(tm.constant), dt, lang

    if tm.column is not None:
        kind = (column_types or {}).get(tm.column)
        if kind in ("double", "float"):
            col = canonical_double_sql(qualify(tm.column))
        elif kind == "timestamp":
            col = canonical_datetime_sql(qualify(tm.column))
        else:
            col = f"CAST({qualify(tm.column)} AS STRING)"
        if ttype == "IRI":
            if tm.base_iri:
                b = _sq(tm.base_iri)[1:-1]
                col = (
                    f"CASE WHEN regexp_matches({col}, '^[A-Za-z][A-Za-z0-9+.-]*:') "
                    f"THEN {col} ELSE '{b}' || {col} END"
                )
            return f"'<' || {col} || '>'", null_s, null_s
        if ttype == "BlankNode":
            return f"'_:' || {terms.iri_safe_sql(qualify(tm.column))}", null_s, null_s
        return col, dt, lang

    if tm.template is not None:
        if ttype == "IRI":
            return template_to_sql(tm.template, qualify, iri=True, wrap=True), null_s, null_s
        if ttype == "BlankNode":
            return (
                "'_:' || " + template_to_sql(tm.template, qualify, iri=True, wrap=False),
                null_s,
                null_s,
            )
        return template_to_sql(tm.template, qualify, iri=False, wrap=False), dt, lang

    raise ValueError(f"term map has no constant/column/template: {tm}")


def _source_sql(tmap: TriplesMap, table_names: dict[str, str]) -> str:
    if tmap.source.table is not None:
        return table_names.get(tmap.source.table, _q(tmap.source.table))
    return f"({tmap.source.sql_query})"


def mapping_to_duckdb_sql(
    tmaps: list[TriplesMap],
    table_names: dict[str, str] | None = None,
    with_graph: bool = True,
    column_types: dict[str, dict[str, str]] | None = None,
) -> str:
    """Full-dump UNION ALL SQL over all arms, same arm enumeration order as
    ``SparkMappingCompiler.compile`` is irrelevant (driver compare is
    order-insensitive), but the row SETS are identical."""
    table_names = table_names or {}
    column_types = column_types or {}
    by_name = {tm.name: tm for tm in tmaps}
    null_s = "CAST(NULL AS STRING)"
    arms: list[str] = []

    def graph_terms(tmap, pom):
        graphs = tuple(pom.graphs) + tuple(tmap.subject_map.graphs)
        return list(graphs) if graphs else [None]

    for tmap in tmaps:
        src = _source_sql(tmap, table_names)
        ct = column_types.get(tmap.source.table or "", {})
        qc = lambda c: f"c.{_q(c)}"  # noqa: E731

        def scan_arm(subj_sql, pred_sql, obj_sql, dt_sql, lang_sql, g_sql, from_sql):
            # NULL guard on all three term positions, mirroring the compiler
            # (a NULL input column produces no triple; constant predicates
            # fold the guard away).
            arms.append(
                f"SELECT {subj_sql} AS subj, {pred_sql} AS pred, {obj_sql} AS obj, "
                f"{dt_sql} AS obj_dt, {lang_sql} AS obj_lang"
                + (f", {g_sql} AS graph" if with_graph else "")
                + f" FROM {from_sql}"
                f" WHERE ({subj_sql}) IS NOT NULL AND ({pred_sql}) IS NOT NULL"
                f" AND ({obj_sql}) IS NOT NULL"
            )

        subj_sql, _, _ = term_sql(tmap.subject_map, "S", qc, ct)
        for cls in tmap.subject_map.classes:
            for g in (list(tmap.subject_map.graphs) or [None]):
                scan_arm(
                    subj_sql,
                    _sq(terms.wrap_iri(terms.RDF_TYPE)),
                    _sq(terms.wrap_iri(cls)),
                    null_s,
                    null_s,
                    term_sql(g, "G", qc)[0] if g is not None else null_s,
                    f"{src} c",
                )
        for pom in tmap.pomaps:
            for pred in pom.predicates:
                pred_sql, _, _ = term_sql(pred, "P", qc)
                for obj in pom.objects:
                    for g in graph_terms(tmap, pom):
                        g_sql = term_sql(g, "G", qc)[0] if g is not None else null_s
                        if obj.parent_triples_map is not None:
                            parent = by_name[obj.parent_triples_map]
                            psrc = _source_sql(parent, table_names)
                            qp = lambda c: f"p.{_q(c)}"  # noqa: E731
                            obj_sql, _, _ = term_sql(parent.subject_map, "S", qp)
                            if obj.join_conditions:
                                cond = " AND ".join(
                                    f"c.{_q(jc.child)} = p.{_q(jc.parent)}"
                                    for jc in obj.join_conditions
                                )
                                from_sql = f"{src} c JOIN {psrc} p ON {cond}"
                            else:
                                # same logical table, same row
                                obj_sql, _, _ = term_sql(parent.subject_map, "S", qc)
                                from_sql = f"{src} c"
                            scan_arm(subj_sql, pred_sql, obj_sql, null_s, null_s, g_sql, from_sql)
                        else:
                            obj_sql, dt_sql, lang_sql = term_sql(obj, "O", qc, ct)
                            scan_arm(subj_sql, pred_sql, obj_sql, dt_sql, lang_sql, g_sql, f"{src} c")

    return "\nUNION ALL\n".join(arms)
