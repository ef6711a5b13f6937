"""Canonical XSD lexical forms (W3C R2RML "natural RDF lexical form").

R2RML §10.2 says the lexical form of a literal generated from a column value
is the *canonical lexical representation* of the corresponding XSD datatype
(reference: rdflib_r2r/conversion_utils.py:497-514 reaches the same forms via
rdflib's Literal normalization).  The two that differ from a plain SQL
CAST(x AS STRING) in both Spark and DuckDB:

- ``xsd:double``: always scientific notation with a mantissa in [1, 10) and
  no redundant digits — ``20.0`` renders ``2.0E1`` (W3C rdb2rdf TC0005a/b,
  TC0012a/e).
- ``xsd:dateTime``: a ``T`` between date and time — both engines CAST with a
  space (TC0016b/c).

Each transform ships as a synchronized twin: a Spark ``Column`` builder and a
portable SQL-text builder that evaluates identically on Spark AND DuckDB
(STRING alias, instr/substr/regexp_replace subset common to both).  Both
operate on the engine's CAST-to-string output, which for doubles is the
shortest round-trip representation in either engine — the digit sequence is
therefore identical across engines even when the notation differs
(Java prints ``1.0E7`` where DuckDB prints ``10000000.0``), so the
canonicalized forms agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# -- xsd:double ---------------------------------------------------------------

def canonical_double_col(col: Column) -> Column:
    """Spark: canonical xsd:double lexical of a double/float column."""
    s = col.cast("string")
    neg = F.when(s.startswith("-"), F.lit("-")).otherwise(F.lit(""))
    u = F.upper(F.when(s.startswith("-"), s.substr(F.lit(2), F.length(s))).otherwise(s))
    epos = F.instr(u, "E")
    mant = F.when(epos > 0, u.substr(F.lit(1), epos - 1)).otherwise(u)
    exp0 = F.when(epos > 0, u.substr(epos + 1, F.length(u)).cast("int")).otherwise(F.lit(0))
    dpos = F.instr(mant, ".")
    ip = F.when(dpos > 0, mant.substr(F.lit(1), dpos - 1)).otherwise(mant)
    digits = F.replace(mant, F.lit("."), F.lit(""))
    stripped = F.regexp_replace(digits, "^0+", "")
    k = F.length(digits) - F.length(stripped) + 1
    e = (exp0 + F.length(ip) - k).cast("int")
    first = stripped.substr(F.lit(1), F.lit(1))
    rest0 = F.regexp_replace(stripped.substr(F.lit(2), F.length(stripped)), "0+$", "")
    frac = F.when(rest0 == "", F.lit("0")).otherwise(rest0)
    main = F.concat(neg, first, F.lit("."), frac, F.lit("E"), e.cast("string"))
    return (
        F.when(s.isNull(), F.lit(None).cast("string"))
        .when(s.isin("Infinity", "inf", "INF"), F.lit("INF"))
        .when(s.isin("-Infinity", "-inf", "-INF"), F.lit("-INF"))
        .when(s.isin("NaN", "nan"), F.lit("NaN"))
        .when(stripped == "", F.concat(neg, F.lit("0.0E0")))
        .otherwise(main)
    )


def canonical_double_sql(x: str) -> str:
    """Portable (Spark+DuckDB) SQL: canonical xsd:double lexical of the
    numeric expression ``x``.  Mirrors :func:`canonical_double_col`."""
    s = f"(CAST({x} AS STRING))"
    neg = f"(CASE WHEN {s} LIKE '-%' THEN '-' ELSE '' END)"
    u = f"(upper(CASE WHEN {s} LIKE '-%' THEN substr({s}, 2) ELSE {s} END))"
    epos = f"(instr({u}, 'E'))"
    mant = f"(CASE WHEN {epos} > 0 THEN substr({u}, 1, {epos} - 1) ELSE {u} END)"
    exp0 = f"(CASE WHEN {epos} > 0 THEN CAST(substr({u}, {epos} + 1) AS INT) ELSE 0 END)"
    dpos = f"(instr({mant}, '.'))"
    ip = f"(CASE WHEN {dpos} > 0 THEN substr({mant}, 1, {dpos} - 1) ELSE {mant} END)"
    digits = f"(replace({mant}, '.', ''))"
    stripped = f"(regexp_replace({digits}, '^0+', ''))"
    k = f"(length({digits}) - length({stripped}) + 1)"
    e = f"(CAST({exp0} + length({ip}) - {k} AS INT))"
    first = f"(substr({stripped}, 1, 1))"
    rest0 = f"(regexp_replace(substr({stripped}, 2), '0+$', ''))"
    frac = f"(CASE WHEN {rest0} = '' THEN '0' ELSE {rest0} END)"
    main = f"(concat({neg}, {first}, '.', {frac}, 'E', CAST({e} AS STRING)))"
    return (
        f"(CASE WHEN {s} IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN {s} IN ('Infinity', 'inf', 'INF') THEN 'INF' "
        f"WHEN {s} IN ('-Infinity', '-inf', '-INF') THEN '-INF' "
        f"WHEN {s} IN ('NaN', 'nan') THEN 'NaN' "
        f"WHEN {stripped} = '' THEN concat({neg}, '0.0E0') "
        f"ELSE {main} END)"
    )


def column_types_for_canonical(schema) -> dict[str, str]:
    """Spark StructType -> {col: 'double'|'float'|'timestamp'} for the columns
    whose natural lexical form needs canonicalization (for threading into
    ``oracle.mapping_to_duckdb_sql(column_types=...)``)."""
    from pyspark.sql import types as T

    out: dict[str, str] = {}
    for f in schema.fields:
        if isinstance(f.dataType, T.DoubleType):
            out[f.name] = "double"
        elif isinstance(f.dataType, T.FloatType):
            out[f.name] = "float"
        elif isinstance(f.dataType, T.TimestampType):
            out[f.name] = "timestamp"
    return out


# -- xsd:dateTime -------------------------------------------------------------

def canonical_datetime_col(col: Column) -> Column:
    """Spark: canonical xsd:dateTime lexical (``T`` separator)."""
    return F.replace(col.cast("string"), F.lit(" "), F.lit("T"))


def canonical_datetime_sql(x: str) -> str:
    return f"(replace(CAST({x} AS STRING), ' ', 'T'))"
