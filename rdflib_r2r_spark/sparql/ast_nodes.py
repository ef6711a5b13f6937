"""SPARQL AST: terms, expressions, graph-pattern algebra, query forms.

Mirrors the shape of rdflib's parsed algebra that the reference walks
(reference: rdflib_r2r/sql_converter.py:269-283 parse_sparql_query ->
queryPart dispatch; rdflib_r2r/query_conversions.py:388-419), re-expressed
as plain dataclasses so the engine has no rdflib dependency.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# --------------------------------------------------------------------------
# terms
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Var:
    name: str

    def __str__(self) -> str:  # pragma: no cover - debug aid
        return f"?{self.name}"


@dataclass(frozen=True)
class IRI:
    value: str  # absolute IRI, no angle brackets


@dataclass(frozen=True)
class Lit:
    value: str
    datatype: str | None = None
    language: str | None = None


@dataclass(frozen=True)
class BNodeT:
    """Blank node in a query pattern == a fresh non-projectable variable
    (SPARQL 1.1 §4.1.4)."""

    label: str


# --------------------------------------------------------------------------
# property paths (Pred/Seq/Alt/Inv live in rdflib_r2r_spark.paths; Closure
# adds +/*/? which the reference does not support)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Closure:
    part: object  # path AST
    min0: bool = False  # True for '*', False for '+'


@dataclass(frozen=True)
class Maybe:
    """'?' path modifier (zero or one)."""

    part: object


# --------------------------------------------------------------------------
# expressions
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Op:
    """op in {'||','&&','!','=','!=','<','>','<=','>=','+','-','*','/',
    'neg','pos'}"""

    op: str
    args: tuple


@dataclass(frozen=True)
class Call:
    """Builtin or aggregate call; name uppercased."""

    name: str
    args: tuple
    distinct: bool = False
    separator: str | None = None  # GROUP_CONCAT


@dataclass(frozen=True)
class ExistsExpr:
    pattern: object
    negated: bool = False


@dataclass(frozen=True)
class InExpr:
    expr: object
    options: tuple
    negated: bool = False


AGGREGATES = {"COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT"}


# --------------------------------------------------------------------------
# graph-pattern algebra
# --------------------------------------------------------------------------

@dataclass
class BGP:
    triples: list  # [(s, path-or-IRI, o)]
    graph: object | None = None  # IRI | Var | None (enclosing GRAPH)


@dataclass
class Join:
    left: object
    right: object


@dataclass
class LeftJoin:
    left: object
    right: object
    expr: object | None = None


@dataclass
class Union:
    left: object
    right: object


@dataclass
class Minus:
    left: object
    right: object


@dataclass
class Filter:
    expr: object
    pattern: object


@dataclass
class Extend:
    pattern: object
    var: Var
    expr: object


@dataclass
class ValuesPat:
    vars: list
    rows: list  # list[list[term|None]]; None == UNDEF


@dataclass
class SubSelect:
    query: object  # SelectQuery


# --------------------------------------------------------------------------
# query forms
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Dataset:
    """FROM / FROM NAMED dataset clauses (SPARQL 1.1 13.2): when present,
    the default graph is EXACTLY the merge of `default` (store-default,
    graph-less triples are excluded) and GRAPH patterns range over `named`
    only."""
    default: tuple = ()
    named: tuple = ()


@dataclass
class SelectQuery:
    projection: list  # [Var | (expr, Var)] ; empty == '*'
    where: object
    dataset: object | None = None  # Dataset (FROM / FROM NAMED) or None
    distinct: bool = False
    reduced: bool = False
    group_by: list = field(default_factory=list)  # [expr]
    having: list = field(default_factory=list)  # [expr]
    order_by: list = field(default_factory=list)  # [(expr, ascending)]
    limit: int | None = None
    offset: int | None = None


@dataclass
class AskQuery:
    where: object
    dataset: object | None = None


@dataclass
class ConstructQuery:
    template: list  # [(s, p, o)]
    where: object
    dataset: object | None = None
    limit: int | None = None
    offset: int | None = None


@dataclass
class DescribeQuery:
    terms: list  # [IRI | Var]; empty == all projected vars of where
    where: object | None = None
    dataset: object | None = None
