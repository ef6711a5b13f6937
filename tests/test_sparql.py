"""SPARQL front-end tests: ports of the reference's SQL-converter SELECT
cases (reference: tests/test_sql_converter.py) re-asserted on RESULT SETS
over an inline Northwind-shaped fixture, plus parser/evaluator unit checks.

The reference asserts generated SQL text; this engine asserts the answers
(the SQL is Catalyst's concern), which also covers the semantics the
reference could only check by executing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdflib_r2r_spark.mapping import (
    JoinCondition,
    LogicalSource,
    PredicateObjectMap,
    SubjectMap,
    TermMap,
    TriplesMap,
    const_iri,
)
from rdflib_r2r_spark import terms
from rdflib_r2r_spark.sparql import SparkR2RStore, parse_query
from rdflib_r2r_spark.sparql.parser import SparqlNotImplemented, SparqlSyntaxError
from rdflib_r2r_spark.sparql.store import URI

DEMO = "http://localhost:8890/schemas/Demo/"
BASE = "http://localhost:8890/Demo/"
NS = {"Demo": DEMO}


def demo_tmaps() -> list[TriplesMap]:
    """Northwind-subset mapping shaped like the reference's fixture
    (reference: tests/northwind/NorthwindR2RML.ttl): Orders + Shippers with
    a referencing-object map Demo:shippers_of_orders joining
    ShipperID = ShipVia."""
    orders = TriplesMap(
        name="Orders",
        source=LogicalSource(table="Orders"),
        subject_map=SubjectMap(template=BASE + "orders/{OrderID}",
                               classes=(DEMO + "Orders",)),
        pomaps=(
            PredicateObjectMap(predicates=(const_iri(DEMO + "orderid"),),
                               objects=(TermMap(column="OrderID", datatype=terms.XSD_INTEGER),)),
            PredicateObjectMap(predicates=(const_iri(DEMO + "freight"),),
                               objects=(TermMap(column="Freight", datatype=terms.XSD_DOUBLE),)),
            PredicateObjectMap(predicates=(const_iri(DEMO + "shipcountry"),),
                               objects=(TermMap(column="ShipCountry"),)),
            PredicateObjectMap(predicates=(const_iri(DEMO + "shipcity"),),
                               objects=(TermMap(column="ShipCity"),)),
            PredicateObjectMap(predicates=(const_iri(DEMO + "orderdate"),),
                               objects=(TermMap(column="OrderDate"),)),
            PredicateObjectMap(predicates=(const_iri(DEMO + "shippeddate"),),
                               objects=(TermMap(column="ShippedDate"),)),
        ),
    )
    shippers = TriplesMap(
        name="Shippers",
        source=LogicalSource(table="Shippers"),
        subject_map=SubjectMap(template=BASE + "shippers/{ShipperID}",
                               classes=(DEMO + "Shippers",)),
        pomaps=(
            PredicateObjectMap(predicates=(const_iri(DEMO + "shipperid"),),
                               objects=(TermMap(column="ShipperID", datatype=terms.XSD_INTEGER),)),
            PredicateObjectMap(predicates=(const_iri(DEMO + "companyname"),),
                               objects=(TermMap(column="CompanyName"),)),
            PredicateObjectMap(
                predicates=(const_iri(DEMO + "shippers_of_orders"),),
                objects=(TermMap(parent_triples_map="Orders",
                                 join_conditions=(JoinCondition(child="ShipperID", parent="ShipVia"),)),),
            ),
        ),
    )
    return [orders, shippers]


@pytest.fixture(scope="module")
def store(spark):
    orders = spark.createDataFrame(
        [
            (1, 1, 3.50, "France", "Reims", "1996-07-04", "1996-07-16"),
            (2, 1, 11.61, "Germany", "Munster", "1996-07-05", "1996-07-10"),
            (3, 2, 65.83, "Brazil", "Rio", "1996-07-08", "1996-07-08"),
            (4, 2, 41.34, "France", "Lyon", "1996-07-08", None),
        ],
        "OrderID int, ShipVia int, Freight double, ShipCountry string, "
        "ShipCity string, OrderDate string, ShippedDate string",
    )
    shippers = spark.createDataFrame(
        [(1, "Speedy Express"), (2, "United Package")],
        "ShipperID int, CompanyName string",
    )
    return SparkR2RStore(
        spark, {"Orders": orders, "Shippers": shippers}, demo_tmaps(), init_ns=NS
    )


def rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


# -- ports of reference test_sql_converter.py SELECT cases -----------------------


def test_order_value_by_id(store):
    # reference: test_sql_converter.py:83
    df = store.query("select ?v { ?o a Demo:Orders; Demo:orderid 1; Demo:freight ?v}")
    # canonical xsd:double lexical (W3C TC0005a form)
    assert rows(df, "v") == {("3.5E0",)}


def test_concrete_order_value(store):
    # reference: test_sql_converter.py:87 — constant-subject inversion
    df = store.query(f"select ?v {{ <{BASE}orders/1> Demo:freight ?v}}")
    assert rows(df, "v") == {("3.5E0",)}


def test_concrete_order_concrete_value(store):
    # reference: test_sql_converter.py:91
    df = store.query(f"select (1 as ?k) {{ <{BASE}orders/1> Demo:freight 3.50}}")
    assert rows(df, "k") == {(1,)}


def test_look_up_by_value_without_class(store):
    # reference: test_sql_converter.py:95 — renders the subject IRI
    df = store.query("select ?o { ?o Demo:freight 3.50}")
    assert rows(df, "o") == {(f"<{BASE}orders/1>",)}


def test_look_up_by_value_and_return_props(store):
    # reference: test_sql_converter.py:105
    df = store.query("select ?sco ?sci { ?o Demo:freight 3.50; Demo:shipcountry ?sco; Demo:shipcity ?sci }")
    assert rows(df, "sco", "sci") == {("France", "Reims")}


def test_look_up_by_value_with_class(store):
    # reference: test_sql_converter.py:110
    df = store.query("select ?o { ?o a Demo:Orders; Demo:freight 3.50}")
    assert rows(df, "o") == {(f"<{BASE}orders/1>",)}


def test_shipped_same_day(store):
    # reference: test_sql_converter.py:115 — same var twice in one star
    df = store.query("select ?o { ?o a Demo:Orders; Demo:shippeddate ?d; Demo:orderdate ?d. }")
    assert rows(df, "o") == {(f"<{BASE}orders/3>",)}


def test_join(store):
    # reference: test_sql_converter.py:120 — ref-object map raw-key join
    df = store.query(
        "select ?shid ?fr { ?sh Demo:shipperid ?shid; Demo:shippers_of_orders ?o. ?o Demo:freight ?fr. }"
    )
    assert rows(df, "shid", "fr") == {
        ("1", "3.5E0"), ("1", "1.161E1"), ("2", "6.583E1"), ("2", "4.134E1"),
    }


def test_join_two_iris(store):
    # reference: test_sql_converter.py:126
    df = store.query("select ?sh ?o { ?sh Demo:shippers_of_orders ?o }")
    assert len(rows(df, "sh", "o")) == 4


def test_join_two_iris_second_const(store):
    # reference: test_sql_converter.py:132 — const object inverted on parent
    df = store.query(f"select ?sh {{ ?sh Demo:shippers_of_orders <{BASE}orders/1> }}")
    assert rows(df, "sh") == {(f"<{BASE}shippers/1>",)}


def test_join_with_where(store):
    # reference: test_sql_converter.py:138
    df = store.query(
        "select ?cn { ?sh Demo:companyname ?cn; Demo:shippers_of_orders ?o. "
        "?o Demo:shipcountry 'Brazil' }"
    )
    assert rows(df, "cn") == {("United Package",)}


def test_filter(store):
    # reference: test_sql_converter.py:144
    df = store.query("select ?o { ?o Demo:freight ?fr FILTER(?fr > 40) }")
    assert rows(df, "o") == {(f"<{BASE}orders/3>",), (f"<{BASE}orders/4>",)}


def test_union(store):
    # reference: test_sql_converter.py:149
    df = store.query(
        "select ?n { { ?s Demo:companyname ?n } UNION { ?s Demo:shipcity ?n } }"
    )
    assert len(df.collect()) == 6


def test_union3(store):
    # reference: test_sql_converter.py:157
    df = store.query(
        "select ?n { { ?s Demo:companyname ?n } UNION { ?s Demo:shipcity ?n } "
        "UNION { ?s Demo:shipcountry ?n } }"
    )
    assert len(df.collect()) == 10


def test_sparql_join_two_tables(store):
    # reference: test_sql_converter.py:191 — join through shared order var
    df = store.query(
        "select ?cn ?sco { ?sh Demo:companyname ?cn; Demo:shippers_of_orders ?o. "
        "?o Demo:shipcountry ?sco } ORDER BY ?cn ?sco"
    )
    assert rows(df, "cn", "sco") == {
        ("Speedy Express", "France"), ("Speedy Express", "Germany"),
        ("United Package", "Brazil"), ("United Package", "France"),
    }


def test_orderby_limit(store):
    # reference: test_sql_converter.py:206
    df = store.query("select ?fr { ?o Demo:freight ?fr } ORDER BY ?fr LIMIT 2")
    assert [r["fr"] for r in df.collect()] == ["3.5E0", "1.161E1"]


def test_orderby_desc_limit_offset(store):
    # reference: test_sql_converter.py:214
    df = store.query("select ?fr { ?o Demo:freight ?fr } ORDER BY DESC(?fr) LIMIT 2 OFFSET 1")
    assert [r["fr"] for r in df.collect()] == ["4.134E1", "1.161E1"]


def test_const_query(store):
    # reference: test_sql_converter.py:234
    df = store.query("select (1 as ?one) {}")
    assert rows(df, "one") == {(1,)}


def test_in_op(store):
    # reference: test_sql_converter.py:237
    df = store.query("select ?o { ?o Demo:shipcountry ?c FILTER(?c IN ('Brazil', 'Germany')) }")
    assert len(df.collect()) == 2


def test_aggregate_join_count(store):
    # reference: test_sql_converter.py:246 — aggregate over a ref join
    df = store.query(
        "select ?cn (COUNT(?o) AS ?n) { ?sh Demo:companyname ?cn; "
        "Demo:shippers_of_orders ?o } GROUP BY ?cn"
    )
    assert rows(df, "cn", "n") == {("Speedy Express", 2), ("United Package", 2)}


def test_aggregate_count_star(store):
    # reference: test_sql_converter.py:252
    df = store.query("select (COUNT(*) AS ?n) { ?o a Demo:Orders }")
    assert rows(df, "n") == {(4,)}


def test_regex(store):
    # reference: test_sql_converter.py:258 downgrades regex to LIKE; this
    # engine evaluates real regex via rlike (strictly more faithful)
    df = store.query("select ?o { ?o Demo:shipcity ?c FILTER(REGEX(?c, '^R')) }")
    assert len(df.collect()) == 2


def test_sql_func_escape_hatch(store):
    # reference: test_sql_converter.py:264 — sqlf: arbitrary-function escape
    df = store.query(
        "PREFIX sqlf: <http://schemas.openlinksw.com/sqlf#> "
        "select (sqlf:upper(?c) AS ?u) { ?o Demo:shipcity ?c . ?o Demo:orderid 3 }"
    )
    assert rows(df, "u") == {("RIO",)}


def test_if_case(store):
    # reference: test_sql_converter.py:382
    df = store.query(
        'select ?o (IF(?fr > 40, "big", "small") AS ?size) { ?o Demo:freight ?fr . ?o Demo:orderid 1 }'
    )
    assert rows(df, "size") == {("small",)}


def test_arithmetic(store):
    # reference: test_sql_converter.py:385-400
    df = store.query(
        "select (?fr * 2 + 1 AS ?x) { ?o Demo:orderid 1 ; Demo:freight ?fr }"
    )
    assert rows(df, "x") == {(8.0,)}


def test_optional(store):
    df = store.query(
        "select ?o ?sd { ?o a Demo:Orders OPTIONAL { ?o Demo:shippeddate ?sd } }"
    )
    got = dict(rows(df, "o", "sd"))
    assert got[f"<{BASE}orders/4>"] is None
    assert got[f"<{BASE}orders/3>"] == "1996-07-08"


def test_minus_and_not_exists(store):
    m = store.query("select ?o { ?o a Demo:Orders MINUS { ?o Demo:shippeddate ?d } }")
    ne = store.query("select ?o { ?o a Demo:Orders FILTER NOT EXISTS { ?o Demo:shippeddate ?d } }")
    assert rows(m, "o") == rows(ne, "o") == {(f"<{BASE}orders/4>",)}


def test_values(store):
    df = store.query(
        'select ?o ?c { ?o Demo:shipcountry ?c VALUES ?c { "Brazil" "Germany" } }'
    )
    assert len(df.collect()) == 2


def test_subselect(store):
    df = store.query(
        "select ?cn ?n { { select ?sh (COUNT(?o) AS ?n) { ?sh Demo:shippers_of_orders ?o } GROUP BY ?sh } "
        "?sh Demo:companyname ?cn }"
    )
    assert rows(df, "cn", "n") == {("Speedy Express", 2), ("United Package", 2)}


def test_property_path_seq(store):
    df = store.query("select ?sh ?c { ?sh Demo:shippers_of_orders/Demo:shipcountry ?c }")
    assert len(df.collect()) == 4


def test_var_predicate(store):
    df = store.query(f"select ?p ?v {{ <{BASE}shippers/1> ?p ?v }}")
    # rdf:type + shipperid + companyname + shippers_of_orders x 2 orders
    assert len(df.collect()) == 5


def test_ask(store):
    assert store.query('ASK { ?o Demo:shipcountry "Brazil" }').collect()[0]["found"] is True
    assert store.query('ASK { ?o Demo:shipcountry "Narnia" }').collect()[0]["found"] is False


def test_construct(store):
    df = store.query(
        "CONSTRUCT { ?o Demo:code ?c } WHERE { ?o Demo:shipcountry ?c }"
    )
    assert df.columns == ["subj", "pred", "obj", "obj_dt", "obj_lang", "graph"]
    assert df.count() == 4


def test_exec_typed_readback(store):
    got = list(store.exec("select ?o ?fr ?oid { ?o Demo:freight ?fr ; Demo:orderid ?oid }"))
    by_id = {r["oid"]: r for r in got}
    assert isinstance(by_id[1]["o"], URI) and by_id[1]["o"].endswith("orders/1")
    assert by_id[1]["fr"] == 3.5 and isinstance(by_id[1]["fr"], float)
    assert isinstance(by_id[1]["oid"], int)


def test_triples_pattern_scan(store):
    trips = list(store.triples((URI(BASE + "orders/1"), URI(DEMO + "freight"), None)))
    assert trips == [(URI(BASE + "orders/1"), URI(DEMO + "freight"), 3.5)]


def test_store_stats(store, spark):
    # reference: r2r_store.py:96-119 — verified against DuckDB on the dump
    import duckdb

    store.register_views()
    con = duckdb.connect()
    o = store.tables["Orders"].toPandas()
    s = store.tables["Shippers"].toPandas()
    con.register("Orders", o)
    con.register("Shippers", s)
    sql = store.get_sql()
    exp_len, exp_s, exp_p = con.execute(
        f"SELECT count(*), count(DISTINCT subj), count(DISTINCT pred) FROM ({sql})"
    ).fetchone()
    assert len(store) == exp_len
    assert store.nb_subjects() == exp_s
    assert store.nb_predicates() == exp_p


def test_get_sql_roundtrip(store, spark):
    store.register_views()
    via_sql = spark.sql(store.get_sql())
    direct = store.dump()
    assert via_sql.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_sql).count() == 0


def test_not_implemented_dispatch(store):
    # A14: explicit not-implemented dispatch (the reference raises
    # SparqlNotImplementedError for unsupported constructs,
    # conversion_utils.py:35-36)
    with pytest.raises(SparqlNotImplemented):
        store.query("SELECT ?x { ?x Demo:freight ?y } GROUP BY (STR(?x))")
    with pytest.raises(SparqlSyntaxError):
        parse_query("SELECT ?x WHERE")


def test_describe(store):
    # DESCRIBE is a reference GAP (test_sql_converter.py:642-649 xfail);
    # this engine supports constants and WHERE-bound variables
    df = store.query(f"DESCRIBE <{BASE}orders/1>")
    got = rows(df, "subj", "pred")
    assert all(s == f"<{BASE}orders/1>" for s, _ in got)
    assert len(got) == 7  # type + 6 properties
    df2 = store.query("DESCRIBE ?o WHERE { ?o Demo:freight 3.50 }")
    assert rows(df2, "subj") == {(f"<{BASE}orders/1>",)}


def test_parser_terms():
    q = parse_query(
        'PREFIX ex: <http://e/> SELECT ?x { ?x ex:p "lit"@en ; ex:q "5"^^<http://www.w3.org/2001/XMLSchema#integer> }'
    )
    (s1, p1, o1), (s2, p2, o2) = q.where.triples
    assert o1.language == "en"
    assert o2.datatype.endswith("integer")


def test_min_max_over_terms(store):
    # MIN/MAX aggregate the TERM: numeric terms order numerically, string
    # terms lexically — both through the orderable-struct encoding
    df = store.query(
        "select (MIN(?fr) AS ?lo) (MAX(?fr) AS ?hi) (MIN(?c) AS ?c0) "
        "{ ?o Demo:freight ?fr ; Demo:shipcountry ?c }"
    )
    r = df.collect()[0]
    assert r["lo"] == "3.5E0" and r["hi"] == "6.583E1" and r["c0"] == "Brazil"


def test_ttl_mapping_document_to_sparql(spark):
    """The complete reference user path: a real R2RML mapping DOCUMENT
    (Turtle text) + a SPARQL string -> results (reference: R2RStore(db,
    mapping_graph) + graph.query(...))."""
    from rdflib_r2r_spark.ttl import mapping_from_ttl

    ttl = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix ex: <http://example.com/> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

    <#OrdersMap>
        a rr:TriplesMap;
        rr:logicalTable [ rr:tableName "Orders" ];
        rr:subjectMap [ rr:template "http://example.com/orders/{OrderID}";
                        rr:class ex:Order ];
        rr:predicateObjectMap [
            rr:predicate ex:freight;
            rr:objectMap [ rr:column "Freight"; rr:datatype xsd:double ]
        ];
        rr:predicateObjectMap [
            rr:predicate ex:country;
            rr:objectMap [ rr:column "ShipCountry" ]
        ] .
    """
    orders = spark.createDataFrame(
        [(1, 3.5, "France"), (2, 11.61, "Germany"), (3, 65.83, "Brazil")],
        "OrderID int, Freight double, ShipCountry string",
    )
    tmaps = mapping_from_ttl(ttl)
    store = SparkR2RStore(spark, {"Orders": orders}, tmaps,
                          init_ns={"ex": "http://example.com/"})
    df = store.query(
        "SELECT ?o ?c { ?o a ex:Order ; ex:freight ?f ; ex:country ?c FILTER(?f > 10) }"
    )
    assert rows(df, "o", "c") == {
        ("<http://example.com/orders/2>", "Germany"),
        ("<http://example.com/orders/3>", "Brazil"),
    }


def test_init_bindings(store):
    # reference: r2r_store.py:62-75 initBindings -> VALUES injection
    df = store.query("select ?o ?c { ?o Demo:shipcountry ?c }",
                     init_bindings={"c": "France"})
    assert len(df.collect()) == 2
    df2 = store.query("select ?o { ?o Demo:orderid ?i }", init_bindings={"i": 3})
    assert rows(df2, "o") == {(f"<{BASE}orders/3>",)}


# -- SPARQL unbound-compatibility semantics (round-3 advisor fixes) ---------------


def test_values_undef_is_wildcard(store):
    # UNDEF in VALUES is an unbound binding: compatible with every solution
    # for that variable, not "match NULL" (SPARQL 10.2 / compatibility)
    df = store.query(
        """select ?o ?c { ?o Demo:shipcountry ?c .
           VALUES (?c) { ("France") (UNDEF) } }"""
    )
    # France rows match the France row; UNDEF row matches ALL 4 orders
    assert len(df.collect()) == 2 + 4


def test_adjacent_values_intersect(store):
    # two adjacent VALUES clauses join like any other patterns: the result
    # binds the intersection of the two inline tables (the reference xfails
    # this, test_sql_converter.py:642-649 — superset behavior here)
    df = store.query(
        """select ?o ?c { VALUES ?c { 'France' 'Brazil' }
           VALUES ?c { 'France' 'Germany' }
           ?o Demo:shipcountry ?c }"""
    )
    got = rows(df, "o", "c")
    assert got == {(f"<{BASE}orders/1>", "France"), (f"<{BASE}orders/4>", "France")}


def test_values_undef_two_cols(store):
    df = store.query(
        """select ?o ?c ?sci { ?o Demo:shipcountry ?c ; Demo:shipcity ?sci .
           VALUES (?c ?sci) { ("Brazil" UNDEF) (UNDEF "Reims") } }"""
    )
    got = rows(df, "c", "sci")
    assert got == {("Brazil", "Rio"), ("France", "Reims")}


def test_optional_unbound_join_is_compatible(store):
    # A solution with an OPTIONAL-unbound shared var must still join with a
    # later pattern that binds it (unbound matches anything), adopting the
    # bound value.  Order 4 has no shippeddate.
    df = store.query(
        """select ?o ?d { { ?o a Demo:Orders OPTIONAL { ?o Demo:shippeddate ?d } }
           { ?x Demo:orderdate ?d } }"""
    )
    got = rows(df, "o", "d")
    # order 4's unbound ?d joins every orderdate value (4 dates, 3 distinct)
    o4 = {t for t in got if t[0] == f"<{BASE}orders/4>"}
    assert {d for _, d in o4} == {"1996-07-04", "1996-07-05", "1996-07-08"}
    # bound rows only survive when shippeddate equals some orderdate:
    # 1996-07-08 (order 3) is both a shippeddate and an orderdate
    bound = {t for t in got if t[0] != f"<{BASE}orders/4>"}
    assert bound == {(f"<{BASE}orders/3>", "1996-07-08")}


def test_minus_with_unbound_shared_var(store):
    # MINUS removes a solution only if a compatible right solution shares at
    # least one BOUND variable; an all-unbound overlap removes nothing
    df = store.query(
        """select ?o { ?o a Demo:Orders
           MINUS { ?o Demo:shipcountry "France" } }"""
    )
    assert rows(df, "o") == {(f"<{BASE}orders/2>",), (f"<{BASE}orders/3>",)}


def test_describe_constant_only_describes_named(store):
    # DESCRIBE <iri> WHERE {...} must NOT fall back to describing every
    # WHERE-bound variable (advisor finding)
    df = store.query(
        f"DESCRIBE <{BASE}orders/1> WHERE {{ ?o Demo:shipcountry 'France' }}"
    )
    subj = {r["subj"] for r in df.collect()}
    assert subj == {f"<{BASE}orders/1>"}


def test_construct_empty_template(store):
    df = store.query("CONSTRUCT { } WHERE { ?o Demo:shipcountry ?c }")
    assert df.count() == 0
    assert "subj" in df.columns and "obj_lang" in df.columns


def test_exists_with_optional_unbound(store):
    # EXISTS over a maybe-unbound var: unbound outer solutions are compatible
    # with any inner binding, so order 4 (no shippeddate) passes too
    df = store.query(
        """select ?o { ?o a Demo:Orders OPTIONAL { ?o Demo:shippeddate ?d }
           FILTER EXISTS { ?x Demo:orderdate ?d } }"""
    )
    got = rows(df, "o")
    # orders 1/2 shippeddates (07-16, 07-10) are NOT orderdates -> fail;
    # order 3 shipped 07-08 which IS an orderdate; order 4 unbound -> passes
    assert got == {(f"<{BASE}orders/3>",), (f"<{BASE}orders/4>",)}


def test_exists_with_inner_optional_unbound(store):
    # round-3 advice: inner.maybe_null must relax the correlation too — an
    # OPTIONAL inside EXISTS can leave the shared var unbound on the INNER
    # side, and that unbound inner solution is compatible with every outer
    # binding, so EVERY order passes
    df = store.query(
        """select ?o { ?o a Demo:Orders; Demo:shippeddate ?d
           FILTER EXISTS { ?x a Demo:Orders OPTIONAL { ?x Demo:nosuchprop ?d } } }"""
    )
    assert df.count() == 3  # all orders with a shippeddate (4 has NULL)


def test_exists_oracle_is_discriminating(store):
    # round-3 verdict #6: the EXISTS witness must change the answer.  The
    # same pattern without the FILTER returns strictly more rows, so an
    # engine that ignored EXISTS entirely could not hash-match the oracle.
    with_exists = store.query(
        """select ?o { ?o Demo:shipcountry ?c
           FILTER EXISTS { ?o Demo:shippeddate ?d } }"""
    )
    without = store.query("select ?o { ?o Demo:shipcountry ?c }")
    n_with, n_without = with_exists.count(), without.count()
    assert n_with == 3 and n_without == 4  # order 4 has NULL shippeddate


# -- negated property sets (SPARQL 1.1 9.1 — beyond the reference's
# Seq/Alt/Inv coverage, sql_converter.py:208-229) ---------------------------


def test_negated_property_set(store):
    df = store.query(
        "select ?v { <%sshippers/1> !(a|Demo:shipperid|Demo:shippers_of_orders) ?v }"
        % BASE
    )
    assert rows(df, "v") == {("Speedy Express",)}


def test_negated_property_set_bare(store):
    # single-member form without parentheses
    df = store.query(f"select ?v {{ <{BASE}orders/1> !Demo:orderid ?v }}")
    # type + freight + shipcountry + shipcity + orderdate + shippeddate
    assert df.count() == 6


def test_negated_property_set_inverse(store):
    # all-inverse set == ^!(a): subjects reachable backwards from orders/1
    # via any predicate except rdf:type = the 6 object values of orders/1
    df = store.query(f"select ?s {{ ?s !(^a) <{BASE}orders/1> }}")
    assert df.count() == 6


def test_negated_property_set_mixed(store):
    # mixed = union of the forward branch (companyname + 2 ref-object
    # triples) and the inverse branch (nothing points AT shippers/1)
    df = store.query(
        f"select ?v {{ <{BASE}shippers/1> !(a|Demo:shipperid|^a) ?v }}"
    )
    assert df.count() == 3


# -- GROUP_CONCAT / SAMPLE aggregates ---------------------------------------


def test_group_concat_and_sample(store):
    df = store.query(
        "select ?sh (GROUP_CONCAT(?c; SEPARATOR=\",\") AS ?cs) "
        "(SAMPLE(?c) AS ?any) "
        "{ ?sh Demo:shippers_of_orders/Demo:shipcountry ?c } GROUP BY ?sh"
    )
    got = rows(df, "sh", "cs", "any")
    assert got == {
        (f"<{BASE}shippers/1>", "France,Germany", "France"),
        (f"<{BASE}shippers/2>", "Brazil,France", "Brazil"),
    }


def test_group_concat_distinct_global_group(store):
    df = store.query(
        "select (GROUP_CONCAT(DISTINCT ?c; SEPARATOR=\";\") AS ?cs) "
        "{ ?o Demo:shipcountry ?c }"
    )
    assert rows(df, "cs") == {("Brazil;France;Germany",)}


def test_negset_inside_sequence_resolves(store):
    # !(...) composes with / : resolve_paths passes NegSet through as an
    # atomic predicate and the evaluator's NPS pattern handles it — the
    # fused form must equal the explicit two-triple formulation
    fused = store.query(
        f"select ?o {{ <{BASE}shippers/1> Demo:shippers_of_orders/!(a|Demo:orderid) ?o }}"
    )
    split = store.query(
        f"select ?o {{ <{BASE}shippers/1> Demo:shippers_of_orders ?m . "
        "?m !(a|Demo:orderid) ?o }"
    )
    got_f = sorted(r["o"] for r in fused.collect())
    got_s = sorted(r["o"] for r in split.collect())
    assert got_f == got_s and len(got_f) > 0


def test_construct_where_shorthand(store):
    # SPARQL 1.1 10.2.2: CONSTRUCT WHERE { triples } == CONSTRUCT with the
    # same triples as both template and pattern
    short = store.query(
        "construct where { ?s Demo:shipcountry ?c }"
    )
    full = store.query(
        "construct { ?s Demo:shipcountry ?c } where { ?s Demo:shipcountry ?c }"
    )
    got_s = {tuple(r) for r in short.collect()}
    got_f = {tuple(r) for r in full.collect()}
    assert got_s == got_f and len(got_s) == 4


def test_construct_where_rejects_path_template():
    # SPARQL 1.1 10.2.2: the shorthand template is a TriplesTemplate —
    # property paths are not allowed as predicates (they would fail
    # obscurely at eval time otherwise)
    from rdflib_r2r_spark.sparql.parser import SparqlSyntaxError, parse_query as _pq

    for q in [
        "PREFIX ex: <http://e/> CONSTRUCT WHERE { ?s ex:a/ex:b ?o }",
        "PREFIX ex: <http://e/> CONSTRUCT WHERE { ?s ex:a|ex:b ?o }",
        "PREFIX ex: <http://e/> CONSTRUCT WHERE { ?s ^ex:a ?o }",
    ]:
        with pytest.raises(SparqlSyntaxError):
            _pq(q)
    # plain IRI and variable predicates stay legal
    _pq("PREFIX ex: <http://e/> CONSTRUCT WHERE { ?s ex:a ?o }")
    _pq("CONSTRUCT WHERE { ?s ?p ?o }")


def test_construct_full_form_dataset_position():
    # grammar: CONSTRUCT ConstructTemplate DatasetClause* WHERE ... — a
    # dataset clause BEFORE the template is a syntax error; after, legal
    from rdflib_r2r_spark.sparql.ast_nodes import ConstructQuery
    from rdflib_r2r_spark.sparql.parser import SparqlSyntaxError, parse_query as _pq

    q = _pq(
        "PREFIX ex: <http://e/> CONSTRUCT { ?s ex:a ?o } FROM ex:g "
        "WHERE { ?s ex:a ?o }"
    )
    assert isinstance(q, ConstructQuery) and q.dataset is not None
    with pytest.raises(SparqlSyntaxError):
        _pq(
            "PREFIX ex: <http://e/> CONSTRUCT FROM ex:g { ?s ex:a ?o } "
            "WHERE { ?s ex:a ?o }"
        )


# -- FROM / FROM NAMED dataset clauses (SPARQL 1.1 13.2) --------------------


@pytest.fixture(scope="module")
def quads_store(spark):
    import __spark_entry__ as E

    return SparkR2RStore(
        spark,
        {"nation": spark.read.parquet("/root/testdata/sf0.001/nation.parquet")},
        E._quads_tmaps(),
        init_ns={"ex": "http://ex.org/"},
    )


def test_from_moves_named_graph_into_default(quads_store):
    # without FROM the default graph has no triples (every arm is
    # graph-mapped); FROM <g/names> makes that graph the default
    assert quads_store.query(
        "select ?s ?n { ?s ex:name ?n }").count() == 0
    assert quads_store.query(
        "select ?s ?n from <http://ex.org/g/names> { ?s ex:name ?n }"
    ).count() == 25


def test_from_merges_graphs_dump_path(quads_store):
    # variable predicate -> dump-scan path; two FROM clauses merge both
    # named graphs into the default graph
    df = quads_store.query(
        "select ?s ?p ?o from <http://ex.org/g/names> "
        "from <http://ex.org/g/keys> { ?s ?p ?o }"
    )
    assert df.count() == 50


def test_from_named_restricts_graph_var(quads_store):
    # GRAPH ?g ranges over the FROM NAMED list only
    both = quads_store.query(
        "select ?g ?s { graph ?g { ?s ?p ?o } }")
    assert both.count() == 50
    only = quads_store.query(
        "select ?g ?s from named <http://ex.org/g/keys> "
        "{ graph ?g { ?s ?p ?o } }")
    rows = only.collect()
    assert len(rows) == 25
    assert {r["g"] for r in rows} == {"<http://ex.org/g/keys>"}


def test_from_named_excludes_unlisted_graph_iri(quads_store):
    # a GRAPH <iri> outside the FROM NAMED list matches nothing; and under
    # any dataset clause the store-default graph is replaced (FROM absent
    # -> empty default graph)
    assert quads_store.query(
        "select ?s from named <http://ex.org/g/keys> "
        "{ graph <http://ex.org/g/names> { ?s ?p ?o } }"
    ).count() == 0
    assert quads_store.query(
        "select ?s from named <http://ex.org/g/keys> { ?s ex:name ?o }"
    ).count() == 0


# -- parser robustness (hypothesis) -----------------------------------------


def test_parser_fuzz_structured():
    """Property: over a generated family of structurally-valid queries the
    parser always returns an AST; over mutated (truncated/garbled) inputs
    it raises ONLY SparqlSyntaxError / SparqlNotImplemented — never an
    unrelated exception type (IndexError, KeyError, ...)."""
    from hypothesis import given, settings, strategies as st

    from rdflib_r2r_spark.sparql.parser import (
        SparqlNotImplemented, SparqlSyntaxError, parse_query,
    )

    ns = {"ex": "http://ex.org/"}
    vars_ = st.sampled_from(["?s", "?p", "?o", "?x"])
    preds = st.sampled_from(["ex:name", "a", "?p", "ex:a/ex:b", "!(ex:a)",
                             "ex:a+", "^ex:b"])
    objs = st.sampled_from(["?o", '"lit"', "42", "ex:thing", '"x"@en'])

    @st.composite
    def query(draw):
        s, p, o = draw(vars_), draw(preds), draw(objs)
        parts = [f"{s} {p} {o}"]
        if draw(st.booleans()):
            parts.append(f"OPTIONAL {{ {s} ex:opt ?y }}")
        if draw(st.booleans()):
            parts.append(f"FILTER({draw(vars_)} != 3)")
        if draw(st.booleans()):
            parts.append('VALUES ?v { "a" "b" }')
        body = " . ".join(parts)
        head = draw(st.sampled_from(
            ["SELECT *", "SELECT ?s", "ASK", "CONSTRUCT WHERE",
             f"SELECT ?s FROM <{ns['ex']}g>"]))
        if head == "CONSTRUCT WHERE":
            return f"CONSTRUCT WHERE {{ {s} ex:name {draw(objs)} }}"
        return f"{head} {{ {body} }}"

    @given(query(), st.integers(min_value=0, max_value=120))
    @settings(max_examples=300, deadline=None)
    def check(q, cut):
        try:
            parse_query(q, init_ns=ns)
        except (SparqlSyntaxError, SparqlNotImplemented):
            pass
        # truncation must also fail cleanly (or parse, for lucky cuts)
        try:
            parse_query(q[:cut], init_ns=ns)
        except (SparqlSyntaxError, SparqlNotImplemented):
            pass

    check()


def test_describe_honors_from_clause(quads_store):
    # DESCRIBE pulls description triples from the query's default graph
    # (13.2): FROM <g/names> restricts to the name triple only
    all_triples = quads_store.query("describe <http://ex.org/nation/1>")
    assert all_triples.count() == 2  # name + nationkey (no dataset clause)
    only_names = quads_store.query(
        "describe <http://ex.org/nation/1> from <http://ex.org/g/names>"
    )
    rows = only_names.collect()
    assert len(rows) == 1
    assert rows[0]["pred"] == "<http://ex.org/name>"
