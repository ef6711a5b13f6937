"""Property paths (B6), transitive closure, chain-map rewrite (B7) and
subordination detection (B8), mirroring the reference's tests
(tests/test_resolve_path_in_triples.py, test_sql_converter.py:228-232,
482-484, 686-700)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rdflib_r2r_spark import terms
from rdflib_r2r_spark.compiler import SparkMappingCompiler
from rdflib_r2r_spark.mapping import (
    LogicalSource, PredicateObjectMap, SubjectMap, TermMap, TriplesMap, const_iri,
)
from rdflib_r2r_spark.oracle import mapping_to_duckdb_sql
from rdflib_r2r_spark.paths import (
    Pred, alt, eval_path, inv, resolve_paths, seq, transitive_closure,
)
from rdflib_r2r_spark.rewrites import add_chain_maps, chain_pred, subordination_links

EX = "http://ex.org/"


# -- resolve_paths: compile-time rewriting (reference semantics) --------------

def test_resolve_sequence_path():
    bgps = list(resolve_paths([("?s", seq(EX + "p1", EX + "p2"), "?o")]))
    assert len(bgps) == 1
    (t1, t2) = bgps[0]
    assert t1[0] == "?s" and t1[1] == EX + "p1"
    assert t1[2] == t2[0]  # fresh chaining var
    assert t2[1] == EX + "p2" and t2[2] == "?o"


def test_resolve_alternative_path():
    bgps = list(resolve_paths([("?s", alt(EX + "a", EX + "b"), "?o")]))
    assert len(bgps) == 2
    assert {b[0][1] for b in bgps} == {EX + "a", EX + "b"}


def test_resolve_inverse_and_combination():
    bgps = list(resolve_paths([("?s", seq(inv(EX + "a"), alt(EX + "b", EX + "c")), "?o")]))
    assert len(bgps) == 2
    for b in bgps:
        assert b[0][1] == EX + "a" and b[0][2] == "?s"  # inverted first hop


# -- runtime path evaluation over triples -------------------------------------

@pytest.fixture(scope="module")
def geo_triples(spark):
    import __spark_entry__ as E

    comp = SparkMappingCompiler(
        spark,
        {n: spark.read.parquet(f"/root/testdata/sf0.001/{n}.parquet") for n in ("nation", "region")},
    )
    return comp.compile(E.geo_tmaps()).cache()


def test_eval_seq_path(spark, geo_triples):
    out = eval_path(geo_triples, seq(EX + "inRegion", EX + "name")).collect()
    assert len(out) == 25  # every nation reaches its region's name
    assert all(r["s"].startswith("<http://ex.org/nation/") for r in out)
    names = {r["o"] for r in out}
    assert "ASIA" in names and len(names) == 5


def test_eval_alt_inv_path(spark, geo_triples):
    out = eval_path(geo_triples, alt(Pred(EX + "name"), inv(EX + "inRegion")))
    rows = out.collect()
    # region->nation inverted edges present
    assert any(r["s"].startswith("<http://ex.org/region/") and r["o"].startswith("<http://ex.org/nation/") for r in rows)
    # plus the name edges
    assert any(r["o"] == "ASIA" for r in rows)


def test_transitive_closure_chain(spark):
    edges = spark.createDataFrame(
        [(i, i // 2) for i in range(1, 16)], "src long, dst long"
    )
    tc = {(r["src"], r["dst"]) for r in transitive_closure(edges).collect()}
    assert (15, 0) in tc and (15, 7) in tc and (15, 3) in tc and (15, 1) in tc
    assert (1, 0) in tc and (2, 15) not in tc
    # node 15: ancestors 7,3,1,0 -> 4 pairs
    assert len({d for s, d in tc if s == 15}) == 4


# -- chain maps (B7) -----------------------------------------------------------

def _geo_like_tmaps():
    parent = TriplesMap(
        name="region",
        source=LogicalSource(table="region"),
        subject_map=SubjectMap(template=EX + "region/{r_regionkey}"),
        pomaps=(
            PredicateObjectMap(
                predicates=(const_iri(EX + "regionkey"),),
                objects=(TermMap(column="r_regionkey", datatype=terms.XSD_INTEGER),),
            ),
        ),
    )
    child = TriplesMap(
        name="nation",
        source=LogicalSource(table="nation"),
        subject_map=SubjectMap(template=EX + "nation/{n_nationkey}"),
        pomaps=(
            PredicateObjectMap(
                predicates=(const_iri(EX + "regionref"),),
                objects=(
                    TermMap(
                        parent_triples_map="region",
                        join_conditions=(
                            __import__("rdflib_r2r_spark.mapping", fromlist=["JoinCondition"]).JoinCondition(
                                child="n_regionkey", parent="r_regionkey"
                            ),
                        ),
                    ),
                ),
            ),
            PredicateObjectMap(
                predicates=(const_iri(EX + "nregion"),),
                objects=(TermMap(column="n_regionkey", datatype=terms.XSD_INTEGER),),
            ),
        ),
    )
    return [child, parent]


def test_chain_maps_rewrite_and_compile(spark):
    tmaps = add_chain_maps(_geo_like_tmaps())
    child = next(t for t in tmaps if t.name == "nation")
    chain_preds = [
        p.constant for pom in child.pomaps for p in pom.predicates
        if p.term_type == "RawIRI"
    ]
    # forward chain: regionref/regionkey reads n_regionkey without a join
    assert chain_pred(EX + "regionref", EX + "regionkey") in chain_preds
    parent = next(t for t in tmaps if t.name == "region")
    inv_preds = [
        p.constant for pom in parent.pomaps for p in pom.predicates
        if p.term_type == "RawIRI"
    ]
    assert chain_pred(EX + "regionref", EX + "nregion", inverse_first=True) in inv_preds

    # compiled output matches oracle, and chain values equal the 2-hop join
    comp = SparkMappingCompiler(
        spark,
        {n: spark.read.parquet(f"/root/testdata/sf0.001/{n}.parquet") for n in ("nation", "region")},
    )
    dump = comp.compile(tmaps)
    import duckdb

    con = duckdb.connect()
    for n in ("nation", "region"):
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM '/root/testdata/sf0.001/{n}.parquet'")
    want = con.execute(mapping_to_duckdb_sql(tmaps)).fetchdf()
    got = dump.toPandas()
    key = lambda df: sorted(  # noqa: E731
        tuple(None if pd.isna(v) else v for v in r)
        for r in df[["subj", "pred", "obj"]].itertuples(index=False)
    )
    assert key(got) == key(want)

    cp = chain_pred(EX + "regionref", EX + "regionkey")
    chain_rows = dump.filter(F.col("pred") == cp)
    # no join in the chain arm: values match the explicit 2-hop evaluation
    from rdflib_r2r_spark.paths import eval_path, seq as pseq

    two_hop = eval_path(dump, pseq(EX + "regionref", EX + "regionkey"))
    a = {(r["subj"], r["obj"]) for r in chain_rows.select("subj", "obj").collect()}
    b = {(r["s"], r["o"]) for r in two_hop.collect()}
    assert a == b and len(a) == 25


# -- subordination links (B8) ---------------------------------------------------

def test_subordination_links_detected():
    main = TriplesMap(
        name="main",
        source=LogicalSource(table="T"),
        subject_map=SubjectMap(template=EX + "main/{id}"),
        pomaps=(
            PredicateObjectMap(
                predicates=(const_iri(EX + "aux"),),
                objects=(TermMap(template=EX + "aux/{id}", term_type="IRI"),),
            ),
        ),
    )
    aux = TriplesMap(
        name="auxmap",
        source=LogicalSource(table="T"),
        subject_map=SubjectMap(template=EX + "aux/{id}"),
        pomaps=(
            PredicateObjectMap(
                predicates=(const_iri(EX + "v"),),
                objects=(TermMap(column="v"),),
            ),
        ),
    )
    links = subordination_links([main, aux])
    assert links == {EX + "aux": "auxmap"}


def test_same_table_tmaps_share_one_scan(spark):
    """B8's goal (shared scan) is structural in this compiler: all join-free
    arms over one logical table compile into a single parquet scan."""
    t = spark.createDataFrame(pd.DataFrame({"id": [1, 2], "v": ["a", "b"]}))
    main = TriplesMap(
        name="main", source=LogicalSource(table="T"),
        subject_map=SubjectMap(template=EX + "main/{id}"),
        pomaps=(PredicateObjectMap(predicates=(const_iri(EX + "aux"),),
                                   objects=(TermMap(template=EX + "aux/{id}", term_type="IRI"),)),),
    )
    aux = TriplesMap(
        name="auxmap", source=LogicalSource(table="T"),
        subject_map=SubjectMap(template=EX + "aux/{id}"),
        pomaps=(PredicateObjectMap(predicates=(const_iri(EX + "v"),),
                                   objects=(TermMap(column="v"),)),),
    )
    df = SparkMappingCompiler(spark, {"T": t}).compile([main, aux])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") == 1, plan
    assert df.count() == 4


def test_transitive_closure_nonconvergence_raises(spark):
    # advisor round-3: silent truncation at max_iter = silently wrong results.
    # A 6-deep chain cannot converge in 2 rounds -> must raise, not truncate.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src int, dst int"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        transitive_closure(edges, max_iter=2)
    # and with enough rounds the same graph converges fine
    tc = {(r["src"], r["dst"]) for r in transitive_closure(edges, max_iter=10).collect()}
    assert (0, 6) in tc and len(tc) == 21


def test_transitive_closure_doubling_nonconvergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src int, dst int"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        transitive_closure(edges, max_iter=2, strategy="doubling")
    tc = {(r["src"], r["dst"]) for r in
          transitive_closure(edges, max_iter=6, strategy="doubling").collect()}
    assert (0, 9) in tc and len(tc) == 45


def test_eval_negset_path(spark, geo_triples):
    from rdflib_r2r_spark.paths import NegSet

    all_rows = geo_triples.count()
    # forward NPS: everything except inRegion edges
    out = eval_path(geo_triples, NegSet(forward=(EX + "inRegion",)))
    n_inregion = geo_triples.filter(
        F.col("pred") == f"<{EX}inRegion>"
    ).count()
    assert out.count() == all_rows - n_inregion
    # all-inverse NPS: !(^p) flips every non-p edge
    inv_out = eval_path(geo_triples, NegSet(inverse=(EX + "inRegion",)))
    assert inv_out.count() == all_rows - n_inregion
    flipped = {(r["s"], r["o"]) for r in inv_out.collect()}
    straight = {(r["o"], r["s"]) for r in out.collect()}
    assert flipped == straight
    # mixed = union of both branches (multiset)
    both = eval_path(
        geo_triples, NegSet(forward=(EX + "inRegion",), inverse=(EX + "inRegion",))
    )
    assert both.count() == 2 * (all_rows - n_inregion)
