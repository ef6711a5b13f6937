"""Round-7 optimization pins: value parity of the gated IRI encoder, the
LM kernel pair, and the plan-level guarantees the rewrites rely on."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

TRICKY = [
    "abc", "123", "", "a b", "%", "a%2Fb", 'x"y', "back\\slash",
    "br[ack]ets", "^caret", "amp&ers", "cur{ly}", "tail`", "pipe|brace}",
    "all% !\"#$&'()*+,/:;<=>?@[\\]^`{|}end", "ünïcode", "mixed 1-2/3",
]


def test_iri_safe_col_gated_matches_python(spark):
    from rdflib_r2r_spark import terms

    df = spark.createDataFrame([(v,) for v in TRICKY] + [(None,)], "v string")
    got = {r["v"]: r["enc"] for r in df.select(
        "v", terms.iri_safe_col(F.col("v")).alias("enc")).collect()}
    for v in TRICKY:
        assert got[v] == terms.iri_safe_py(v), v
    assert got[None] is None


def test_iri_safe_sql_spark_matches_frozen_dialect(spark):
    from rdflib_r2r_spark import terms

    df = spark.createDataFrame([(v,) for v in TRICKY] + [(None,)], "v string")
    df.createOrReplaceTempView("t_iri")
    gated = spark.sql(
        f"SELECT v, {terms.iri_safe_sql_spark('v')} AS enc FROM t_iri"
    ).collect()
    frozen = spark.sql(
        f"SELECT v, {terms.iri_safe_sql('`v`')} AS enc FROM t_iri"
    ).collect()
    assert sorted((r['v'] or '', r['enc'] or '') for r in gated) == \
        sorted((r['v'] or '', r['enc'] or '') for r in frozen)


def test_lm_kernels_agree(spark, monkeypatch):
    """arrow (numpy span kernel) and jvm (in-array aggregate) scoring must
    be row-identical, including NULL/empty/1-char/odd-whitespace docs."""
    import os

    from rdflib_r2r_spark.operators import lm

    rows = [
        (0, "the quick brown fox"),
        (1, None),
        (2, ""),
        (3, "a"),
        (4, "ab"),
        (5, "Tabs\tand\x0bvertical"),
        (10, "numbers 123 456 mixed"),
        (15, "REPEAT " * 40),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    outs = {}
    for kernel in ("arrow", "jvm"):
        monkeypatch.setenv("SPARK_GRAFT_LM_KERNEL", kernel)
        outs[kernel] = sorted(
            tuple(r) for r in lm.lm_score(docs).collect()
        )
    assert outs["arrow"] == outs["jvm"]


def test_cmp_against_nonnumeric_literal_has_no_trycast(spark):
    """The dead numeric arm of a comparison against a never-numeric string
    literal must be pruned at compile time (Catalyst does not fold it)."""
    import __spark_entry__ as entry
    from rdflib_r2r_spark import bsbm as bsbm_mod

    store = bsbm_mod.bsbm_store(
        spark,
        {t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")
         for t in bsbm_mod.BSBM_TABLES},
    )
    df = store.query(bsbm_mod.QUERIES["bsbm_bi3"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    opt = buf.getvalue().split("== Optimized Logical Plan ==")[1]
    opt = opt.split("== Physical Plan ==")[0]
    # the xsd:float(...) ratio on the grouped (tiny) rows legitimately
    # casts; the per-source-row date FILTERS must not
    for line in opt.splitlines():
        if "Filter" in line:
            assert "try_cast" not in line, (
                "date filter re-grew the numeric branch:\n" + line[:300]
            )


def test_never_numeric_regex_is_conservative():
    from rdflib_r2r_spark.sparql.evaluator import _never_numeric_value

    # values Spark's string->double cast CAN parse must stay "maybe"
    for v in ["1", "1.5", "-2e3", " 42 ", "Infinity", "-inf", "NaN",
              "1.0d", "0x1.8p1", ".5", "3."]:
        assert not _never_numeric_value(v), v
    # and clearly-non-numeric lexicals are pruned
    for v in ["1997-05-01", "ASIA", "", "<http://x>", "12:30", "a1"]:
        assert _never_numeric_value(v), v
