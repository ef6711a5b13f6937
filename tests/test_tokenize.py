"""Subword tokenizer: greedy longest-match over the committed vocab —
known merge cases, Spark/DuckDB/pure-Python three-way parity, plan shape."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from rdflib_r2r_spark.operators import tokenize as T

CASES = [
    (1, "the fast customer data batch join"),
    (2, "spark group-by query; row 42 (slow)"),
    (3, ""),
    (4, "UnKnOwN Wörds héllo 123abc"),   # unknown chars -> <unk> (id 0)
    (5, "a"),
    (6, "customerdata bigdata datadata"),  # merges inside one word
    (7, "   \t\n  "),                      # whitespace-only
]


def _py_tokenize(text: str) -> list[int]:
    vocab = T.load_vocab()
    pat = re.compile(T.PRETOKEN_RE)
    return [tid for w in pat.findall(text or "")
            for tid in T.encode_word(w, vocab)]


def _vocab_id(piece: str, cont: bool = False) -> int:
    v = T.load_vocab()
    return (v.cont if cont else v.init)[piece]


def test_encode_word_known_merge_cases():
    v = T.load_vocab()
    # a trained whole-word merge tokenizes to ONE id
    assert T.encode_word("customer", v) == [_vocab_id("customer")]
    # greedy longest-match: "customerdata" starts with the longest initial
    # piece ("customer"), never the shorter "c"/"cu" prefixes
    ids = T.encode_word("customerdata", v)
    assert ids[0] == _vocab_id("customer") and len(ids) > 1
    # continuation pieces differ from initial ones: "data" initial vs the
    # "##ata" continuation inside "bigdata"
    bd = T.encode_word("bigdata", v)
    assert bd[0] == _vocab_id("big")
    assert _vocab_id("data") not in bd[1:]
    # unknown character -> UNK, single-step advance
    assert T.encode_word("ö", v) == [T.UNK_ID]
    assert T.encode_word("aöb", v)[1] == T.UNK_ID
    # every printable ASCII char is in the base alphabet: no UNK
    assert T.UNK_ID not in T.encode_word("zq9!~", v)


def test_pretokenizer_shape():
    pat = re.compile(T.PRETOKEN_RE)
    assert pat.findall("ab1 cd-ef") == ["ab", "1", "cd", "-", "ef"]
    assert pat.findall("x,y;;z") == ["x", ",", "y", ";", ";", "z"]
    assert pat.findall("  ") == []


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CASES, "doc_id long, text string")


def test_tokenize_docs_matches_python_reference(docs):
    got = {r["doc_id"]: list(r["token_ids"])
           for r in T.tokenize_docs(docs).collect()}
    for i, text in CASES:
        assert got[i] == _py_tokenize(text), (i, text)


def _duck_with_cases():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {T._sql_quote(t)})" for i, t in CASES)
        + ") t(doc_id, text)"
    )
    return con


def test_token_stats_duckdb_parity(docs):
    spark_rows = {
        r["doc_id"]: (r["n_subword_tokens"], r["first_token_id"],
                      r["last_token_id"])
        for r in T.token_stats(docs).collect()
    }
    con = _duck_with_cases()
    duck_rows = {r[0]: (r[1], r[2], r[3])
                 for r in con.sql(T.token_stats_sql("documents")).fetchall()}
    assert spark_rows == duck_rows
    assert spark_rows[3] == (0, None, None)  # empty doc survives with 0


def test_chunk_tokens_duckdb_parity(docs):
    kw = dict(seq_len=5, stride=3)
    spark_rows = {
        (r["doc_id"], r["chunk_idx"]):
            (r["start_tok"], r["n_tokens"], r["first_token_id"],
             r["last_token_id"])
        for r in T.chunk_documents_tokens(docs, **kw).collect()
    }
    con = _duck_with_cases()
    duck_rows = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.sql(
            T.chunk_documents_tokens_sql("documents", **kw)
        ).fetchall()
    }
    assert spark_rows == duck_rows and len(spark_rows) > 3
    # overlap property: consecutive chunks overlap by seq_len - stride
    toks = _py_tokenize(CASES[1][1])
    n = len(toks)
    want_chunks = 1 if n <= 5 else -(-(n - 5) // 3) + 1
    assert sum(1 for (d, _) in spark_rows if d == 2) == want_chunks


def test_tokenize_plan_distinct_word_kernel(docs):
    # the Python kernel must sit above a DISTINCT on words (Zipf reduction:
    # encode once per distinct word, not per occurrence) and there must be
    # exactly one Arrow kernel in the plan
    qe = T.tokenize_docs(docs)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert plan.count("MapInArrow") == 1
    above, kernel, below = plan.partition("MapInArrow")
    assert "HashAggregate" in below or "Exchange" in below  # distinct below it
    # the order-preserving reassembly (sort + flatten) survives
    # optimization — physical-plan strings truncate expressions, so check
    # the optimized logical plan
    logical = qe.optimizedPlan().toString()
    assert "flatten(" in logical and "array_sort(" in logical
