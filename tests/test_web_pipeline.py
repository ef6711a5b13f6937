"""Web-stage correctness: byte-identical extraction, mention detection,
MinHash-LSH edges, connected components, end-to-end pipeline P/R vs the
pure-Python reference emission, and checkpoint-resume semantics.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rdflib_r2r_spark import reference_impl as ref
from rdflib_r2r_spark.pipeline import KGPipeline
from rdflib_r2r_spark.web import components, linking, mentions as men, pages as pg
from rdflib_r2r_spark.web.extract import extract_text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pd():
    import duckdb

    return duckdb.sql(f"SELECT * FROM '{SF_DIR}/documents.parquet'").fetchdf()


def test_extraction_byte_identical(spark, docs):
    """north_star per-row invariant: extracted text byte-identical per url."""
    pages = pg.pages_from_documents(docs)
    out = pages.select("url", "text", extract_text(F.col("html")).alias("extracted"))
    bad = out.filter(F.col("text") != F.col("extracted")).count()
    assert bad == 0
    assert out.count() == docs.count()


def test_extraction_handles_messy_html(spark):
    """Extractor is a real HTML extractor, not only our wrapper's inverse."""
    rows = [
        ("<html><body><p>Hello <b>world</b></p><script>evil()</script></body></html>", "Hello world"),
        ('<html><body><article class="x">A &amp; B &lt;ok&gt;</article><footer>no</footer></body></html>', "A & B <ok>"),
        ("<body>plain</body>", "plain"),
    ]
    df = spark.createDataFrame(
        [(r[0].encode("utf-8"), r[1]) for r in rows], "html binary, want string"
    )
    got = df.select(extract_text(F.col("html")).alias("got"), "want").collect()
    for r in got:
        assert r["got"] == r["want"]
    # python mirror agrees
    for html, want in rows:
        assert ref.extract_text_py(html) == want


def test_alias_dict_and_mentions_match_reference(spark, docs, docs_pd):
    pages = pg.pages_from_documents(docs)
    adict = men.build_alias_dict(pages)
    got = {(r["alias"], r["entity_id"]) for r in adict.collect()}
    texts = {
        ref.BASE_URL + str(r.doc_id): r.text for r in docs_pd.itertuples()
    }
    want = {(a, i) for a, i in ref.alias_dict_py(texts).items()}
    assert got == want

    mentions = men.detect_mentions(pages, adict)
    got_m = {(r["url"], r["entity_id"]) for r in mentions.select("url", "entity_id").distinct().collect()}
    aliases = ref.alias_dict_py(texts)
    want_m = {
        (url, aliases[t])
        for url, text in texts.items()
        for t in set(ref.tokens_py(text))
        if t in aliases
    }
    assert got_m == want_m


def test_mention_entities_non_injective_alias_dict(spark):
    """ADVICE r4 (medium): with several aliases mapping to ONE entity — the
    normal shape of a real alias dictionary — the inline fast path must
    still emit globally distinct (url, entity_id) pairs.  Also pins the
    fast path == join path equivalence off the happy path."""
    pages = spark.createDataFrame(
        [("u1", "acme corp and acme-inc together"), ("u2", "only acme here")],
        "url string, text string",
    )
    adict = spark.createDataFrame(
        # three aliases, two entities: acme-corp-inc all -> 7
        [("acme", 7, 0.5), ("corp", 7, 0.3), ("only", 3, 0.2)],
        "alias string, entity_id long, prior double",
    )
    fast = {(r["url"], r["entity_id"])
            for r in men.mention_entities(pages, adict, text_col="text").collect()}
    assert fast == {("u1", 7), ("u2", 7), ("u2", 3)}
    # and no duplicate rows at all (the set comparison would hide them)
    assert men.mention_entities(pages, adict).count() == 3
    slow = {(r["url"], r["entity_id"])
            for r in men.mention_entities(pages, adict, max_inline=0).collect()}
    assert slow == fast


def test_mention_entities_empty_alias_dict(spark):
    """ADVICE r4: zero-element array/map literals are void-typed and fail
    analysis inside array_intersect — an empty dict must short-circuit to
    an empty pair frame with the right schema."""
    pages = spark.createDataFrame([("u1", "some text")], "url string, text string")
    empty = spark.createDataFrame([], "alias string, entity_id long, prior double")
    out = men.mention_entities(pages, empty)
    assert out.count() == 0
    assert dict(out.dtypes) == {"url": "string", "entity_id": "bigint"}


def test_minhash_signatures_match_python(spark, docs, docs_pd):
    sigs = linking.signatures(pg.pages_from_documents(docs)).collect()
    got = {r["key"]: [r[f"mh{j}"] for j in range(linking.DEFAULT_NUM_HASHES)] for r in sigs}
    for r in docs_pd.head(50).itertuples():
        url = ref.BASE_URL + str(r.doc_id)
        assert got[url] == ref.minhash_sig_py(r.text)


def test_connected_components_golden(spark):
    # FIXTURES.md F5: 10-node edge list, 2 components + 1 hub
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (5, 6), (6, 7), (10, 1), (10, 4), (10, 8)],
        "a long, b long",
    )
    cc = {r["node"]: r["component"] for r in components.connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 8: 1, 10: 1, 5: 5, 6: 5, 7: 5}
    # salted variant is exact
    cc2 = {
        r["node"]: r["component"]
        for r in components.connected_components(edges, salt_buckets=4).collect()
    }
    assert cc2 == cc


def test_pipeline_pr_vs_reference(spark, docs_pd, tmp_path):
    pipe = KGPipeline(spark, SF_DIR, str(tmp_path / "kg"))
    triples = pipe.run()
    got = {(r["subj"], r["pred"], r["obj"]) for r in triples.select("subj", "pred", "obj").collect()}
    want = ref.reference_triples(docs_pd.to_dict("records"))
    p, r = ref.precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r, len(got), len(want))
    # we actually expect exact agreement
    assert p == 1.0 and r == 1.0

    # bucketed layout present
    assert "subj_bucket" in triples.columns

    # lineage rows exist for every stage
    lineage = pipe.lineage()
    stages = {r["stage"] for r in lineage.select("stage").distinct().collect()}
    assert {"pages", "extracted", "base_triples", "alias_dict", "mentions",
            "edges", "canon", "triples"} <= stages

    # checkpoint-resume: second run recomputes nothing
    pipe2 = KGPipeline(spark, SF_DIR, str(tmp_path / "kg"))
    t2 = pipe2.run()
    assert all(res.resumed for res in pipe2.results.values()), {
        k: v.resumed for k, v in pipe2.results.items()
    }
    assert t2.count() == len(got | set())  # same triple count

    # parameter change invalidates downstream
    pipe3 = KGPipeline(spark, SF_DIR, str(tmp_path / "kg"), dict_size=10)
    pipe3.run()
    assert not pipe3.results["alias_dict"].resumed


def test_numeric_band_values_give_same_candidates(spark, docs):
    """The bigint band encoding (band_rows<=2) must bucket identically to
    the string concat it replaced: same candidate pair set."""
    pages = pg.pages_from_documents(docs)
    sigs = linking.signatures(pages).cache()
    numeric = linking.band_df(sigs)  # default band_rows=2 -> bigint path
    assert dict(numeric.dtypes)["band_val"] == "bigint"
    wide = linking.band_df(sigs, num_hashes=8, band_rows=4)  # string path
    assert dict(wide.dtypes)["band_val"] == "string"
    got = {(r["a"], r["b"]) for r in linking.candidate_pairs(numeric).collect()}
    # reconstruct the pairs the string encoding would produce at band_rows=2
    arms = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws("|", F.col(f"mh{2*b}").cast("string"),
                        F.col(f"mh{2*b+1}").cast("string")).alias("band_val"),
        )
        for b in range(4)
    ]
    legacy = (
        sigs.select("key", F.explode(F.array(*arms)).alias("b"))
        .select("key", "b.band_id", "b.band_val")
        .filter(F.col("band_val").isNotNull() & (F.col("band_val") != ""))
    )
    want = {(r["a"], r["b"]) for r in linking.candidate_pairs(legacy).collect()}
    assert got == want and len(got) > 0
    sigs.unpersist()


def test_fused_edges_match_staged(spark, docs):
    """The single-exchange sig-carrying band join must produce the exact
    edge set of the staged candidate_pairs + verified_edges flow."""
    pages = pg.pages_from_documents(docs)
    fused = {(r["a"], r["b"], round(r["sim_est"], 6))
             for r in linking.near_dup_edges(pages, fused=True).collect()}
    staged = {(r["a"], r["b"], round(r["sim_est"], 6))
              for r in linking.near_dup_edges(pages, fused=False).collect()}
    assert fused == staged and len(fused) > 0


def test_native_extractor_matches_pandas(spark, docs):
    """The JVM-native extractor is BYTE-IDENTICAL to the Arrow-UDF path on
    the full corpus plus adversarial HTML — this equality is what lets the
    pipeline run extraction with zero Python workers."""
    from rdflib_r2r_spark.web.extract import extract_text_native, extract_text_pandas

    pages = pg.pages_from_documents(docs)
    messy = spark.createDataFrame(
        [
            (b"<html><head><style>a{}</style></head><body>x <i>y</i> &amp;&lt;</body></html>",),
            (b"<body><article>first</article><article>second</article></body>",),
            (b"no tags at all",),
            (b"<script>only script</script>",),
            (b"<body><SCRIPT a=b>nested <b>tag</b></SCRIPT>kept</body>",),
            ("<body>unicode é中文</body>".encode("utf-8"),),
            # invalid UTF-8: 0xFF can begin no sequence, 0xC3 is truncated.
            # JVM cast and pd decode(errors="replace") must both map each
            # to U+FFFD, not crash the Python path.
            (b"<body>bad \xff byte and truncated \xc3</body>",),
        ],
        "html binary",
    ).select(F.col("html"))
    for frame in (pages.select("html"), messy):
        both = frame.select(
            extract_text_native(F.col("html")).alias("nat"),
            extract_text_pandas(F.col("html")).alias("pd"),
        )
        diff = both.filter(
            ~F.col("nat").eqNullSafe(F.col("pd"))
        ).count()
        assert diff == 0
