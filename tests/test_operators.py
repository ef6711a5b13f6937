"""Training-data operator tests: semantics beyond the oracle comparisons
(synthetic duplicates, ANN recall, multimodal plumbing, simhash locality)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rdflib_r2r_spark.operators import dedup, multimodal, similarity, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_exact_dedup_finds_synthetic_dups(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "The  quick BROWN fox!"),  # same after normalization
        (3, "something else entirely"),
        (4, "the quick brown fox"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_dup_groups(df).collect()
    assert len(out) == 1
    assert out[0]["n_dups"] == 3 and out[0]["keep"] == 1


def test_lsh_pairs_are_near_dups(spark, docs):
    pairs = dedup.lsh_dup_pairs(docs).collect()
    assert len(pairs) > 0
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    # verify with exact jaccard on true shingle sets
    from rdflib_r2r_spark.reference_impl import tokens_py

    def sh(t):
        toks = tokens_py(t)
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    for r in pairs:
        a, b = sh(texts[r["a"]]), sh(texts[r["b"]])
        jac = len(a & b) / len(a | b)
        assert jac > 0.2, (r["a"], r["b"], jac, r["sim_est"])


def test_ngram_jaccard_bounds(spark, docs):
    pairs = dedup.lsh_dup_pairs(docs).select("a", "b")
    out = dedup.ngram_jaccard_pairs(docs, pairs).collect()
    assert len(out) == pairs.count()
    assert all(0.0 <= r["jaccard"] <= 1.0 for r in out)


def test_simhash_locality(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy cat again and again"),
        (3, "completely different words about spark shuffles and partitions"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["key"]: r["simhash"] for r in dedup.simhash(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sigs[1], sigs[2]) < ham(sigs[1], sigs[3])


def test_ann_lsh_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = [1, 7, 42]
    exact = similarity.brute_force_topk(emb, probes, k=10).collect()
    approx = similarity.ann_lsh_topk(emb, probes, k=10, bits=4).collect()
    exact_set = {(r["probe_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["probe_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 4-bit SRP buckets keep ~1/16 of corpus; same-bucket bias should beat that
    assert recall >= 0.2, recall
    # every approx hit must carry the exact cosine score
    exact_scores = {(r["probe_id"], r["vec_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["probe_id"], r["vec_id"])
        if key in exact_scores:
            assert abs(r["cosine"] - exact_scores[key]) < 1e-9


def test_multimodal_meta_plumbing(spark, docs):
    with_img = multimodal.attach_fake_images(docs)
    meta = multimodal.decode_image_meta(with_img)
    rows = meta.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert r["format"] == "fimg"
        assert r["width"] == (r["doc_id"] % 64 + 1) * 10
        assert r["height"] == (r["doc_id"] % 48 + 1) * 10
    # corrupt binary -> graceful 'unknown', not a crash
    bad = spark.createDataFrame([(99, bytearray(b"NOTANIMAGE"))], "doc_id long, image binary")
    out = multimodal.decode_image_meta(bad).collect()[0]
    assert out["format"] == "unknown" and out["width"] is None
    with pytest.raises(NotImplementedError):
        multimodal.decode_pixels(with_img)


def test_frame_sample_stub(spark, docs):
    with_img = multimodal.attach_fake_images(docs.limit(5))
    frames = multimodal.frame_sample_stub(with_img, every_n=2).collect()
    assert len(frames) > 0
    assert all(r["frame_idx"] % 2 == 0 for r in frames)


def test_text_stats_sane(spark, docs):
    stats = textstats.text_stats(docs).collect()
    for r in stats[:50]:
        assert r["n_tokens"] > 0
        assert 0 <= r["punct_ratio"] <= 1
        assert 0 <= r["stopword_ratio"] <= 1
        assert 0 <= r["quality_score"] <= 1
        assert len(r["fingerprint"]) == 32
