"""Single-node pure-Python reference emission of the KG pipeline.

This plays the role the reference's rdflib/SQLite oracle plays in its own
suites (reference: old_tests/test_bsbm.py:131-144 — oracle = in-memory
evaluation of the same query, compared after normalization): an independent,
trivially-auditable implementation of the SAME spec, used by pytest to check
triple-level P/R >= 0.95 of the distributed pipeline (BASELINE.json).

Deliberately naive: dicts, Counter, union-find. No Spark, no pandas beyond
input loading.
"""

from __future__ import annotations

import hashlib
import zlib
import re
from collections import Counter
from datetime import datetime, timedelta

from rdflib_r2r_spark.pipeline import EX
from rdflib_r2r_spark.web.mentions import DEFAULT_DICT_SIZE, ENTITY_BASE, MIN_ALIAS_LEN
from rdflib_r2r_spark.web.linking import DEFAULT_BAND_ROWS, DEFAULT_NUM_HASHES, SHINGLE_K

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
BASE_URL = "http://ex.org/doc/"


def wrap_html_py(text: str, lang: str, doc_id: int) -> str:
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return (
        f'<html lang="{lang}"><head><title>doc {doc_id}</title>'
        "<script>var x=1;</script></head><body><nav>skip</nav><article>"
        + esc
        + "</article><footer>(c) example</footer></body></html>"
    )


def extract_text_py(html: str) -> str:
    s = re.sub(r"(?is)<(script|style)\b[^>]*>.*?</\1>", "", html)
    m = re.search(r"(?is)<article\b[^>]*>(.*?)</article>", s)
    if m:
        s = m.group(1)
    else:
        m = re.search(r"(?is)<body\b[^>]*>(.*?)</body>", s)
        if m:
            s = m.group(1)
    s = re.sub(r"(?s)<[^>]*>", "", s)
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def tokens_py(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def alias_dict_py(texts: dict[str, str], size: int = DEFAULT_DICT_SIZE,
                  min_len: int = MIN_ALIAS_LEN) -> dict[str, int]:
    counts = Counter()
    for text in texts.values():
        counts.update(t for t in tokens_py(text) if len(t) >= min_len)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
    return {tok: i + 1 for i, (tok, _) in enumerate(ranked)}


def minhash_sig_py(text: str, num_hashes: int = DEFAULT_NUM_HASHES,
                   k: int = SHINGLE_K) -> list[int] | None:
    from rdflib_r2r_spark.web.linking import MINHASH_P, _shingle_coeffs, hash_params

    toks = tokens_py(text)
    if not toks:
        return None
    # zlib.crc32 == Spark's crc32 bit-for-bit (both standard CRC-32);
    # shingle hashes are numeric polynomial combinations of token hashes
    th = [zlib.crc32(t.encode()) % MINHASH_P for t in toks]
    a1, a2, b = _shingle_coeffs()
    if len(th) >= k:
        coeffs = [a1, a2, 1][:k]
        hv = [
            sum(c * th[i + j] % MINHASH_P for j, c in enumerate(coeffs)) % MINHASH_P
            for i in range(len(th) - k + 1)
        ]
    else:
        acc = 0
        for h in th:
            acc = (acc * b + h) % MINHASH_P
        hv = [acc]
    return [min((a * h + bb) % MINHASH_P for h in hv) for a, bb in hash_params(num_hashes)]


class _UF:
    def __init__(self):
        self.p: dict = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            self.p[rb] = ra


def reference_triples(
    docs: list[dict],
    dict_size: int = DEFAULT_DICT_SIZE,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
    threshold: float = 0.5,
) -> set[tuple[str, str, str]]:
    """docs: rows of documents.parquet as dicts. Returns the reference
    (subj, pred, obj) set the Spark pipeline must match at P/R >= 0.95."""
    texts: dict[str, str] = {}
    langs: dict[str, str] = {}
    for d in docs:
        url = BASE_URL + str(d["doc_id"])
        html = wrap_html_py(d["text"], d["lang"], d["doc_id"])
        texts[url] = extract_text_py(html)
        langs[url] = d["lang"]

    epoch = datetime(2024, 1, 1)
    triples: set[tuple[str, str, str]] = set()
    for d in docs:
        url = BASE_URL + str(d["doc_id"])
        ts = epoch + timedelta(seconds=int(d["doc_id"]))
        # canonical xsd:dateTime lexical ('T' separator, W3C TC0016b/c)
        triples.add((f"<{url}>", f"<{EX}fetched>", ts.strftime("%Y-%m-%dT%H:%M:%S")))
    for url, text in texts.items():
        triples.add((f"<{url}>", RDF_TYPE, f"<{EX}Document>"))
        triples.add((f"<{url}>", f"<{EX}lang>", langs[url]))

    aliases = alias_dict_py(texts, dict_size)
    for url, text in texts.items():
        for tok in set(tokens_py(text)):
            if tok in aliases:
                triples.add((f"<{url}>", f"<{EX}mentions>", f"<{ENTITY_BASE}{aliases[tok]}>"))

    # MinHash-LSH near-dup edges + union-find canonicalization
    sigs = {url: minhash_sig_py(t, num_hashes) for url, t in texts.items()}
    buckets: dict[tuple[int, str], list[str]] = {}
    bands = num_hashes // band_rows
    for url, sig in sigs.items():
        if sig is None:
            continue
        for b in range(bands):
            val = "|".join(str(v) for v in sig[b * band_rows:(b + 1) * band_rows])
            buckets.setdefault((b, val), []).append(url)
    uf = _UF()
    for _key, urls in buckets.items():
        urls = sorted(urls)
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                a, b = urls[i], urls[j]
                agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
                if agree / num_hashes >= threshold:
                    uf.union(a, b)
    for url in texts:
        root = uf.find(url)
        if root != url:
            triples.add((f"<{url}>", f"<{EX}duplicateOf>", f"<{root}>"))
    return triples


def precision_recall(got: set, want: set) -> tuple[float, float]:
    tp = len(got & want)
    precision = tp / len(got) if got else 1.0
    recall = tp / len(want) if want else 1.0
    return precision, recall
