"""Vocab-driven subword tokenization in real token units.

The committed vocab (``rdflib_r2r_spark/data/bpe_vocab.tsv``, trained by
``scripts/train_vocab.py`` with deterministic BPE merges) has two flavors
per piece — word-initial and continuation (WordPiece's ``##`` distinction,
stored as a cont flag).  Inference is greedy longest-match (maximal
munch): at each position try the longest vocab piece of the right flavor;
no match emits ``<unk>`` (id 0) and advances one char.

Why this design at 100 TB:

- **pre-tokenize → distinct words → encode once → join back.**  Text is
  Zipfian: the distinct-word set is orders of magnitude smaller than the
  token stream, so the Python-side work (the only part Catalyst can't
  express) runs once per distinct word, not once per occurrence.  The
  encode kernel is ``mapInArrow`` (Arrow-batched, no per-row serialization
  round trip); everything around it — the explode, the distinct, the join
  back, the order-preserving reassembly — is built-in column ops inside
  whole-stage codegen.
- the join back is broadcastable when the distinct set is small (AQE
  decides); at web scale it degrades gracefully to a shuffle join on the
  word key, and the reassembly is one groupBy on the doc key.
- chunking / counting downstream are pure array column ops over the
  ``token_ids`` array — no second pass over text.

Oracle parity: the DuckDB twin interprets the SAME committed vocab
(inlined as a VALUES list) with the same greedy rule via a recursive CTE
over distinct words + LEFT LATERAL longest-match step, so Spark and
DuckDB tokenize independently and must agree exactly.

Reference gap: the reference engine (DaaX-AI/rdflib-r2r) has no
tokenizer at all — token units are part of this repo's training-data
pipeline surface (SURVEY.md §2 extras).
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path
from typing import Iterator, NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VOCAB_PATH = Path(__file__).resolve().parents[1] / "data" / "bpe_vocab.tsv"

# word pre-splitter shared by BOTH engines (Java regex and RE2 agree on
# this subset): letter runs, digit runs, single other non-space chars.
# Must equal scripts/train_vocab.py PRETOKEN_RE.
PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

UNK_ID = 0


class Vocab(NamedTuple):
    init: dict[str, int]   # word-initial pieces
    cont: dict[str, int]   # continuation pieces
    max_len: int


def _vocab_text(path: str | None) -> str:
    if path is not None:
        return Path(path).read_text()
    try:
        return VOCAB_PATH.read_text()
    except OSError:
        # zipimported deployment (spark-submit --py-files dist zip): the
        # data file is inside the archive, not on the filesystem
        from importlib.resources import files

        return (files("rdflib_r2r_spark") / "data" / "bpe_vocab.tsv").read_text()


@lru_cache(maxsize=1)
def load_vocab(path: str | None = None) -> Vocab:
    init: dict[str, int] = {}
    cont: dict[str, int] = {}
    max_len = 1
    for line in _vocab_text(path).splitlines():
        tid, flag, piece = line.split("\t", 2)
        if int(tid) == UNK_ID:
            continue
        (cont if flag == "1" else init)[piece] = int(tid)
        max_len = max(max_len, len(piece))
    return Vocab(init, cont, max_len)


def encode_word(word: str, vocab: Vocab) -> list[int]:
    """Greedy longest-match over one pre-tokenized word (pure-Python
    reference used by the Arrow kernel AND by tests as the ground truth)."""
    ids: list[int] = []
    pos, L = 0, len(word)
    while pos < L:
        table = vocab.init if pos == 0 else vocab.cont
        ln = min(vocab.max_len, L - pos)
        while ln > 0:
            tid = table.get(word[pos:pos + ln])
            if tid is not None:
                ids.append(tid)
                pos += ln
                break
            ln -= 1
        else:
            ids.append(UNK_ID)
            pos += 1
    return ids


def _encode_kernel(vocab: Vocab):
    """mapInArrow kernel: (word) batches -> (word, ids) batches.  Runs once
    per DISTINCT word; Arrow-batched both ways, no row-at-a-time UDF."""

    def fn(batches: Iterator) -> Iterator:
        import pyarrow as pa

        for b in batches:
            words = b.column(0).to_pylist()
            ids = [encode_word(w, vocab) for w in words]
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pa.array(ids, type=pa.list_(pa.int32()))],
                ["word", "ids"],
            )

    return fn


def tokenize_docs(docs: DataFrame, text_col: str = "text",
                  key_col: str = "doc_id") -> DataFrame:
    """(key, token_ids array<int>): subword-tokenize every document.

    Plan shape: posexplode_outer(regexp_extract_all) -> distinct words ->
    mapInArrow encode -> LEFT join back (broadcast when the distinct set
    is small) -> order-preserving reassembly (array_sort on (word_pos,
    ids) structs + flatten).  Round 7: the outer explode keeps a sentinel
    row per wordless doc, so the former third scan of ``docs`` + corpus-
    wide SortMergeJoin LeftOuter that re-attached empty docs is gone —
    the reassembly groupBy is the only corpus exchange after the join.
    """
    vocab = load_vocab()
    # outer explode keeps a sentinel row per wordless doc (a NULL-padded
    # inner-explode variant that preserves Generate codegen was A/B'd at
    # both SFs and is NOT faster — same-session min walls sf0.1 1.11 outer
    # vs 1.30 padded, sf1.0 1.95 vs 1.93)
    words = docs.select(
        F.col(key_col),
        F.posexplode_outer(
            F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), F.lit(0))
        ).alias("wpos", "word"),
    )
    distinct = words.filter(F.col("word").isNotNull()).select("word").distinct()
    encoded = distinct.mapInArrow(_encode_kernel(vocab),
                                  "word string, ids array<int>")
    return (
        words.join(encoded, "word", "left")
        .groupBy(key_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("wpos").isNotNull(),
                                   F.struct("wpos", "ids"))
                        )
                    ),
                    lambda s: s["ids"],
                )
            ).alias("token_ids")
        )
    )


def token_stats(docs: DataFrame, text_col: str = "text",
                key_col: str = "doc_id") -> DataFrame:
    """(key, n_subword_tokens, first_token_id, last_token_id) — the
    driver-facing summary (scalars only, so cross-engine value hashing
    never depends on array formatting)."""
    t = tokenize_docs(docs, text_col, key_col)
    return t.select(
        key_col,
        F.size("token_ids").cast("bigint").alias("n_subword_tokens"),
        F.try_element_at("token_ids", F.lit(1)).alias("first_token_id"),
        F.try_element_at("token_ids", F.lit(-1)).alias("last_token_id"),
    )


def chunk_documents_tokens(docs: DataFrame, seq_len: int = 32,
                           stride: int = 24, text_col: str = "text",
                           key_col: str = "doc_id") -> DataFrame:
    """Token-unit sliding-window chunking: windows of ``seq_len`` SUBWORD
    tokens every ``stride`` tokens over the real ``token_ids`` array (the
    regex-token variant is textstats.chunk_documents).  One row per chunk:
    (key, chunk_idx, start_tok, n_tokens, first_token_id, last_token_id).

    Pure array column ops over tokenize_docs output — chunk math adds no
    shuffle beyond tokenization itself.
    """
    t = tokenize_docs(docs, text_col, key_col)
    n = F.size("token_ids")
    n_chunks = F.when(
        n <= seq_len, F.least(n, F.lit(1))
    ).otherwise(F.ceil((n - seq_len) / F.lit(stride)).cast("int") + 1)
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.struct(
            (i - 1).alias("chunk_idx"),
            ((i - 1) * stride + 1).alias("start_tok"),
            F.slice("token_ids", (i - 1) * stride + 1, seq_len).alias("_ids"),
        ),
    )
    # when-guard: sequence(1, 0) DESCENDS in Spark, so a tokenless doc
    # must yield an empty chunk array, not phantom chunks
    chunks = F.when(n > 0, chunks).otherwise(
        F.expr(
            "CAST(array() AS "
            "ARRAY<STRUCT<chunk_idx:INT,start_tok:INT,_ids:ARRAY<INT>>>)"
        )
    )
    return (
        t.select(key_col, F.explode(chunks).alias("c"))
        .select(
            key_col,
            F.col("c.chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("c.start_tok").cast("bigint").alias("start_tok"),
            F.size("c._ids").cast("bigint").alias("n_tokens"),
            F.try_element_at("c._ids", F.lit(1)).alias("first_token_id"),
            F.try_element_at("c._ids", F.lit(-1)).alias("last_token_id"),
        )
    )


# ---------------------------------------------------------------- oracles


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@lru_cache(maxsize=1)
def _vocab_values_sql() -> str:
    """The committed vocab as a DuckDB VALUES list (piece, id, len, cont)."""
    vocab = load_vocab()
    rows = []
    for table, cont in ((vocab.init, "false"), (vocab.cont, "true")):
        for piece, tid in table.items():
            rows.append(
                f"({_sql_quote(piece)}, {tid}, {len(piece)}, {cont})"
            )
    return ",\n  ".join(rows)


def tokenize_ctes(table: str, text_col: str = "text",
                  key_col: str = "doc_id") -> str:
    """Shared WITH-clause body (requires WITH RECURSIVE): defines
    ``tok_per_doc(doc_id, token_ids)`` — the DuckDB twin of
    tokenize_docs, same committed vocab, same greedy rule."""
    # DuckDB single-quoted strings are escape-free, so the Java/RE2-common
    # pretokenizer regex embeds verbatim
    pretoken = PRETOKEN_RE
    return f"""vocab(piece, id, len, cont) AS (
  SELECT * FROM (VALUES
  {_vocab_values_sql()}) t(piece, id, len, cont)
),
tz_docs AS (
  SELECT {key_col} AS doc_id,
         regexp_extract_all({text_col}, '{pretoken}') AS ws
  FROM {table}
),
tz_pos AS (
  SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wpos, ws FROM tz_docs
),
tz_words AS (SELECT doc_id, wpos, ws[wpos] AS word FROM tz_pos),
tz_distinct AS (SELECT DISTINCT word FROM tz_words),
tz_state(word, pos, ids) AS (
  SELECT word, 1, CAST([] AS INTEGER[]) FROM tz_distinct
  UNION ALL
  SELECT s.word, s.pos + coalesce(m.len, 1),
         list_append(s.ids, CAST(coalesce(m.id, 0) AS INTEGER))
  FROM tz_state s LEFT JOIN LATERAL (
    SELECT v.id, v.len FROM vocab v
    WHERE v.cont = (s.pos > 1)
      AND substr(s.word, s.pos, v.len) = v.piece
    ORDER BY v.len DESC LIMIT 1
  ) m ON true
  WHERE s.pos <= length(s.word)
),
tz_encoded AS (
  SELECT word, ids FROM tz_state WHERE pos > length(word)
),
tok_per_doc AS (
  SELECT d.doc_id,
         coalesce(p.token_ids, CAST([] AS INTEGER[])) AS token_ids
  FROM (SELECT DISTINCT doc_id FROM tz_docs) d
  LEFT JOIN (
    SELECT w.doc_id, flatten(list(e.ids ORDER BY w.wpos)) AS token_ids
    FROM tz_words w JOIN tz_encoded e USING (word)
    GROUP BY w.doc_id
  ) p USING (doc_id)
)"""


def token_stats_sql(table: str = "documents", text_col: str = "text",
                    key_col: str = "doc_id") -> str:
    return f"""
WITH RECURSIVE {tokenize_ctes(table, text_col, key_col)}
SELECT doc_id AS {key_col},
       CAST(len(token_ids) AS BIGINT) AS n_subword_tokens,
       token_ids[1] AS first_token_id,
       token_ids[-1] AS last_token_id
FROM tok_per_doc
"""


def chunk_documents_tokens_sql(table: str = "documents", seq_len: int = 32,
                               stride: int = 24, text_col: str = "text",
                               key_col: str = "doc_id") -> str:
    n = "len(token_ids)"
    n_chunks = (
        f"CASE WHEN {n} <= {seq_len} THEN least({n}, 1) "
        f"ELSE CAST(ceil(CAST({n} - {seq_len} AS DOUBLE) / {stride}) AS INT) + 1 END"
    )
    return f"""
WITH RECURSIVE {tokenize_ctes(table, text_col, key_col)},
ck_d AS (SELECT doc_id, token_ids, {n_chunks} AS nc FROM tok_per_doc),
ck_e AS (
  SELECT doc_id, unnest(range(1, nc + 1)) AS i, token_ids FROM ck_d
),
ck AS (
  SELECT doc_id, i - 1 AS chunk_idx, (i - 1) * {stride} + 1 AS start_tok,
         list_slice(token_ids, (i - 1) * {stride} + 1,
                    (i - 1) * {stride} + {seq_len}) AS ids
  FROM ck_e
)
SELECT doc_id AS {key_col},
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(len(ids) AS BIGINT) AS n_tokens,
       ids[1] AS first_token_id,
       ids[-1] AS last_token_id
FROM ck
"""
