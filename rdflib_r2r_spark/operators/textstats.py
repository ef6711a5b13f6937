"""Text analysis for training-data curation: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Everything is built-in pyspark.sql.functions (JVM, codegen) with an exact
DuckDB-SQL twin per operator so the driver's oracle gate covers each one.
The shared tokenization is the same split used by mention detection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# BPE-ish pretokenizer: word pieces or single non-space punctuation
BPE_RE = "[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"

# tiny deterministic stopword lists keyed to common function words; the
# lang-id heuristic scores stopword overlap per language.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "data"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en"],
}


def tokens_col(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )


def _stop_count_col(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def _stop_count_sql(toks: str, words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks}, t -> t IN ({lst})))"


def text_stats(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Per-document curation stats + quality score (length/punct/stopword
    heuristics, cf. C4/Gopher-style filters)."""
    # materialize tokens once; downstream exprs reference the cheap attribute
    docs = docs.select(key_col, text_col, tokens_col(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    alnum_sp = F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9 ]", "")
    punct_ratio = F.round(
        (n_char - F.length(alnum_sp)).cast("double")
        / F.greatest(n_char, F.lit(1)).cast("double"),
        6,
    )
    stop_ratio = F.round(
        _stop_count_col(toks, STOPWORDS["en"]).cast("double")
        / F.greatest(n_tok, F.lit(1)).cast("double"),
        6,
    )
    avg_tok_len = F.round(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / F.greatest(n_tok, F.lit(1)).cast("double"),
        6,
    )
    bpe_count = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0))
    quality = F.round(
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.5
        + stop_ratio * 0.3
        + (F.lit(1.0) - punct_ratio) * 0.2,
        6,
    )
    return docs.select(
        F.col(key_col),
        n_tok.cast("bigint").alias("n_tokens"),
        bpe_count.cast("bigint").alias("n_bpe_tokens"),
        n_char.cast("bigint").alias("n_char"),
        avg_tok_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
        F.md5(F.concat_ws(" ", toks)).alias("fingerprint"),
    )


def text_stats_sql(table: str = "documents", text_col: str = "text", key_col: str = "doc_id") -> str:
    toks = tokens_sql(text_col)
    n_tok = f"len({toks})"
    n_char = f"length({text_col})"
    alnum_sp = f"regexp_replace({text_col}, '[^a-zA-Z0-9 ]', '', 'g')"
    punct_ratio = f"round(CAST({n_char} - length({alnum_sp}) AS DOUBLE) / greatest({n_char}, 1), 6)"
    stop_ratio = (
        f"round(CAST({_stop_count_sql(toks, STOPWORDS['en'])} AS DOUBLE)"
        f" / greatest({n_tok}, 1), 6)"
    )
    avg_tok_len = (
        f"round(CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE)"
        f" / greatest({n_tok}, 1), 6)"
    )
    bpe = f"len(regexp_extract_all({text_col}, '{BPE_RE}'))"
    quality = (
        f"round(least({n_tok} / 100.0, 1.0) * 0.5 + {stop_ratio} * 0.3"
        f" + (1.0 - {punct_ratio}) * 0.2, 6)"
    )
    return f"""
SELECT {key_col},
       CAST({n_tok} AS BIGINT) AS n_tokens,
       CAST({bpe} AS BIGINT) AS n_bpe_tokens,
       CAST({n_char} AS BIGINT) AS n_char,
       {avg_tok_len} AS avg_token_len,
       {punct_ratio} AS punct_ratio,
       {stop_ratio} AS stopword_ratio,
       {quality} AS quality_score,
       md5(array_to_string({toks}, ' ')) AS fingerprint
FROM {table}
"""


def lang_id(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """n-gram-free stopword-overlap language ID; deterministic argmax with
    fixed tie order en > de > fr > es."""
    docs = docs.select(key_col, tokens_col(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    scores = {lang: _stop_count_col(toks, ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*scores.values())
    pred = F.when(best == F.lit(0), F.lit("und"))
    for lang in ["en", "de", "fr", "es"]:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return docs.select(
        F.col(key_col),
        pred.alias("pred_lang"),
        best.cast("bigint").alias("stopword_hits"),
    )


def lang_id_sql(table: str = "documents", text_col: str = "text", key_col: str = "doc_id") -> str:
    toks = tokens_sql(text_col)
    scores = {lang: _stop_count_sql(toks, ws) for lang, ws in STOPWORDS.items()}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = "".join(
        f" WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in ["en", "de", "fr", "es"]
    )
    return f"""
SELECT {key_col},
       CASE WHEN {best} = 0 THEN 'und'{whens} END AS pred_lang,
       CAST({best} AS BIGINT) AS stopword_hits
FROM {table}
"""


# -- rolling-hash fingerprint --------------------------------------------------

ROLL_B = 1_000_003  # polynomial base (prime)
ROLL_P = (1 << 31) - 1


def rolling_fingerprint(docs: DataFrame, text_col: str = "text",
                        key_col: str = "doc_id", window: int = 16) -> DataFrame:
    """(doc_id, fingerprint, n_windows) Rabin-style rolling-hash document
    fingerprint: polynomial hash over token hashes, plus the count of
    content-defined chunk boundaries (windows where the rolling hash of the
    last `window` tokens hits hash % window == 0 — the fingerprint a
    CDC-style shift-resistant dedup would chunk on).

    All whole-stage-codegen array ops: one md5 per token, two aggregates —
    no explode, no shuffle; scales linearly with corpus bytes.
    """
    toks = tokens_col(F.col(text_col))
    th = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint") % ROLL_P,
    )
    d = docs.select(F.col(key_col).alias("doc_id"), th.alias("_th"))
    rolled = F.aggregate(
        F.col("_th"), F.lit(0).cast("bigint"),
        lambda acc, h: (acc * ROLL_B + h) % ROLL_P,
    )
    # per-position rolling value (prefix polynomial hash) -> boundary count
    prefix = F.transform(
        F.sequence(F.lit(1), F.size("_th")),
        lambda i: F.aggregate(
            F.slice(F.col("_th"), F.greatest(i - window + 1, F.lit(1)),
                    F.least(i, F.lit(window))),
            F.lit(0).cast("bigint"),
            lambda acc, h: (acc * ROLL_B + h) % ROLL_P,
        ),
    )
    n_bound = F.size(F.filter(prefix, lambda v: v % window == 0))
    return d.select(
        "doc_id",
        rolled.alias("fingerprint"),
        F.when(F.size("_th") > 0, n_bound).otherwise(F.lit(0))
        .cast("bigint").alias("n_windows"),
    )


def rolling_fingerprint_sql(table: str = "documents", text_col: str = "text",
                            key_col: str = "doc_id", window: int = 16) -> str:
    toks = tokens_sql(text_col)
    th = (
        f"list_transform({toks}, t -> "
        f"CAST(('0x' || substring(md5(t), 1, 15))::UBIGINT AS BIGINT) % {ROLL_P})"
    )
    rolled = f"list_reduce(list_prepend(CAST(0 AS BIGINT), th), (a, h) -> (a * {ROLL_B} + h) % {ROLL_P})"
    win_hash = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_slice(th, greatest(i - {window} + 1, 1), i)), "
        f"(a, h) -> (a * {ROLL_B} + h) % {ROLL_P})"
    )
    n_bound = (
        f"len(list_filter(list_transform(range(1, len(th) + 1), i -> {win_hash}),"
        f" v -> v % {window} = 0))"
    )
    return f"""
WITH th_t AS (SELECT {key_col} AS doc_id, {th} AS th FROM {table})
SELECT doc_id,
       {rolled} AS fingerprint,
       CAST(CASE WHEN len(th) > 0 THEN {n_bound} ELSE 0 END AS BIGINT) AS n_windows
FROM th_t
"""
