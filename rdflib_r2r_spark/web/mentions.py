"""Mention detection + entity linking against a broadcast alias dictionary.

All tokenization is Spark SQL built-ins (split/posexplode — JVM-side); the
alias dictionary is tiny by construction and joined with an explicit
``F.broadcast`` hint (north_star: "batched mention detection and entity-link
scoring ... plus a broadcast alias dictionary"), so mention detection is a
map-only stage with zero shuffle for the join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
DEFAULT_DICT_SIZE = 24
MIN_ALIAS_LEN = 4
ENTITY_BASE = "http://ex.org/entity/"


def tokens_df(pages: DataFrame, text_col: str = "text", key_col: str = "url") -> DataFrame:
    """(key, pos, token) — lowercased, non-alphanumeric-delimited tokens."""
    return (
        pages.select(
            F.col(key_col).alias("key"),
            F.posexplode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias("pos", "token"),
        )
        .filter(F.col("token") != "")
    )


def build_alias_dict(
    pages: DataFrame,
    text_col: str = "text",
    key_col: str = "url",
    size: int = DEFAULT_DICT_SIZE,
    min_len: int = MIN_ALIAS_LEN,
) -> DataFrame:
    """Deterministic alias dictionary: the ``size`` most frequent tokens of
    length >= min_len, ties broken by token; entity_id = frequency rank,
    prior = corpus frequency share. (alias, entity_id, prior) — FIXTURES.md F5.
    """
    tok = tokens_df(pages, text_col, key_col)
    counts = (
        tok.filter(F.length("token") >= min_len)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("t"))
    # Top-size via orderBy+limit = TakeOrderedAndProject (fully distributed,
    # per-partition top-k then merge) — the full counts table never goes
    # through a global single-partition Window. Ranking then runs over the
    # <=size-row result only; the constant partition key keeps WindowExec off
    # its unpartitioned path (no single-task scale hazard: input is bounded).
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(size)
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("cnt"), F.asc("token"))
    return (
        top.withColumn("entity_id", F.row_number().over(w))
        .crossJoin(total)
        .select(
            F.col("token").alias("alias"),
            F.col("entity_id").cast("long").alias("entity_id"),
            (F.col("cnt").cast("double") / F.col("t")).alias("prior"),
        )
    )


def detect_mentions(pages: DataFrame, alias_dict: DataFrame,
                    text_col: str = "text", key_col: str = "url") -> DataFrame:
    """(url, mention, pos, entity_id, prior): every token occurrence that
    matches an alias. Broadcast hash join — no shuffle of the corpus side."""
    tok = tokens_df(pages, text_col, key_col)
    return (
        tok.join(F.broadcast(alias_dict), tok["token"] == alias_dict["alias"], "inner")
        .select(
            F.col("key").alias("url"),
            F.col("token").alias("mention"),
            F.col("pos"),
            F.col("entity_id"),
            F.col("prior"),
        )
    )


def mention_triples(mentions: DataFrame) -> DataFrame:
    """Distinct (doc, ex:mentions, entity) triples in the engine's term
    encoding."""
    return (
        mentions.select(
            F.concat(F.lit("<"), F.col("url"), F.lit(">")).alias("subj"),
            F.lit("<http://ex.org/mentions>").alias("pred"),
            F.concat(F.lit("<" + ENTITY_BASE), F.col("entity_id").cast("string"), F.lit(">")).alias("obj"),
        )
        .distinct()
        .select(
            "subj", "pred", "obj",
            F.lit(None).cast("string").alias("obj_dt"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("graph"),
        )
    )
