"""Mention detection + entity linking against a broadcast alias dictionary.

All tokenization is Spark SQL built-ins (split/posexplode — JVM-side); the
alias dictionary is tiny by construction and joined with an explicit
``F.broadcast`` hint (north_star: "batched mention detection and entity-link
scoring ... plus a broadcast alias dictionary"), so mention detection is a
map-only stage with zero shuffle for the join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    # dictionary building needs neither positions nor short tokens: filter
    # INSIDE the token array (length >= min_len subsumes != "" for
    # min_len >= 1) and plain-explode — the exploded row count drops by the
    # short-token share (~40% of web tokens) and no pos int is carried.
    # Same counts as the posexplode+post-filter formulation, cheaper rows.
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda t: (t != "") & (F.length(t) >= min_len),
    )
    counts = (
        pages.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("t"))
    # Top-size via orderBy+limit = TakeOrderedAndProject (fully distributed,
    # per-partition top-k then merge) — the full counts table never goes
    # through a global single-partition Window. Ranking then happens WITHOUT
    # any window at all: rank(x) = |{y : y sorts at-or-before x}| via a
    # self-join of the <=size-row result (bounded quadratic on <=size rows;
    # no WindowExec, no single-partition path anywhere in the plan).
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(size)
    a, b = top.alias("rk_a"), top.alias("rk_b")
    before_or_self = (F.col("rk_b.cnt") > F.col("rk_a.cnt")) | (
        (F.col("rk_b.cnt") == F.col("rk_a.cnt")) & (F.col("rk_b.token") <= F.col("rk_a.token"))
    )
    ranked = (
        a.join(b, before_or_self, "inner")
        .groupBy(F.col("rk_a.token").alias("token"), F.col("rk_a.cnt").alias("cnt"))
        .agg(F.count(F.lit(1)).alias("entity_id"))
    )
    return (
        ranked
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


def mention_triples(mentions: DataFrame, pre_deduped: bool = False) -> DataFrame:
    """Distinct (doc, ex:mentions, entity) triples in the engine's term
    encoding.  Late IRI rendering: the distinct shuffles the RAW
    (url, entity_id) pair — one short string + one bigint — and the
    `<iri>` strings are concatenated only once, after the exchange, on the
    already-deduplicated rows (E18 applied to the materialization path).
    ``pre_deduped`` skips the distinct when the input is already a pair set
    (mention_entities output — per-doc dedup of ENTITY ids plus distinct
    urls makes the pairs globally distinct; url is the page key, unique by
    construction in pages_df/extract)."""
    pairs = mentions.select("url", "entity_id")
    if not pre_deduped:
        pairs = pairs.distinct()
    return (
        pairs
        .select(
            F.concat(F.lit("<"), F.col("url"), F.lit(">")).alias("subj"),
            F.lit("<http://ex.org/mentions>").alias("pred"),
            F.concat(F.lit("<" + ENTITY_BASE), F.col("entity_id").cast("string"), F.lit(">")).alias("obj"),
            F.lit(None).cast("string").alias("obj_dt"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("graph"),
        )
    )


def mention_entities(pages: DataFrame, alias_dict: DataFrame,
                     text_col: str = "text", key_col: str = "url",
                     max_inline: int = 512) -> DataFrame:
    """Distinct (url, entity_id) pairs — the pipeline's mention fast path.

    detect_mentions explodes EVERY token into its own row (url duplicated
    per token) before the broadcast join; for N docs x ~100 tokens that is
    a 100N-row intermediate just to find ~0.3N matches.  The alias dict is
    bounded by construction (``size`` param), so inline it as an array
    literal and map tokens to entities per row: ``array_intersect(tokens,
    aliases)`` dedups matched ALIASES within the doc, then
    ``array_distinct(transform(.., amap))`` dedups the mapped ENTITY ids —
    so the pairs stay distinct even when several aliases link to one entity
    (alias->entity need not be injective) — and emits ONLY matches: no
    token explode, no join, no extra shuffle, pure whole-stage codegen.
    Falls back to the join path if the dict exceeds ``max_inline``.
    MEASURED (sf0.1 corpus, local[32], min-of-3 noop-sink walls): the
    broadcast join is FLAT at ~0.4s from 128 to 32k entries while the
    inline literal degrades linearly once the expression tree dominates —
    dict=30: 0.18s inline / 0.38s join; 512: 0.34 / 0.42; 1024: 0.50 /
    0.42 (crossover); 8192: 5.2 / 0.41; 32768: 23.3 / 0.42.  The default
    sits at 512, comfortably on the winning side of the crossover;
    real alias dictionaries (thousands of entries) take the join path.
    Position/prior attribution stays on detect_mentions — this path feeds
    mention_triples, which only needs the distinct pair set.
    """
    rows = alias_dict.select("alias", "entity_id").collect()
    if not rows:
        # zero-element F.array()/F.create_map() literals are void-typed and
        # fail analysis inside array_intersect; an empty dict just means no
        # mentions.
        return (
            pages.select(
                F.col(key_col).alias("url"),
                F.lit(None).cast("long").alias("entity_id"),
            ).limit(0)
        )
    if len(rows) > max_inline:
        return (
            detect_mentions(pages, alias_dict, text_col, key_col)
            .select("url", "entity_id").distinct()
        )
    aliases = F.array(*[F.lit(r["alias"]) for r in rows])
    amap = F.create_map(
        *[x for r in rows for x in (F.lit(r["alias"]), F.lit(int(r["entity_id"])))]
    )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda t: t != ""
    )
    ents = F.array_distinct(
        F.transform(F.array_intersect(toks, aliases), lambda t: amap[t])
    )
    return (
        pages.select(
            F.col(key_col).alias("url"),
            F.explode(ents).alias("entity_id"),
        )
        .select("url", F.col("entity_id").cast("long").alias("entity_id"))
    )
