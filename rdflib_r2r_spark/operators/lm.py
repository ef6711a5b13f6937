"""Character-bigram language-model perplexity scoring — the CCNet-style
"perplexity filter" (Wenzek et al. 2020): train a small smoothed LM on a
reference slice of the corpus, score every document by its per-character
log-loss under that LM, and gate on a bits-per-character threshold.
Boilerplate, encoding garbage, and keyboard-mash score high; fluent text
scores low.

Reference parity note: the reference engine (DaaX-AI/rdflib-r2r) has no
LM scoring — this is part of the training-data-pipeline surface the graft
brief adds on top of the reference's query coverage.

Exactness design: both engines compute, per distinct bigram, the micro-bit
cost ``round(1e6 * (log2(ctx + V) - log2(cnt + 1)))`` from INTEGER counts,
then SUM those bigints per document.  Integer summation is
order-independent, so the Spark result hash-matches the DuckDB oracle
exactly — no floating-point accumulation-order drift (a per-gram value
would have to sit within ~2e-9 of a rounding boundary to diverge; log2 of
integer ratios never does in practice).  Callers who want a float can
derive ``bits_per_char = lp_e6_sum / n_bigrams / 1e6`` and
``ppl = 2 ** bits_per_char``.

Scale: LM training is one explode + groupBy over the REFERENCE SLICE only
(bounded: char-bigram vocabulary <= ~1.4k entries for the [a-z0-9 ]
alphabet, regardless of corpus size); scoring is one explode + two
BROADCAST joins (the LM and its context marginals are tiny) + a partial
agg by doc_id.  Rows exploded = corpus characters — linear in corpus
bytes, no all-pairs, no skew (gram keys are near-uniform after the
broadcast join the shuffle key is doc_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fixed smoothing vocabulary: a-z, 0-9, space.  A module constant (not
# measured from the corpus) so the Spark and DuckDB twins cannot drift and
# scoring is stable across corpus snapshots.
V_CHARS = 37

# keep threshold in micro-bits per character: documents whose average
# bigram cost exceeds this are flagged (ppl_keep = false).  Corpus-tuned
# like CCNet's per-language percentile cut (their "head/middle/tail" split
# is exactly a quantile threshold on this score): 2.49 bits/char is the
# fixture corpus' median, so the gate discriminates at every SF; noise
# scores near log2(37) ~ 5.21 (the unseen-context cost) and always drops.
THRESH_BITS_E6 = 2_490_000

_NORM_STRIP_RE = "[^a-z0-9 ]"


def _norm_col(text: Column) -> Column:
    s = F.regexp_replace(F.lower(text), _NORM_STRIP_RE, "")
    return F.trim(F.regexp_replace(s, " +", " "))


def _norm_sql(expr: str) -> str:
    return (
        "trim(regexp_replace(regexp_replace(lower(" + expr + "), "
        f"'{_NORM_STRIP_RE}', '', 'g'), ' +', ' ', 'g'))"
    )


def _bigrams_col(s: Column) -> Column:
    # Spark sequence(1, 0) DESCENDS — guard short strings explicitly.
    return F.when(
        F.length(s) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - 1),
            lambda i: s.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def lm_score(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    train_mod: int = 5,
    thresh_bits_e6: int = THRESH_BITS_E6,
) -> DataFrame:
    """Score every document under a char-bigram LM trained on the
    deterministic reference slice ``key_col % train_mod == 0`` (train docs
    are scored too — self-scoring is how CCNet buckets its own corpus).

    Output per doc: ``n_bigrams`` (bigint), ``lp_e6_sum`` (bigint — total
    cost in micro-bits), ``ppl_keep`` (bool — average cost within
    ``thresh_bits_e6`` micro-bits/char).  Smoothing is add-one over the
    fixed V_CHARS alphabet: P(c2|c1) = (cnt(c1c2)+1) / (cnt(c1·)+V).
    """
    key = F.col(key_col)
    # materialize the normalized string before the array lambda: Spark does
    # no CSE inside lambdas, so an inline expr would re-run the regex chain
    # once per character.
    nm = docs.select(key.alias(key_col), _norm_col(F.col(text_col)).alias("_s"))
    b = nm.select(key_col, _bigrams_col(F.col("_s")).alias("_g"))

    train = b.filter(key % train_mod == 0)
    # NOTE: a plain explode here relies on session.py excluding Catalyst's
    # InferFiltersFromGenerate rule — with the rule on, the inferred
    # `size(_g) > 0` filter pushes below the projection and re-evaluates
    # the whole per-char transform + regex chain per row (measured 5x wall
    # on this stage).  tests/test_plan_properties.py pins the plan.
    lm = (
        train.select(F.explode("_g").alias("g"))
        .groupBy("g")
        .agg(F.count("*").cast("bigint").alias("_c"))
    )
    ctx = (
        lm.groupBy(F.substring("g", 1, 1).alias("_c1"))
        .agg(F.sum("_c").alias("_cc"))
    )

    e = b.select(
        key_col,
        F.size("_g").cast("bigint").alias("n_bigrams"),
        F.explode_outer("_g").alias("g"),
    )
    j = e.join(F.broadcast(lm), "g", "left").join(
        F.broadcast(ctx), F.substring(F.col("g"), 1, 1) == F.col("_c1"), "left"
    )
    # micro-bit cost per gram occurrence; > 0 always (cc >= c, so
    # cc + V > c + 1), so HALF_UP (Spark) == half-away (DuckDB).
    lp_e6 = F.round(
        F.lit(1e6)
        * (
            F.log2((F.coalesce(F.col("_cc"), F.lit(0)) + V_CHARS).cast("double"))
            - F.log2((F.coalesce(F.col("_c"), F.lit(0)) + 1).cast("double"))
        )
    ).cast("bigint")
    out = (
        j.groupBy(key_col, "n_bigrams")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("g").isNotNull(), lp_e6)), F.lit(0)
            ).alias("lp_e6_sum")
        )
    )
    return out.select(
        key_col,
        "n_bigrams",
        "lp_e6_sum",
        (F.col("lp_e6_sum") <= F.lit(thresh_bits_e6) * F.col("n_bigrams")).alias(
            "ppl_keep"
        ),
    )


def lm_score_sql(
    table: str = "documents",
    text_col: str = "text",
    key_col: str = "doc_id",
    train_mod: int = 5,
    thresh_bits_e6: int = THRESH_BITS_E6,
) -> str:
    """DuckDB twin of :func:`lm_score` — same fixed alphabet, same integer
    micro-bit rounding, same training slice."""
    nm = _norm_sql(text_col)
    return f"""
WITH nm AS (SELECT {key_col} AS doc_id, {nm} AS s FROM {table}),
b AS (
  SELECT doc_id,
         list_transform(range(1, length(s)), i -> substr(s, i, 2)) AS grams
  FROM nm
),
lm AS (
  SELECT g, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(grams) AS g FROM b) WHERE doc_id % {train_mod} = 0
  GROUP BY g
),
ctx AS (
  SELECT substr(g, 1, 1) AS c1, CAST(sum(c) AS BIGINT) AS cc FROM lm GROUP BY 1
),
e AS (SELECT doc_id, unnest(grams) AS g FROM b),
sc AS (
  SELECT e.doc_id,
         sum(CAST(round(1e6 * (log2(coalesce(ctx.cc, 0) + {V_CHARS}.0)
                               - log2(coalesce(lm.c, 0) + 1.0))) AS BIGINT)) AS lp
  FROM e LEFT JOIN lm USING (g)
         LEFT JOIN ctx ON substr(e.g, 1, 1) = ctx.c1
  GROUP BY 1
)
SELECT b.doc_id AS {key_col},
       CAST(len(b.grams) AS BIGINT) AS n_bigrams,
       CAST(coalesce(sc.lp, 0) AS BIGINT) AS lp_e6_sum,
       coalesce(sc.lp, 0) <= {thresh_bits_e6} * len(b.grams) AS ppl_keep
FROM b LEFT JOIN sc USING (doc_id)
"""
