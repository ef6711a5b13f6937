"""MinHash-LSH candidate blocking for near-duplicate / same-entity linking.

Scale shape (north_star: "MinHash-LSH candidate blocking"):

- signatures are computed per row with ``array_min(transform(...))`` over the
  shingle array — NO explode, NO shuffle, pure whole-stage-codegen;
- banding turns the quadratic candidate problem into an equi-join keyed on
  band values: only documents sharing a band bucket ever meet, so the
  shuffle is bounded by corpus size x bands, never O(n^2);
- candidate pairs are verified by full-signature agreement (estimated
  Jaccard) before becoming edges.

Hash family is md5-based (``md5(j || ':' || shingle)``) so DuckDB oracles and
the pure-Python reference implementation reproduce identical signatures;
xxhash64 would be faster but is Spark-only. Swap via ``hash_expr``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 8
DEFAULT_BAND_ROWS = 2  # hashes per band -> bands = num_hashes // band_rows
SHINGLE_K = 3


def shingles_from_tokens(toks: Column, k: int = SHINGLE_K) -> Column:
    """Word k-gram shingles from a (pre-materialized) token array column.
    Pass an attribute reference, not the tokenizer expression — otherwise
    the tokenizer is re-evaluated per element_at (no CSE inside lambdas)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
    )
    return F.when(n >= k, F.transform(idx, gram)).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(F.array().cast("array<string>"))
    )


def shingles_col(text: Column, k: int = SHINGLE_K) -> Column:
    """Shingles directly from text — only for single-use contexts."""
    toks = F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")
    return shingles_from_tokens(toks, k)


def minhash_sig_cols(shingles: Column, num_hashes: int = DEFAULT_NUM_HASHES) -> list[Column]:
    """One min-hash per hash function j: min over shingles of
    md5('{j}:'+shingle) — lexicographic min over hex, engine-portable."""
    return [
        F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{j}:"), s)))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]


def signatures(df: DataFrame, text_col: str = "text", key_col: str = "url",
               num_hashes: int = DEFAULT_NUM_HASHES) -> DataFrame:
    # three projections so tokens and shingles are computed ONCE per row;
    # the num_hashes min-hash columns then reference cheap attributes.
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    step1 = df.select(F.col(key_col).alias("key"), toks.alias("_toks"))
    step2 = step1.select("key", shingles_from_tokens(F.col("_toks")).alias("_sh"))
    return step2.select("key", *minhash_sig_cols(F.col("_sh"), num_hashes))


def band_df(sigs: DataFrame, num_hashes: int = DEFAULT_NUM_HASHES,
            band_rows: int = DEFAULT_BAND_ROWS) -> DataFrame:
    """(key, band_id, band_val): band value = concat of its rows' minhashes."""
    bands = num_hashes // band_rows
    arms = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws("|", *[F.col(f"mh{b * band_rows + r}") for r in range(band_rows)]).alias("band_val"),
        )
        for b in range(bands)
    ]
    return (
        sigs.select("key", F.explode(F.array(*arms)).alias("b"))
        .select("key", F.col("b.band_id").alias("band_id"), F.col("b.band_val").alias("band_val"))
        .filter(F.col("band_val").isNotNull() & (F.col("band_val") != ""))
    )


def candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (a, b) with a < b sharing any band bucket. Equi-join on
    (band_id, band_val); AQE skew-join splits hot buckets."""
    l = bands.alias("l")
    r = bands.alias("r")
    return (
        l.join(r, (F.col("l.band_id") == F.col("r.band_id"))
               & (F.col("l.band_val") == F.col("r.band_val"))
               & (F.col("l.key") < F.col("r.key")), "inner")
        .select(F.col("l.key").alias("a"), F.col("r.key").alias("b"))
        .distinct()
    )


def verified_edges(pairs: DataFrame, sigs: DataFrame,
                   num_hashes: int = DEFAULT_NUM_HASHES,
                   threshold: float = 0.5) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing minhashes >= threshold."""
    sa = sigs.select(F.col("key").alias("a"), *[F.col(f"mh{j}").alias(f"a{j}") for j in range(num_hashes)])
    sb = sigs.select(F.col("key").alias("b"), *[F.col(f"mh{j}").alias(f"b{j}") for j in range(num_hashes)])
    est = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0) for j in range(num_hashes)
    ) / F.lit(float(num_hashes))
    return (
        pairs.join(sa, "a").join(sb, "b")
        .withColumn("sim_est", est)
        .filter(F.col("sim_est") >= threshold)
        .select("a", "b", "sim_est")
    )


def near_dup_edges(df: DataFrame, text_col: str = "text", key_col: str = "url",
                   num_hashes: int = DEFAULT_NUM_HASHES,
                   band_rows: int = DEFAULT_BAND_ROWS,
                   threshold: float = 0.5) -> DataFrame:
    sigs = signatures(df, text_col, key_col, num_hashes)
    pairs = candidate_pairs(band_df(sigs, num_hashes, band_rows))
    return verified_edges(pairs, sigs, num_hashes, threshold)
