"""MinHash-LSH candidate blocking for near-duplicate / same-entity linking.

Scale shape (north_star: "MinHash-LSH candidate blocking"):

- signatures are computed per row with ``array_min(transform(...))`` over the
  shingle array — NO explode, NO shuffle, pure whole-stage-codegen;
- banding turns the quadratic candidate problem into an equi-join keyed on
  band values: only documents sharing a band bucket ever meet, so the
  shuffle is bounded by corpus size x bands, never O(n^2);
- candidate pairs are verified by full-signature agreement (estimated
  Jaccard) before becoming edges.

Hash family: ONE md5 base hash per shingle (engine-portable: identical in
Spark, DuckDB and Python), then j affine permutations
``(a_j * h + b_j) mod p`` (p = 2^31-1) — the standard universal-hash
minhash family. One expensive hash pass instead of num_hashes passes;
xxhash64 would be faster still but is Spark-only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 8
DEFAULT_BAND_ROWS = 2  # hashes per band -> bands = num_hashes // band_rows
SHINGLE_K = 3
MINHASH_P = (1 << 31) - 1  # Mersenne prime; a*h+b stays < 2^62 (no overflow
#                            in either engine's 64-bit signed arithmetic)


def hash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) affine coefficients derived from md5."""
    out = []
    for j in range(num_hashes):
        d = hashlib.md5(f"minhash-param:{j}".encode()).hexdigest()
        a = (int(d[:8], 16) % (MINHASH_P - 1)) + 1
        b = int(d[8:16], 16) % MINHASH_P
        out.append((a, b))
    return out


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


def base_hash_col(shingles: Column) -> Column:
    """h(s) = int(md5(s)[:15 hex], 16) mod p — the one expensive pass."""
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % MINHASH_P,
    )


def minhash_sig_cols(base_hashes: Column, num_hashes: int = DEFAULT_NUM_HASHES) -> list[Column]:
    """mh_j = min over shingles of (a_j*h + b_j) mod p — cheap arithmetic
    over the materialized base-hash array."""
    def perm(a: int, b: int):
        # closure, not default args — higher-order fns require 1-ary lambdas
        return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P

    cols = []
    for j, (a, b) in enumerate(hash_params(num_hashes)):
        cols.append(
            F.array_min(F.transform(base_hashes, perm(a, b))).alias(f"mh{j}")
        )
    return cols


def signatures(df: DataFrame, text_col: str = "text", key_col: str = "url",
               num_hashes: int = DEFAULT_NUM_HASHES) -> DataFrame:
    # staged projections so tokens, shingles and base hashes are computed
    # ONCE per row; the num_hashes min-hash columns then reference cheap
    # attributes (array lambdas get no CSE — never inline expensive exprs).
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    step1 = df.select(F.col(key_col).alias("key"), toks.alias("_toks"))
    step2 = step1.select("key", shingles_from_tokens(F.col("_toks")).alias("_sh"))
    step3 = step2.select("key", base_hash_col(F.col("_sh")).alias("_hv"))
    return step3.select("key", *minhash_sig_cols(F.col("_hv"), num_hashes))


def band_df(sigs: DataFrame, num_hashes: int = DEFAULT_NUM_HASHES,
            band_rows: int = DEFAULT_BAND_ROWS) -> DataFrame:
    """(key, band_id, band_val): band value = concat of its rows' minhashes."""
    bands = num_hashes // band_rows
    arms = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws(
                "|", *[F.col(f"mh{b * band_rows + r}").cast("string") for r in range(band_rows)]
            ).alias("band_val"),
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
                   threshold: float = 0.5,
                   sigs: DataFrame | None = None) -> DataFrame:
    """Pass precomputed ``sigs`` when available (e.g. a checkpointed stage).
    Otherwise the signature plan is persisted here: it feeds BOTH sides of
    the candidate self-join plus verification — without materialization the
    minhash computation would re-execute 4x."""
    own_sigs = sigs is None
    if own_sigs:
        sigs = signatures(df, text_col, key_col, num_hashes).persist()
    pairs = candidate_pairs(band_df(sigs, num_hashes, band_rows))
    return verified_edges(pairs, sigs, num_hashes, threshold)
