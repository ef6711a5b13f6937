"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline. Probe set is small by
  construction -> broadcast; dot products via zip_with/aggregate (JVM-side
  sequential fold, engine-portable values when cast to double).
- LSH-bucketed ANN (sign random projections): a scale path. Hyperplanes
  are pseudo-random but fully deterministic (md5-seeded), signature = b-bit
  bucket id; candidates only meet within a bucket (+ optional multi-probe),
  turning O(n*q) into a bucket equi-join.
- IVF ANN (inverted-file): the other scale path. C deterministic seed
  centroids (md5-ranked ids), one assignment pass (broadcast centroids,
  C dot products/vector), probes search only their nprobe nearest lists —
  candidates = ~nprobe/C of the corpus via a list_id equi-join. At 100 TB
  the assigned table is written partitioned by list_id so a probe's scan
  prunes to its lists.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(probe_id, rank, vec_id, cosine) — exact top-k neighbors per probe,
    excluding self. Deterministic rank ties broken by vec_id."""
    from pyspark.sql import Window

    probes = emb.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    joined = emb.crossJoin(F.broadcast(probes)).filter(F.col(id_col) != F.col("probe_id"))
    scored = joined.select(
        "probe_id",
        F.col(id_col).alias("vec_id"),
        F.round(cosine_col(F.col("probe_vec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cosine")
    )


def brute_force_topk_sql(
    probe_ids: list[int],
    k: int = 5,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    dot = f"list_sum(list_transform(list_zip(p.probe_vec, e.{vec_col}), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    norm = lambda v: f"sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"  # noqa: E731
    return f"""
WITH p AS (
  SELECT {id_col} AS probe_id, {vec_col} AS probe_vec FROM {table} WHERE {id_col} IN ({ids})
),
scored AS (
  SELECT p.probe_id, e.{id_col} AS vec_id,
         round({dot} / ({norm('p.probe_vec')} * {norm(f'e.{vec_col}')}), 6) AS cosine
  FROM {table} e CROSS JOIN p
  WHERE e.{id_col} <> p.probe_id
)
SELECT probe_id, CAST(row_number() OVER w AS INT) AS rank, vec_id, cosine
FROM scored
WINDOW w AS (PARTITION BY probe_id ORDER BY cosine DESC, vec_id ASC)
QUALIFY rank <= {k}
"""


def ann_lsh_topk_sql(
    probe_ids: list[int],
    k: int = 5,
    dim: int = 64,
    bits: int = 8,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of ann_lsh_topk: the md5-seeded hyperplanes are
    deterministic, so they inline as literal DOUBLE[] arrays."""
    ids = ", ".join(str(i) for i in probe_ids)

    def dot_hp(vec: str, hp: list[float]) -> str:
        lits = ", ".join(str(v) for v in hp)
        return (
            f"list_sum(list_transform(list_zip({vec}, CAST([{lits}] AS DOUBLE[])),"
            " x -> CAST(x[1] AS DOUBLE) * x[2]))"
        )

    bucket = " + ".join(
        f"(CASE WHEN {dot_hp(vec_col, _hyperplane(b, dim))} >= 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )
    dot = (
        f"list_sum(list_transform(list_zip(p.pv, e.{vec_col}),"
        " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )
    norm = lambda v: f"sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"  # noqa: E731
    return f"""
WITH b AS (
  SELECT {id_col}, {vec_col}, {bucket} AS bucket FROM {table}
),
p AS (
  SELECT {id_col} AS probe_id, {vec_col} AS pv, bucket AS pb FROM b WHERE {id_col} IN ({ids})
),
scored AS (
  SELECT p.probe_id, e.{id_col} AS vec_id,
         round({dot} / ({norm('p.pv')} * {norm(f'e.{vec_col}')}), 6) AS cosine
  FROM b e JOIN p ON e.bucket = p.pb AND e.{id_col} <> p.probe_id
)
SELECT probe_id, CAST(row_number() OVER w AS INT) AS rank, vec_id, cosine
FROM scored
WINDOW w AS (PARTITION BY probe_id ORDER BY cosine DESC, vec_id ASC)
QUALIFY rank <= {k}
"""


# -- IVF ANN (inverted file) ---------------------------------------------------

def ivf_centroids(emb: DataFrame, n_centroids: int = 16,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic seed centroids: the n vectors with the smallest
    md5(vec_id) — hash-uniform sampling both engines reproduce, selected via
    orderBy+limit (TakeOrderedAndProject, fully distributed)."""
    return (
        emb.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(F.md5(F.col("cid").cast("string")), F.col("cid"))
        .limit(n_centroids)
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, embedding, list_id): each vector joins its nearest centroid
    by cosine. One broadcast pass over the corpus, C dot products per row."""
    from pyspark.sql import Window

    scored = emb.crossJoin(F.broadcast(centroids)).select(
        id_col, vec_col, "cid",
        cosine_col(F.col(vec_col), F.col("cvec")).alias("_cos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_cos"), F.asc("cid"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(id_col, vec_col, F.col("cid").alias("list_id"))
    )


def ann_ivf_topk(
    emb: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via inverted lists: a probe scores only vectors
    assigned to its nprobe nearest centroid lists."""
    from pyspark.sql import Window

    cents = ivf_centroids(emb, n_centroids, id_col, vec_col)
    assigned = ivf_assign(emb, cents, id_col, vec_col)

    probes = emb.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    pw = Window.partitionBy("probe_id").orderBy(F.desc("_pcos"), F.asc("cid"))
    probe_lists = (
        probes.crossJoin(F.broadcast(cents))
        .select("probe_id", "probe_vec", "cid",
                cosine_col(F.col("probe_vec"), F.col("cvec")).alias("_pcos"))
        .withColumn("_r", F.row_number().over(pw))
        .filter(F.col("_r") <= nprobe)
        .select("probe_id", "probe_vec", F.col("cid").alias("list_id"))
    )

    cands = assigned.join(
        F.broadcast(probe_lists),
        (assigned["list_id"] == probe_lists["list_id"])
        & (F.col(id_col) != F.col("probe_id")),
    )
    scored = cands.select(
        "probe_id",
        F.col(id_col).alias("vec_id"),
        F.round(cosine_col(F.col("probe_vec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cosine")
    )


def ann_ivf_topk_sql(
    probe_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    dot = lambda a, b: (  # noqa: E731
        f"list_sum(list_transform(list_zip({a}, {b}),"
        " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )
    norm = lambda v: f"sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"  # noqa: E731
    cos = lambda a, b: f"{dot(a, b)} / ({norm(a)} * {norm(b)})"  # noqa: E731
    return f"""
WITH cents AS (
  SELECT {id_col} AS cid, {vec_col} AS cvec FROM {table}
  ORDER BY md5(CAST({id_col} AS STRING)), {id_col} LIMIT {n_centroids}
),
assigned AS (
  SELECT {id_col}, {vec_col}, cid AS list_id FROM (
    SELECT e.{id_col}, e.{vec_col}, c.cid,
           row_number() OVER (PARTITION BY e.{id_col}
                              ORDER BY {cos(f'e.{vec_col}', 'c.cvec')} DESC, c.cid ASC) AS r
    FROM {table} e CROSS JOIN cents c
  ) WHERE r = 1
),
probe_lists AS (
  SELECT probe_id, probe_vec, cid AS list_id FROM (
    SELECT p.{id_col} AS probe_id, p.{vec_col} AS probe_vec, c.cid,
           row_number() OVER (PARTITION BY p.{id_col}
                              ORDER BY {cos(f'p.{vec_col}', 'c.cvec')} DESC, c.cid ASC) AS r
    FROM {table} p CROSS JOIN cents c
    WHERE p.{id_col} IN ({ids})
  ) WHERE r <= {nprobe}
),
scored AS (
  SELECT pl.probe_id, a.{id_col} AS vec_id,
         round({cos('pl.probe_vec', f'a.{vec_col}')}, 6) AS cosine
  FROM assigned a JOIN probe_lists pl
    ON a.list_id = pl.list_id AND a.{id_col} <> pl.probe_id
)
SELECT probe_id, CAST(row_number() OVER w AS INT) AS rank, vec_id, cosine
FROM scored
WINDOW w AS (PARTITION BY probe_id ORDER BY cosine DESC, vec_id ASC)
QUALIFY rank <= {k}
"""


# -- LSH ANN (scale path) ------------------------------------------------------

def _hyperplane(bit: int, dim: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from md5 bytes."""
    out: list[float] = []
    i = 0
    while len(out) < dim:
        h = hashlib.md5(f"hp:{bit}:{i}".encode()).digest()
        out.extend(1.0 if byte & 1 else -1.0 for byte in h)
        i += 1
    return out[:dim]


def srp_bucket_col(vec: Column, dim: int, bits: int = 8,
                   table: int = 0) -> Column:
    """Sign-random-projection bucket id (0..2^bits-1).  ``table`` selects
    an independent hyperplane family (banded multi-table LSH); table 0
    with 8 bits reproduces the original single-table bucketing."""
    acc = F.lit(0)
    for b in range(bits):
        hp = F.array(*[F.lit(v) for v in _hyperplane(table * bits + b, dim)])
        sign = (_dot(vec, hp) >= 0).cast("int")
        acc = acc + F.shiftleft(sign, b)
    return acc


def ann_lsh_topk(
    emb: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    dim: int = 64,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's SRP bucket.
    At scale the bucket column is precomputed & partitioned-by, so a probe
    touches 1/2^bits of the corpus."""
    from pyspark.sql import Window

    bucketed = emb.withColumn("_bucket", srp_bucket_col(F.col(vec_col), dim, bits))
    probes = bucketed.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        F.col("_bucket").alias("_pbucket"),
    )
    cands = bucketed.join(
        F.broadcast(probes),
        (F.col("_bucket") == F.col("_pbucket")) & (F.col(id_col) != F.col("probe_id")),
    )
    scored = cands.select(
        "probe_id",
        F.col(id_col).alias("vec_id"),
        F.round(cosine_col(F.col("probe_vec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cosine")
    )


# -- embedding-cosine near-duplicates -----------------------------------------

def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    bits: int = 6,
    tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cosine) embedding-space near-duplicate pairs — the
    embedding-cosine member of the dedup family, banded multi-table
    SRP-LSH (MinHash-band-style OR semantics: a pair is a candidate if it
    collides in ANY of ``tables`` independent ``bits``-bit sign-projection
    tables; exact cosine then verifies).

    Recall math: at cosine t the angle is θ = acos(t); per-bit collision
    P = 1 - θ/π, per-table P^bits, overall 1 - (1 - P^bits)^tables.  At
    the 0.9-threshold near-dup operating point the defaults (6 tables ×
    6 bits) give ≈ 0.95 expected recall (the single 8-bit table's ≈ 0.29
    is why it is now only a config: tables=1, bits=8).  The recall pytest
    measures this against brute-force ground truth.

    Scale shape: the bucket join carries ONLY (table, bucket, key) — the
    banding explode never ships vectors — then candidate pairs are
    DISTINCT-ed and the embeddings joined back twice for exact scoring.
    Never all-pairs; AQE skew-join covers hot buckets; per-bucket volume
    is tuned by ``bits`` (more bits = smaller buckets, add tables to hold
    recall — the standard b×r banding trade).
    """
    keys = emb.select(
        F.col(id_col).alias("key"),
        F.posexplode(
            F.array(*[
                srp_bucket_col(F.col(vec_col), dim, bits, table=t)
                for t in range(tables)
            ])
        ).alias("t", "bucket"),
    )
    l, r = keys.alias("l"), keys.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.t") == F.col("r.t"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.key") < F.col("r.key")),
            "inner",
        )
        .select(F.col("l.key").alias("a"), F.col("r.key").alias("b"))
        .distinct()
    )
    ea = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    eb = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    return (
        pairs.join(ea, "a").join(eb, "b")
        .select(
            "a", "b",
            F.round(cosine_col(F.col("_va"), F.col("_vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs_sql(
    threshold: float = 0.9,
    dim: int = 64,
    bits: int = 6,
    tables: int = 6,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of the banded multi-table path: same md5-seeded
    hyperplane families inlined as literals, per-table bucket joins
    UNION-ed (OR-candidate semantics), embeddings joined back to score."""

    def dot_hp(vec: str, hp: list[float]) -> str:
        lits = ", ".join(str(v) for v in hp)
        return (
            f"list_sum(list_transform(list_zip({vec}, CAST([{lits}] AS DOUBLE[])),"
            " x -> CAST(x[1] AS DOUBLE) * x[2]))"
        )

    def bucket(t: int) -> str:
        return " + ".join(
            f"(CASE WHEN {dot_hp(vec_col, _hyperplane(t * bits + b, dim))} >= 0"
            f" THEN {1 << b} ELSE 0 END)"
            for b in range(bits)
        )

    bucket_cols = ",\n         ".join(
        f"{bucket(t)} AS bucket{t}" for t in range(tables)
    )
    key_rows = "\n  UNION ALL\n".join(
        f"  SELECT key, {t} AS t, bucket{t} AS bucket FROM e"
        for t in range(tables)
    )
    dot = (
        "list_sum(list_transform(list_zip(ea.v, eb.v),"
        " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )
    norm = lambda v: f"sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"  # noqa: E731
    cos = f"round({dot} / ({norm('ea.v')} * {norm('eb.v')}), 6)"
    return f"""
WITH e AS (
  SELECT {id_col} AS key, {vec_col} AS v,
         {bucket_cols}
  FROM {table}
),
k AS (
{key_rows}
),
p AS (
  SELECT DISTINCT l.key AS a, r.key AS b
  FROM k l JOIN k r ON l.t = r.t AND l.bucket = r.bucket AND l.key < r.key
)
SELECT p.a, p.b, {cos} AS cosine
FROM p JOIN e ea ON ea.key = p.a JOIN e eb ON eb.key = p.b
WHERE {cos} >= {threshold}
"""
