"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline. Probe set is small by
  construction -> broadcast; dot products via zip_with/aggregate (JVM-side
  sequential fold, engine-portable values when cast to double).
- LSH-bucketed ANN (sign random projections): the scale path. Hyperplanes
  are pseudo-random but fully deterministic (md5-seeded), signature = b-bit
  bucket id; candidates only meet within a bucket (+ optional multi-probe),
  turning O(n*q) into a bucket equi-join.
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


def srp_bucket_col(vec: Column, dim: int, bits: int = 8) -> Column:
    """Sign-random-projection bucket id (0..2^bits-1)."""
    acc = F.lit(0)
    for b in range(bits):
        hp = F.array(*[F.lit(v) for v in _hyperplane(b, dim)])
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
