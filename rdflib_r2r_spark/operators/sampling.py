"""Deterministic stratified mixture sampling.

Freezing a training mix means sampling each stratum (language, source,
quality band) at its own rate, reproducibly: re-running the job on the
same corpus must select the SAME documents, with no RNG state and no
coordination.  The draw is a pure function of the stable document key —
``md5(key)``'s first 8 hex digits scaled to [0, 1) — so the sample is a
per-row filter that rides whole-stage codegen: no shuffle, no sort, no
sampleBy() (whose Bernoulli draw is seed+partition-order dependent and
NOT stable under repartitioning).

At 100 TB this is the only defensible shape: any operator whose kept-set
depends on partitioning or iteration order cannot be audited after the
fact; hash-threshold sampling re-derives the decision from the row alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = float(1 << 32)


def draw_col(key) -> F.Column:
    """Uniform-[0,1) draw as a pure function of the key: first 8 md5 hex
    digits / 2^32 (exact in a double; DuckDB twin is bit-identical)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint") / F.lit(_SCALE)
    )


def mixture_sample(docs: DataFrame, rates: dict[str, float],
                   default_rate: float = 0.0, stratum_col: str = "lang",
                   key_col: str = "doc_id") -> DataFrame:
    """(key, stratum, draw, keep): keep = draw < rate(stratum), where
    unknown strata fall back to ``default_rate``.  Emits EVERY row with its
    decision (the mix-health view: one groupBy(stratum, keep).count() gives
    realized vs target rates); callers filter on `keep` for the sample.
    """
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(rate)
    d = draw_col(F.col(key_col))
    return docs.select(
        F.col(key_col),
        F.col(stratum_col).alias("stratum"),
        F.round(d, 6).alias("draw"),
        (d < rate).alias("keep"),
    )


def mixture_sample_sql(rates: dict[str, float], default_rate: float = 0.0,
                       table: str = "documents", stratum_col: str = "lang",
                       key_col: str = "doc_id") -> str:
    draw = (
        f"CAST(('0x' || substring(md5(CAST({key_col} AS VARCHAR)), 1, 8))"
        f"::UBIGINT AS DOUBLE) / {_SCALE!r}"
    )
    whens = " ".join(
        f"WHEN {stratum_col} = '{k}' THEN {float(v)!r}"
        for k, v in sorted(rates.items())
    )
    rate = f"CASE {whens} ELSE {float(default_rate)!r} END"
    return f"""
SELECT {key_col},
       {stratum_col} AS stratum,
       round({draw}, 6) AS draw,
       ({draw}) < ({rate}) AS keep
FROM {table}
"""
