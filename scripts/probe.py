"""PINNED host-ceiling probe — definition frozen; do not retune per round.

Measures THIS HOST's attainable parallel speedup for the pipeline's dominant
work shape (string split/lower + per-token crc32 + numeric array transforms:
exactly the signature stage's mix) with every confound removed: no disk, no
Python, no shuffle, no UDFs — one wide whole-stage-codegen projection and a
single numeric aggregate.  The pipeline's raw scaling efficiency is judged
AGAINST this ceiling (normalized = raw_eff / probe_eff); because the probe
is a fixed artifact (PROBE_VERSION below), the normalization is falsifiable
round over round.

Usage: python scripts/probe.py [n_docs]   (env SPARK_GRAFT_CPUS sets cores)
Prints one JSON line: {"probe": PROBE_VERSION, "cpus": N, "wall": s, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# v1 = the round-2 "string/array churn + crc32" probe, now frozen as code.
PROBE_VERSION = "string-churn-crc32-v1"
DEFAULT_DOCS = 4_000_000


def probe_wall(spark, n_docs: int = DEFAULT_DOCS) -> float:
    """One timed pass; returns wall seconds."""
    from pyspark.sql import functions as F

    # synthesize a ~12-token pseudo-text per row from the id (pure JVM),
    # then do the signature stage's work shape on it
    df = spark.range(n_docs)
    words = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{j}x"), ((F.col("id") * (j * 2 + 1)) % 9973).cast("string"))
            for j in range(12)
        ],
    )
    toks = F.filter(F.split(F.lower(words), "[^a-z0-9]+"), lambda t: t != "")
    th = F.transform(toks, lambda t: F.crc32(F.encode(t, "UTF-8")).cast("bigint") % ((1 << 31) - 1))
    mins = [
        F.array_min(F.transform(th, lambda h, a=a: (F.lit(2 * a + 1) * h + F.lit(a)) % ((1 << 31) - 1)))
        for a in range(8)
    ]
    t0 = time.time()
    # sum of minima: forces full evaluation, single scalar result, no shuffle
    # beyond the final 1-row partial-agg exchange
    df.select(sum(mins).alias("m")).agg(F.sum("m")).collect()
    return time.time() - t0


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_DOCS
    from rdflib_r2r_spark.session import get_spark

    spark = get_spark("probe")
    walls = [probe_wall(spark, n_docs) for _ in range(2)]  # best-of-2, warm
    print(
        json.dumps(
            {
                "probe": PROBE_VERSION,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "n_docs": n_docs,
                "wall": round(min(walls), 3),
                "walls": [round(w, 3) for w in walls],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
