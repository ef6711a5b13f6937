"""bsbm_bi4 double-scan A/B (round-5 verdict ask #8).

bi4's two grouped arms (with-feature / without-feature average price) both
scan part+lineitem: the SPARQL compiler emits independent dump arms, so
Type11 offers and Type11 features are each computed twice.  This script
measures whether a SHARED PERSISTED intermediate (offers + features
materialized once, both arms read the cache) actually buys wall time:

  A  = the engine path (store.query over the SPARQL text), context
  B1 = DataFrame twin, two scans (no persist)  — isolates the variable
  B2 = DataFrame twin, persisted shared intermediates

All three must return identical rows; B1 vs B2 is the controlled
comparison.  Walls are median-of-3 warm, load-annotated (this host is
shared — see BENCH.md).  Output: one JSON line + bi4_ab.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rdflib_r2r_spark import bsbm as bsbm_mod  # noqa: E402
from rdflib_r2r_spark.session import get_spark  # noqa: E402

INST = bsbm_mod.INST


def _loadavg():
    return [float(x) for x in Path("/proc/loadavg").read_text().split()[:3]]


def _twin(spark, sf_dir: str, persist: bool) -> DataFrame:
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    feat1 = part.select(
        "p_partkey",
        F.concat(F.lit("ProductFeature"), F.col("p_size").cast("string")).alias("feat"),
    )
    feat2 = part.select(
        "p_partkey",
        F.concat(
            F.lit("ProductFeature"),
            (F.substring("p_brand", 7, 10).cast("int") + 100).cast("string"),
        ).alias("feat"),
    )
    f = feat1.unionAll(feat2)
    t11 = part.filter(F.col("p_size") == 11).select("p_partkey")
    offers = (
        t11.join(li, t11["p_partkey"] == li["l_partkey"])
        .select(t11["p_partkey"], F.col("l_extendedprice").alias("price"))
    )
    t11f = f.join(t11, "p_partkey").select("feat").distinct()
    if persist:
        offers = offers.persist()
        f = f.persist()
        t11f = t11f.persist()

    def avg_price(df):
        return (
            F.sum(F.col("price").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        )

    wf = (
        offers.join(f, "p_partkey")
        .join(t11f, "feat", "semi")
        .groupBy("feat")
        .agg(avg_price(None).alias("withFeaturePrice"))
    )
    wof = (
        offers.crossJoin(t11f)
        .join(f, ["p_partkey", "feat"], "anti")
        .groupBy("feat")
        .agg(avg_price(None).alias("withoutFeaturePrice"))
    )
    out = (
        wf.join(wof, "feat")
        .select(
            F.concat(F.lit(f"<{INST}"), "feat", F.lit(">")).alias("feature"),
            (F.col("withFeaturePrice") / F.col("withoutFeaturePrice")).alias("priceRatio"),
        )
        .orderBy(F.desc("priceRatio"), "feature")
        .limit(10)
    )
    if persist:
        return out, [offers, f, t11f]
    return out, []


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bi4_ab")
    load0 = _loadavg()

    tables = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
              for t in bsbm_mod.BSBM_TABLES}
    store = bsbm_mod.bsbm_store(spark, tables)

    def rows_of(df):
        return [(r[0], round(r[1], 6)) for r in df.collect()]

    def timed(fn, n=3):
        fn()  # warm
        walls = []
        for _ in range(n):
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
        return round(statistics.median(walls), 3), [round(w, 3) for w in walls]

    # A: engine path
    a_rows = rows_of(store.query(bsbm_mod.QUERIES["bsbm_bi4"]))
    a_med, a_walls = timed(lambda: store.query(bsbm_mod.QUERIES["bsbm_bi4"]).collect())

    # B1: twin, no persist
    b1_df, _ = _twin(spark, sf_dir, persist=False)
    b1_rows = rows_of(b1_df)
    b1_med, b1_walls = timed(lambda: _twin(spark, sf_dir, persist=False)[0].collect())

    # B2: twin, persisted shared intermediates (persist+unpersist inside
    # the timed region: materialization cost is part of the real wall)
    def run_b2():
        df, cached = _twin(spark, sf_dir, persist=True)
        try:
            return df.collect()
        finally:
            for c in cached:
                c.unpersist()

    b2_rows = [(r[0], round(r[1], 6)) for r in run_b2()]
    b2_med, b2_walls = timed(run_b2)

    assert a_rows == b1_rows == b2_rows, (
        "result mismatch", a_rows[:3], b1_rows[:3], b2_rows[:3])

    out = {
        "sf_dir": sf_dir,
        "rows": len(a_rows),
        "results_identical": True,
        "engine_store_query": {"median": a_med, "walls": a_walls},
        "twin_two_scans": {"median": b1_med, "walls": b1_walls},
        "twin_persisted_shared": {"median": b2_med, "walls": b2_walls},
        "persist_speedup": round(b1_med / b2_med, 3) if b2_med else None,
        "host_loadavg_start": load0,
        "host_loadavg_end": _loadavg(),
    }
    (REPO / "bi4_ab.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
