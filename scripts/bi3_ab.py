"""bsbm_bi3 double-scan A/B (round-6 verdict ask #3).

bi3's two grouped arms (review count in month M / month M-1) each compile
to lineitem JOIN (date-filtered orders, broadcast) -> groupBy(l_partkey):
the SPARQL compiler emits independent sub-select arms, so lineitem is
scanned twice.  This script measures what a SINGLE-PASS formulation (one
lineitem scan, orders filtered to the two-month span, conditional counts
per month) would buy — the rewrite the engine cannot derive from the
SPARQL algebra without cross-subquery fusion:

  A  = the engine path (store.query over the SPARQL text), context
  B1 = DataFrame twin, two scans (the engine's plan shape, minus SPARQL
       compile overhead)
  B2 = DataFrame twin, ONE lineitem scan + conditional month counts

All three must return identical rows; B1 vs B2 is the controlled
comparison.  Walls are median-of-3 warm, load-annotated.  Output: one
JSON line + bi3_ab.json.
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
M_LO, M_HI = "1997-05-01", "1997-06-01"
B_LO, B_HI = "1997-04-01", "1997-05-01"


def _loadavg():
    return [float(x) for x in Path("/proc/loadavg").read_text().split()[:3]]


def _product(col):
    return F.concat(F.lit(f"<{INST}Product"), col.cast("string"), F.lit(">"))


def _ratio(m, mb):
    return (m.cast("float").cast("double") / mb).alias("ratio")


def _twin_two_scan(spark, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rdate = F.col("o_orderdate").cast("string")

    def arm(lo, hi, out):
        oo = o.filter((rdate >= lo) & (rdate < hi)).select("o_orderkey")
        return (
            li.join(oo, li["l_orderkey"] == oo["o_orderkey"])
            .groupBy("l_partkey")
            .agg(F.count(F.lit(1)).alias(out))
        )

    m = arm(M_LO, M_HI, "monthCount")
    mb = arm(B_LO, B_HI, "monthBeforeCount")
    j = m.join(mb, "l_partkey")
    return (
        j.select(
            _product(F.col("l_partkey")).alias("product"),
            _ratio(F.col("monthCount"), F.col("monthBeforeCount")),
        )
        .orderBy(F.desc("ratio"), F.asc("product"))
        .limit(10)
    )


def _twin_one_scan(spark, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rdate = F.col("o_orderdate").cast("string")
    oo = o.filter((rdate >= B_LO) & (rdate < M_HI)).select(
        "o_orderkey", (rdate >= M_LO).alias("_in_m")
    )
    g = (
        li.join(oo, li["l_orderkey"] == oo["o_orderkey"])
        .groupBy("l_partkey")
        .agg(
            F.count(F.when(F.col("_in_m"), 1)).alias("monthCount"),
            F.count(F.when(~F.col("_in_m"), 1)).alias("monthBeforeCount"),
        )
        .filter((F.col("monthCount") > 0) & (F.col("monthBeforeCount") > 0))
    )
    return (
        g.select(
            _product(F.col("l_partkey")).alias("product"),
            _ratio(F.col("monthCount"), F.col("monthBeforeCount")),
        )
        .orderBy(F.desc("ratio"), F.asc("product"))
        .limit(10)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    spark = get_spark("bi3_ab")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    store = bsbm_mod.bsbm_store(
        spark,
        {t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
         for t in bsbm_mod.BSBM_TABLES},
    )

    def engine():
        return store.query(bsbm_mod.QUERIES["bsbm_bi3"])

    variants = {
        "A_engine": engine,
        "B1_two_scan": lambda: _twin_two_scan(spark, sf_dir),
        "B2_one_scan": lambda: _twin_one_scan(spark, sf_dir),
    }

    rows = {}
    for name, fn in variants.items():
        rows[name] = sorted(
            tuple(r) for r in fn().collect()
        )
    identical = rows["A_engine"] == rows["B1_two_scan"] == rows["B2_one_scan"]

    walls = {}
    for name, fn in variants.items():
        ws = []
        for _ in range(4):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            ws.append(round(time.time() - t0, 3))
        walls[name] = {"median": round(statistics.median(ws[1:]), 3),
                       "all": ws}

    out = {
        "sf_dir": sf_dir,
        "results_identical": identical,
        "walls": walls,
        "loadavg": _loadavg(),
    }
    print(json.dumps(out))
    (REPO / "bi3_ab.json").write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
