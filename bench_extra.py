#!/usr/bin/env python
"""Round-7 optimization harness (guide §1.4): isolate one or more declared
queries with the noop sink, print per-query walls, and optionally dump
`.explain("formatted")` to a file.  bench.py itself is FROZEN for driver
measurement — all round-7 isolation numbers cited in OPTIMIZATION_r07.md
come from this file.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain-dir DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from rdflib_r2r_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("bench_extra")
    import __spark_entry__ as E

    qs = E.queries()
    # warm up parquet footer / codegen paths like bench.py does
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    spark.read.parquet(f"{args.sf}/documents.parquet").count()

    for name in args.queries:
        fn = qs[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        walls = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={min(walls)} walls={walls}", flush=True)


if __name__ == "__main__":
    main()
