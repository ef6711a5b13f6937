"""Sweep a file of SPARQL queries through the engine: conversion status,
plan, wall time, row count, first row, timeout handling — the Spark twin of
the reference's analyze_failures workflow (reference:
rdflib_r2r/analyze_failures.py).

Usage:
  python scripts/analyze_queries.py QUERIES.rq [--sf DIR] [--timeout S] [--json OUT]

QUERIES.rq holds one query per block, blocks separated by lines of '---'.
Queries run through the geo nation/region demo store over the sf tables
(the same store the sparql_* driver queries use).
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import asdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries_file")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--timeout", type=float, default=300.0)
    ap.add_argument("--fetch-cap", type=int, default=5000)
    ap.add_argument("--json", default=None, help="write per-query JSON here")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from rdflib_r2r_spark.analyze import analyze, overview
    from rdflib_r2r_spark.session import get_spark

    text = Path(args.queries_file).read_text()
    sparqls = [b.strip() for b in text.split("---")]

    spark = get_spark("analyze_queries")
    store = entry._geo_store(spark, args.sf)
    reports = analyze(store, sparqls, timeout_s=args.timeout,
                      fetch_cap=args.fetch_cap)
    for r in reports:
        print(f"[{r.index}] {r.status}"
              + (f" {r.seconds}s rows={r.rows} first={r.first_row}"
                 if r.seconds is not None else "")
              + (f" ERR={r.exec_error}" if r.exec_error else "")
              + (f" ({r.message})" if r.message else ""))
    print()
    print(overview(reports))
    if args.json:
        Path(args.json).write_text(
            json.dumps([asdict(r) for r in reports], indent=1, default=str)
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
