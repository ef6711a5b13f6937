"""Run every W3C rdb2rdf R2RML case through the engine and report
pass/fail — used to pin the conformance list in tests/test_rdb2rdf_suite.py.

Usage: python scripts/rdb2rdf_sweep.py [case_id ...]
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rdflib_r2r_spark import rdb2rdf  # noqa: E402
from rdflib_r2r_spark.isomorphism import graph_diff  # noqa: E402
from rdflib_r2r_spark.session import get_spark  # noqa: E402


def main() -> int:
    zip_path = rdb2rdf.find_suite_zip()
    if zip_path is None:
        print("suite zip not found")
        return 1
    only = set(sys.argv[1:])
    spark = get_spark("rdb2rdf_sweep")
    cases = rdb2rdf.load_cases(zip_path)
    n_pass = n_fail = n_err = 0
    for case in cases:
        if only and case.case_id not in only:
            continue
        try:
            produced, expected = rdb2rdf.run_case(spark, case)
            both, only_a, only_b = graph_diff(produced, expected)
            if not only_a and not only_b:
                print(f"PASS {case.case_id} ({len(expected)} quads)")
                n_pass += 1
            else:
                print(f"FAIL {case.case_id}: +{len(only_a)} -{len(only_b)}")
                for t in list(only_a)[:3]:
                    print("   produced-only:", t)
                for t in list(only_b)[:3]:
                    print("   expected-only:", t)
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {case.case_id}: {type(e).__name__}: {e}")
            if only:
                traceback.print_exc()
            n_err += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_err} error")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
