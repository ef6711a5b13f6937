"""W3C RDB2RDF (R2RML) conformance: the same public suite the reference's
old_tests/test_rdb2rdf.py runs, executed end-to-end through DuckDB DDL ->
Spark tables -> mapping_from_ttl -> SparkMappingCompiler, compared under
blank-node isomorphism.

The suite zip is read from the reference checkout at test time (public W3C
test data — nothing vendored); all tests skip if it is absent.
EXPECTED_PASS pins the cases this engine conforms on — a superset of the
reference's own passing set for the shared cases (docs/test-results/
rdb2rdf.md); the remainder are negative/invalid-mapping cases or exercise
datatype canonicalization this engine intentionally handles differently.
"""

from __future__ import annotations

import pytest

from rdflib_r2r_spark import rdb2rdf
from rdflib_r2r_spark.isomorphism import graph_diff

ZIP = rdb2rdf.find_suite_zip()

pytestmark = pytest.mark.skipif(ZIP is None, reason="rdb2rdf suite zip not available")

# pinned by scripts/rdb2rdf_sweep.py. A strict superset of the reference's
# passing set (docs/test-results/rdb2rdf.md): round 3 closed the canonical-
# lexical gap (xsd:double 2.0E1 form via canonical.py: TC0005a/b, 0012a/e;
# xsd:dateTime 'T' separator: 0016b/c; CHAR(n) right-padding at the source
# adapter: 0018a), and this engine additionally passes cases the reference
# fails (0007e/g class triples into named graphs, 0012b) or skips.
EXPECTED_PASS: set[str] = set(
    """R2RMLTC0001a R2RMLTC0001b R2RMLTC0002a R2RMLTC0002b R2RMLTC0002d
    R2RMLTC0002i R2RMLTC0002j R2RMLTC0003b R2RMLTC0003c R2RMLTC0004a
    R2RMLTC0005a R2RMLTC0005b R2RMLTC0006a R2RMLTC0007a R2RMLTC0007b
    R2RMLTC0007c R2RMLTC0007d R2RMLTC0007e R2RMLTC0007f R2RMLTC0007g
    R2RMLTC0008a R2RMLTC0008b R2RMLTC0008c R2RMLTC0009a R2RMLTC0009b
    R2RMLTC0009c R2RMLTC0009d R2RMLTC0010a R2RMLTC0010b R2RMLTC0010c
    R2RMLTC0011a R2RMLTC0011b R2RMLTC0012a R2RMLTC0012b R2RMLTC0012e
    R2RMLTC0013a R2RMLTC0014a R2RMLTC0014b R2RMLTC0014c R2RMLTC0014d
    R2RMLTC0015a R2RMLTC0016a R2RMLTC0016b R2RMLTC0016c R2RMLTC0016d
    R2RMLTC0016e R2RMLTC0018a R2RMLTC0019a R2RMLTC0020a""".split()
)

# invalid-mapping / invalid-SQL cases: a conforming processor must ERROR
# (W3C 'expected output: false'); this engine raises on every one
EXPECTED_ERROR: set[str] = set(
    """R2RMLTC0002c R2RMLTC0002e R2RMLTC0002g R2RMLTC0004b R2RMLTC0007h
    R2RMLTC0012c""".split()
)


def _cases(which: set[str]):
    if ZIP is None:
        return []
    return [c for c in rdb2rdf.load_cases(ZIP) if c.case_id in which]


@pytest.mark.parametrize("case", _cases(EXPECTED_PASS), ids=lambda c: c.case_id)
def test_r2rml_conformance(spark, case):
    produced, expected = rdb2rdf.run_case(spark, case)
    _both, only_produced, only_expected = graph_diff(produced, expected)
    assert not only_produced and not only_expected, (
        f"{case.case_id}: produced-only={sorted(only_produced)[:5]} "
        f"expected-only={sorted(only_expected)[:5]}"
    )


@pytest.mark.parametrize("case", _cases(EXPECTED_ERROR), ids=lambda c: c.case_id)
def test_r2rml_invalid_mappings_rejected(spark, case):
    with pytest.raises(Exception):
        rdb2rdf.run_case(spark, case)


def test_char_widths_ddl_variants():
    """The CHAR(n) width scan must key widths by the real table name even
    under IF NOT EXISTS / TEMP prefixes (ADVICE r4: the plain-token capture
    recorded 'IF'/'TEMP' and those tables lost their right-padding), must
    not leak widths across tables, and must stop a block at the next CREATE
    even when that CREATE is itself TEMP-prefixed."""
    ddl = '''
    CREATE TABLE IF NOT EXISTS "t1" ("c" CHAR(4), "v" VARCHAR(9));
    INSERT INTO "t1" VALUES ('x', 'y');
    CREATE TEMP TABLE t2 ("c" CHARACTER ( 7 ));
    CREATE GLOBAL TEMPORARY TABLE "t3" ("d" CHAR(2));
    CREATE TABLE plain ("e" char(5), "f" INTEGER);
    '''
    assert rdb2rdf.char_widths(ddl) == {
        ("t1", "c"): 4,
        ("t2", "c"): 7,
        ("t3", "d"): 2,
        ("plain", "e"): 5,
    }
