"""Driver-window rotation invariants (round-5 verdict ask #2): the
correctness gate hashes only the first 50 queries() entries, so coverage
accumulates across rounds by rotating the window — r5 ∪ r6 must equal the
full registry, with the two never-driver-checked queries first."""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _registry_names() -> list[str]:
    import __spark_entry__ as entry

    return list(entry.queries().keys())


def test_window_is_exactly_the_gate_size():
    import __spark_entry__ as entry

    assert len(entry.DRIVER_WINDOW) == 50
    assert len(set(entry.DRIVER_WINDOW)) == 50
    names = _registry_names()
    # the window IS the head of queries() insertion order
    assert names[:50] == entry.DRIVER_WINDOW


def test_union_r5_r6_r7_covers_all_registered():
    # green(CORRECTNESS_r05) ∪ green(CORRECTNESS_r06) ∪ DRIVER_WINDOW
    # (= the prospective r7 checked set) must cover every registered
    # query; anything left out must be pinned, exactly and exhaustively,
    # in NEXT_WINDOW_HEAD for the next rotation (round 7 rotated the last
    # three in, so the pin list is empty)
    import __spark_entry__ as entry

    def green(path: str) -> set[str]:
        d = json.loads((REPO / path).read_text())
        return {k for k, v in d.items()
                if v.get("rows_match") and v.get("schema_match")
                and v.get("hash_match") is not False}

    names = set(_registry_names())
    union = (green("CORRECTNESS_r05.json") | green("CORRECTNESS_r06.json")
             | set(entry.DRIVER_WINDOW))
    missing = names - union
    assert missing == set(entry.NEXT_WINDOW_HEAD), (
        f"never-driver-checked queries not pinned for the next rotation: "
        f"{missing ^ set(entry.NEXT_WINDOW_HEAD)}"
    )


def test_next_window_head_is_oracle_paired_and_registered():
    import __spark_entry__ as entry

    names = _registry_names()
    o = entry.oracle_sql()
    for n in entry.NEXT_WINDOW_HEAD:
        assert n in names and n in o, n
        assert n not in entry.DRIVER_WINDOW, n


def test_never_checked_queries_lead_the_window():
    # round 7: the three queries no driver round had ever checked lead,
    # then kg_mentions (implementation switched this round — the driver
    # row re-verifies the fast path's pair-set equivalence)
    import __spark_entry__ as entry

    assert entry.DRIVER_WINDOW[:4] == [
        "q_tfidf_keywords", "q_corpus_stats", "q_snapshot_diff",
        "kg_mentions",
    ]


def test_every_query_has_an_oracle_twin():
    import __spark_entry__ as entry

    q = set(_registry_names())
    o = set(entry.oracle_sql().keys())
    assert o <= q, f"oracles without queries: {o - q}"
    missing = q - o
    # genuinely non-SQL-expressible ops may omit the oracle; today none do
    assert not missing, f"queries without oracle twins: {missing}"
