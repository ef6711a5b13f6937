"""Blank-node-label-independent triple-set equality — the W3C RDB2RDF
suites' assertion (reference: old_tests/test_rdb2rdf.py:155-184 compares
dumps with rdflib.compare.to_isomorphic + graph_diff). rdflib is not
available here, so this is a small canonical-labeling implementation:
iterative neighborhood hashing of blank nodes (the same idea as rdflib's
to_isomorphic / Hogan's iso-canonicalization), sufficient for the fixture
graphs (small, low-degree bnodes).

Triples are (subj, pred, obj[, obj_dt, obj_lang]) tuples in this engine's
lexical term encoding (terms.py): ``<iri>``, ``_:label``, literal lexical.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

Triple = tuple


def _is_bnode(t: str) -> bool:
    return isinstance(t, str) and t.startswith("_:")


def _h(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()[:24]


def canonicalize(triples: set[Triple], rounds: int | None = None) -> set[Triple]:
    """Relabel blank nodes by canonical hash of their neighborhood; returns
    the triple set with ``_:c<hash>`` labels. Hash refinement iterates until
    stable (or ``rounds``); ties after refinement are broken by hashing in
    the sorted-signature order, which is deterministic."""
    bnodes = {t for tr in triples for t in (tr[0], tr[2]) if _is_bnode(t)}
    if not bnodes:
        return set(triples)

    color: dict[str, str] = {b: "b" for b in bnodes}
    max_rounds = rounds if rounds is not None else max(4, len(bnodes))

    def nonb(term: str) -> str:
        return "~B~" if _is_bnode(term) else term

    for _ in range(max_rounds):
        new_color: dict[str, str] = {}
        for b in bnodes:
            sig: list[str] = []
            for tr in triples:
                s, p, o = tr[0], tr[1], tr[2]
                rest = "|".join(str(x) for x in tr[3:])
                if s == b:
                    oc = color.get(o, nonb(o)) if _is_bnode(o) else o
                    sig.append(f"O:{p}:{oc}:{rest}")
                if o == b:
                    sc = color.get(s, nonb(s)) if _is_bnode(s) else s
                    sig.append(f"S:{p}:{sc}:{rest}")
            new_color[b] = _h(color[b] + "::" + "||".join(sorted(sig)))
        if new_color == color:
            break
        color = new_color

    # disambiguate residual identical colors deterministically
    by_color: dict[str, list[str]] = defaultdict(list)
    for b, c in color.items():
        by_color[c].append(b)
    final: dict[str, str] = {}
    for c, bs in by_color.items():
        if len(bs) == 1:
            final[bs[0]] = c
        else:
            # identical neighborhoods => interchangeable; any deterministic
            # distinct labels preserve isomorphism class
            for i, b in enumerate(sorted(bs)):
                final[b] = _h(f"{c}:{i}")

    def relabel(term):
        return "_:c" + final[term] if _is_bnode(term) else term

    return {(relabel(tr[0]), tr[1], relabel(tr[2]), *tr[3:]) for tr in triples}


def isomorphic(a: set[Triple], b: set[Triple]) -> bool:
    return canonicalize(a) == canonicalize(b)


def graph_diff(a: set[Triple], b: set[Triple]) -> tuple[set[Triple], set[Triple], set[Triple]]:
    """(in_both, only_in_a, only_in_b) after canonicalization — mirrors
    rdflib.compare.graph_diff's contract for test reporting."""
    ca, cb = canonicalize(a), canonicalize(b)
    return ca & cb, ca - cb, cb - ca
