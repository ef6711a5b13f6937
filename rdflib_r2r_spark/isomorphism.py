"""Blank-node-label-independent triple-set equality — the W3C RDB2RDF
suites' assertion (reference: old_tests/test_rdb2rdf.py:155-184 compares
dumps with rdflib.compare.to_isomorphic + graph_diff). rdflib is not
available here, so this is a small canonical-labeling implementation:
iterative neighborhood-hash refinement plus individualization-refinement
branching for residual ties (the same scheme as rdflib's to_isomorphic /
Hogan's iso-canonicalization), sufficient for the fixture graphs (small,
low-degree bnodes).

Residual ties are resolved *canonically*: one node of the first tied color
class is individualized, refinement re-runs, and the branch yielding the
lexicographically smallest canonical triple set wins — so two isomorphic
graphs whose tied, interconnected bnodes merely sort differently still
canonicalize identically.

Triples are (subj, pred, obj[, obj_dt, obj_lang]) tuples in this engine's
lexical term encoding (terms.py): ``<iri>``, ``_:label``, literal lexical.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

Triple = tuple

# branching safety valve: graphs with more interchangeable bnodes than this
# fall back to non-branching disambiguation (fixture graphs are far smaller)
MAX_BRANCH_NODES = 64


def _is_bnode(t: str) -> bool:
    return isinstance(t, str) and t.startswith("_:")


def _h(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()[:24]


def _refine(triples: set[Triple], bnodes: set[str], color: dict[str, str]) -> dict[str, str]:
    """Iterate neighborhood hashing to a fixpoint."""
    for _ in range(max(4, len(bnodes))):
        new_color: dict[str, str] = {}
        for b in bnodes:
            sig: list[str] = []
            for tr in triples:
                s, p, o = tr[0], tr[1], tr[2]
                rest = "|".join(str(x) for x in tr[3:])
                if s == b:
                    oc = color[o] if _is_bnode(o) else o
                    sig.append(f"O:{p}:{oc}:{rest}")
                if o == b:
                    sc = color[s] if _is_bnode(s) else s
                    sig.append(f"S:{p}:{sc}:{rest}")
            new_color[b] = _h(color[b] + "::" + "||".join(sorted(sig)))
        if new_color == color:
            break
        color = new_color
    return color


def _tied_class(color: dict[str, str]) -> list[str] | None:
    """Smallest-color class with >1 member, or None if discrete."""
    by_color: dict[str, list[str]] = defaultdict(list)
    for b, c in color.items():
        by_color[c].append(b)
    tied = [(c, bs) for c, bs in by_color.items() if len(bs) > 1]
    if not tied:
        return None
    return sorted(min(tied, key=lambda cb: cb[0])[1])


def _relabel(triples: set[Triple], color: dict[str, str]) -> frozenset:
    def rl(term):
        return "_:c" + color[term] if _is_bnode(term) else term

    return frozenset((rl(tr[0]), tr[1], rl(tr[2]), *tr[3:]) for tr in triples)


def _canon(triples: set[Triple], bnodes: set[str], color: dict[str, str]) -> frozenset:
    """Individualization-refinement: refine; if tied classes remain, branch
    on individualizing each member of the first tied class and keep the
    lexicographically smallest outcome."""
    color = _refine(triples, bnodes, color)
    tied = _tied_class(color)
    if tied is None:
        return _relabel(triples, color)
    best: frozenset | None = None
    best_key = None
    for b in tied:
        c2 = dict(color)
        c2[b] = _h(color[b] + ":indiv")
        cand = _canon(triples, bnodes, c2)
        key = tuple(sorted(cand))
        if best_key is None or key < best_key:
            best, best_key = cand, key
    assert best is not None
    return best


def canonicalize(triples: set[Triple], rounds: int | None = None) -> set[Triple]:
    """Relabel blank nodes by canonical neighborhood hash; returns the triple
    set with ``_:c<hash>`` labels, identical for isomorphic inputs."""
    bnodes = {t for tr in triples for t in (tr[0], tr[2]) if _is_bnode(t)}
    if not bnodes:
        return set(triples)
    color: dict[str, str] = {b: "b" for b in bnodes}
    if len(bnodes) > MAX_BRANCH_NODES:
        # too large to branch: refine then disambiguate by sorted order
        # (non-canonical for adversarial tie structures; fine for dumps whose
        # bnodes are row-skolemized and rarely interconnected)
        color = _refine(triples, bnodes, color)
        by_color: dict[str, list[str]] = defaultdict(list)
        for b, c in color.items():
            by_color[c].append(b)
        final: dict[str, str] = {}
        for c, bs in by_color.items():
            for i, b in enumerate(sorted(bs)):
                final[b] = c if len(bs) == 1 else _h(f"{c}:{i}")
        return set(_relabel(triples, final))
    return set(_canon(triples, bnodes, color))


def isomorphic(a: set[Triple], b: set[Triple]) -> bool:
    return canonicalize(a) == canonicalize(b)


def graph_diff(a: set[Triple], b: set[Triple]) -> tuple[set[Triple], set[Triple], set[Triple]]:
    """(in_both, only_in_a, only_in_b) after canonicalization — mirrors
    rdflib.compare.graph_diff's contract for test reporting."""
    ca, cb = canonicalize(a), canonicalize(b)
    return ca & cb, ca - cb, cb - ca
