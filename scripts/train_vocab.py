"""Train the committed subword vocab (BPE merges, WordPiece-style
boundary-aware symbols) for rdflib_r2r_spark.operators.tokenize.

Deterministic: word frequencies come from the sf0.001 documents fixture,
merge selection breaks ties lexicographically, ids are assigned in
(base-alphabet, merge-order) sequence.  Re-running this script reproduces
rdflib_r2r_spark/data/bpe_vocab.tsv byte-for-byte.

The vocab has two flavors per piece — word-initial and continuation
(WordPiece's `##` distinction) — stored as a cont flag, so greedy
longest-match inference (operators/tokenize.py and its DuckDB oracle twin)
never has to guess word boundaries.

Usage: python scripts/train_vocab.py [n_merges] [fixture_parquet]
"""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
OUT = REPO / "rdflib_r2r_spark" / "data" / "bpe_vocab.tsv"

# must equal tokenize.PRETOKEN_RE (kept literal here so training has no
# package import — the package asserts the vocab matches at load time)
PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

UNK_ID = 0
UNK_PIECE = "<unk>"


def word_freqs(parquet: str) -> collections.Counter:
    import pyarrow.parquet as pq

    texts = pq.read_table(parquet, columns=["text"]).column("text").to_pylist()
    c: collections.Counter = collections.Counter()
    pat = re.compile(PRETOKEN_RE)
    for t in texts:
        c.update(pat.findall(t or ""))
    return c


def train(freqs: collections.Counter, n_merges: int):
    # symbols: word-initial pieces are bare, continuations carry a '##'
    # sentinel prefix (internal only — the tsv stores a cont flag instead)
    words = {
        w: [w[0]] + ["##" + ch for ch in w[1:]] for w in sorted(freqs)
    }
    vocab: list[tuple[str, bool]] = []  # (piece, cont) in id order
    # base alphabet: every printable non-space ASCII char, both flavors,
    # so any ASCII word tokenizes without <unk>
    for code in range(33, 127):
        vocab.append((chr(code), False))
        vocab.append((chr(code), True))
    have = set(vocab)

    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # deterministic: max count, ties broken by lexicographically
        # smallest (a, b) pair
        top = max(pairs.values())
        if top < 2:
            break
        a, b = min(p for p, c in pairs.items() if c == top)
        merged = a + b[2:]  # right side always loses its '##'
        # merged keeps a's flavor: bare a -> initial piece, '##a' -> cont
        piece = (merged[2:], True) if merged.startswith("##") else (merged, False)
        if piece not in have:
            vocab.append(piece)
            have.add(piece)
        for w, syms in words.items():
            i = 0
            out = []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return vocab


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    parquet = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001/documents.parquet"
    freqs = word_freqs(parquet)
    vocab = train(freqs, n_merges)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    lines = [f"{UNK_ID}\t0\t{UNK_PIECE}"]
    for i, (piece, cont) in enumerate(vocab, start=1):
        lines.append(f"{i}\t{int(cont)}\t{piece}")
    OUT.write_text("\n".join(lines) + "\n")
    print(f"wrote {OUT}: {len(lines)} entries "
          f"({sum(1 for _, c in vocab if not c)} initial, "
          f"{sum(1 for _, c in vocab if c)} continuation)")


if __name__ == "__main__":
    main()
