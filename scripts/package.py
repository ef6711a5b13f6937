"""Build dist/rdflib_r2r_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    out = REPO / "dist" / "rdflib_r2r_spark.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        # .py modules plus package data (the committed tokenizer vocab —
        # operators/tokenize.py reads it relative to __file__, which the
        # zipimport path serves as long as it ships in the same zip)
        for pat in ("*.py", "*.tsv"):
            for p in sorted((REPO / "rdflib_r2r_spark").rglob(pat)):
                z.write(p, p.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
