"""Build dist/rdflib_r2r_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    out = REPO / "dist" / "rdflib_r2r_spark.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "rdflib_r2r_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
