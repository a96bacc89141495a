"""Build dist/final_ocr_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def build(out: pathlib.Path | None = None) -> pathlib.Path:
    out = out or REPO / "dist" / "final_ocr_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "final_ocr_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build())
