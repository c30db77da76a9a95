"""Build the --py-files archive for cluster launches (north rule:
``spark-submit --py-files sgpt_spark.zip``).

Usage:
    python tools/make_pyfiles.py [out_zip]          # default: sgpt_spark.zip

The archive contains the ``sgpt_spark`` package only — no tests, no
bench harness, no bytecode caches — so executors unpack exactly the
library the driver imports. Prints the written path.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out: str | Path = REPO / "sgpt_spark.zip") -> Path:
    out = Path(out)
    pkg = REPO / "sgpt_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else REPO / "sgpt_spark.zip"
    print(build(target))
