"""Resumability: stages skip when done, re-run when params change,
metrics record per-segment lineage (north rule)."""

from __future__ import annotations

import json
from pathlib import Path

from sgpt_spark.plans.pipeline import build_index_pipeline, stage_done
from sgpt_spark.sources.pages import generate_pages


def test_pipeline_builds_and_resumes(spark, tmp_path):
    out = str(tmp_path / "idx")
    pages_pq = str(tmp_path / "pages.parquet")
    generate_pages(spark, 500, partitions=4).write.parquet(pages_pq)

    postings, meta = build_index_pipeline(spark, pages_pq, out, segment_size=100)
    assert meta.n_docs == 499  # one empty doc (i=17) filtered
    assert postings.count() > 0

    # all three manifests written
    for stage in ["docs", "index", "metrics"]:
        assert (Path(out) / stage / "_MANIFEST.json").exists()

    # metrics record postings + bytes per segment
    m = json.loads((Path(out) / "metrics" / "_MANIFEST.json").read_text())
    assert m["postings"] > 0 and m["encoded_bytes"] > 0 and m["segments"] >= 5

    # resume: mtimes unchanged => stages skipped
    mtimes = {
        s: (Path(out) / s / "_MANIFEST.json").stat().st_mtime
        for s in ["docs", "index", "metrics"]
    }
    postings2, meta2 = build_index_pipeline(spark, pages_pq, out, segment_size=100)
    assert meta2 == meta
    for s, t in mtimes.items():
        assert (Path(out) / s / "_MANIFEST.json").stat().st_mtime == t, s

    # param change => postings stage (and metrics) re-run, docs stage kept
    build_index_pipeline(spark, pages_pq, out, segment_size=50)
    assert (Path(out) / "docs" / "_MANIFEST.json").stat().st_mtime == mtimes["docs"]
    assert (Path(out) / "index" / "_MANIFEST.json").stat().st_mtime > mtimes["index"]


def test_partial_failure_resume(spark, tmp_path):
    """Simulate a crash after stage 1: only later stages run on resume."""
    out = str(tmp_path / "idx2")
    pages_pq = str(tmp_path / "pages2.parquet")
    generate_pages(spark, 300, partitions=2).write.parquet(pages_pq)
    build_index_pipeline(spark, pages_pq, out, segment_size=100)

    # wipe stage 2+3 (simulated mid-run kill)
    import shutil

    shutil.rmtree(Path(out) / "index")
    shutil.rmtree(Path(out) / "metrics")
    docs_mtime = (Path(out) / "docs" / "_MANIFEST.json").stat().st_mtime

    postings, meta = build_index_pipeline(spark, pages_pq, out, segment_size=100)
    assert postings.count() > 0
    assert (Path(out) / "docs" / "_MANIFEST.json").stat().st_mtime == docs_mtime
    assert stage_done(str(Path(out) / "index"), {"segment_size": 100, "analyzer": "tokenize_py_ws", "codec": "varint", "positions": False})
