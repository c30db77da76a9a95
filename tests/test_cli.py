"""End-to-end through the CLI surface: build -> query -> evaluate."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_cli_build_query_evaluate(spark, tmp_path):
    # CLI runs in-process via main() to reuse the session fixture
    from sgpt_spark.cli import main
    from sgpt_spark.sources.pages import generate_pages
    from sgpt_spark.sources.sinks import write_qrels_tsv

    pages = tmp_path / "pages.parquet"
    generate_pages(spark, 400, partitions=2).write.parquet(str(pages))

    idx = tmp_path / "idx"
    main(["build-index", "--pages", str(pages), "--out", str(idx),
          "--segment-size", "100"])
    assert (idx / "index" / "meta.json").exists()

    # queries.jsonl derived from doc 42's body
    import json

    from sgpt_spark.sources.pages import make_page

    body = make_page(42)[3].split("\n")[1]
    queries = tmp_path / "queries.jsonl"
    queries.write_text(json.dumps({"_id": "q42", "text": " ".join(body.split(" ")[:4])}) + "\n")

    run_dir = tmp_path / "run"
    main(["query", "--index", str(idx / "index"), "--queries", str(queries),
          "--out", str(run_dir), "--k", "10"])
    run = spark.read.parquet(str(run_dir))
    hits = run.collect()
    assert len(hits) > 0 and hits[0]["qid"] == "q42"

    # qrels: the source doc (its id = rank of url among all urls; easier:
    # accept any hit as relevant for the smoke-shape check)
    qrels = tmp_path / "qrels.tsv"  # directory; suffix routes the reader
    top = sorted(hits, key=lambda r: r["rank"])[0]
    qrels_df = spark.createDataFrame(
        [("q42", str(top["doc_id"]), 1)], "qid string, doc_id string, relevance int"
    )
    write_qrels_tsv(qrels_df, str(qrels))
    run2 = run.selectExpr("qid", "cast(doc_id as string) as doc_id", "score", "rank")
    run2.write.mode("overwrite").parquet(str(tmp_path / "run_str"))
    main(["evaluate", "--run", str(tmp_path / "run_str"), "--qrels",
          str(qrels), "--k", "10"])  # prints metrics; no exception = pass
