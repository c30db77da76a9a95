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


def test_cli_dedup_profile_sessionize(spark, tmp_path):
    from sgpt_spark.cli import main

    docs = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")],
        "doc_id long, text string",
    ).write.parquet(str(docs))

    out = tmp_path / "dedup_exact"
    main(["dedup", "--docs", str(docs), "--out", str(out), "--method", "exact"])
    m = {r["doc_id"]: r["canonical_id"] for r in spark.read.parquet(str(out)).collect()}
    assert m == {1: 1, 2: 1, 3: 3}

    prof = tmp_path / "profile"
    main(["profile", "--docs", str(docs), "--out", str(prof)])
    assert spark.read.parquet(str(prof)).count() == 3

    events = tmp_path / "events.parquet"
    from pyspark.sql import functions as F

    spark.createDataFrame(
        [(1, 1, 1000, 1.0), (2, 1, 1050, 2.0), (3, 1, 99999, 4.0)],
        "event_id long, user_id long, t long, value double",
    ).select("event_id", "user_id", F.timestamp_seconds("t").alias("ts"), "value").write.parquet(str(events))
    sess = tmp_path / "sessions"
    main(["sessionize", "--events", str(events), "--out", str(sess), "--gap-seconds", "100"])
    assert spark.read.parquet(str(sess)).count() == 2


def test_cli_build_standard_analyzer(spark, tmp_path):
    from sgpt_spark.cli import main
    from sgpt_spark.sources.pages import generate_pages

    pages = tmp_path / "pages.parquet"
    generate_pages(spark, 120, partitions=2).write.parquet(str(pages))
    idx = tmp_path / "idx_std"
    main(["build-index", "--pages", str(pages), "--out", str(idx),
          "--segment-size", "60", "--analyzer", "standard"])
    import json
    meta = json.loads((idx / "index" / "meta.json").read_text())
    assert meta["analyzer"] == "analyze_py"


def test_cli_ann(spark, tmp_path):
    from pyspark.sql import functions as F

    from sgpt_spark.cli import main

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.write.mode("overwrite").parquet(str(tmp_path / "emb"))
    (emb.filter(F.col("vec_id") % 50 == 0)
        .select(F.col("vec_id").alias("qid"), "embedding")
        .write.mode("overwrite").parquet(str(tmp_path / "q")))
    for method in ("brute", "lsh", "ivf"):
        out = str(tmp_path / f"run_{method}")
        main(["ann", "--embeddings", str(tmp_path / "emb"),
              "--queries", str(tmp_path / "q"), "--out", out,
              "--method", method, "--k", "5"])
        run = spark.read.parquet(out)
        assert run.count() > 0
        assert set(run.columns) == {"qid", "vec_id", "score", "rank"}
        # a vector's own id must top its list for the exact method
        if method == "brute":
            top1 = run.filter(F.col("rank") == 1)
            assert top1.filter(F.col("qid") != F.col("vec_id")).count() == 0


def test_cli_positional_build_phrase_query(spark, tmp_path):
    """build-index --positions -> query --phrase lifecycle: the phrase
    run must equal the exhaustive phrase path over the same pages, and
    --phrase against a match-only index must fail loudly."""
    import json

    import pytest

    from sgpt_spark.cli import main
    from sgpt_spark.operators.phrase import phrase_search
    from sgpt_spark.sources.pages import generate_pages, make_page

    pages = tmp_path / "pages.parquet"
    generate_pages(spark, 300, partitions=2).write.parquet(str(pages))
    idx = tmp_path / "pidx"
    main(["build-index", "--pages", str(pages), "--out", str(idx),
          "--segment-size", "100", "--positions"])
    meta = json.loads((idx / "index" / "meta.json").read_text())
    assert meta["positions"] is True
    assert (idx / "index" / "positions").exists()

    # interior tokens of line 2: the ws analyzer splits on ' ' only, so
    # the line-boundary tokens are glued to their neighbors ('a\nb') and
    # can never match a phrase — tokens 2..5 are contiguous in-stream
    body = make_page(7)[3].split("\n")[1]
    phrase = " ".join(body.split(" ")[1:5])
    queries = tmp_path / "queries.jsonl"
    queries.write_text(json.dumps({"_id": "q7", "text": phrase}) + "\n")
    run_dir = tmp_path / "prun"
    main(["query", "--index", str(idx / "index"), "--queries", str(queries),
          "--out", str(run_dir), "--k", "10", "--phrase"])
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in spark.read.parquet(str(run_dir)).collect()
    )
    docs = spark.read.parquet(str(idx / "docs" / "data")).select("doc_id", "text")
    qdf = spark.createDataFrame([("q7", phrase)], "qid string, query string")
    want = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in phrase_search(docs, qdf, k=10).collect()
    )
    assert got == want and len(got) > 0

    plain = tmp_path / "plainidx"
    main(["build-index", "--pages", str(pages), "--out", str(plain),
          "--segment-size", "100"])
    with pytest.raises(ValueError, match="no positional sidecar"):
        main(["query", "--index", str(plain / "index"), "--queries", str(queries),
              "--out", str(tmp_path / "x"), "--k", "10", "--phrase"])


def test_cli_query_string_and_explain(spark, tmp_path):
    """query --query-string and query --explain lifecycles: the
    query-string run equals the exhaustive simple_query_string twin
    over the same pages; explain partials sum to the ranked score;
    mode flags are mutually exclusive."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from sgpt_spark.cli import main
    from sgpt_spark.operators.querystring import simple_query_string_search
    from sgpt_spark.sources.pages import generate_pages, make_page

    pages = tmp_path / "pages.parquet"
    generate_pages(spark, 300, partitions=2).write.parquet(str(pages))
    idx = tmp_path / "qsidx"
    main(["build-index", "--pages", str(pages), "--out", str(idx),
          "--segment-size", "100", "--positions"])

    body = make_page(7)[3].split("\n")[1].split(" ")
    qs = f'+{body[1]} {body[5]} "{body[2]} {body[3]}"'
    queries = tmp_path / "queries.jsonl"
    queries.write_text(json.dumps({"_id": "q7", "text": qs}) + "\n")
    run_dir = tmp_path / "qsrun"
    main(["query", "--index", str(idx / "index"), "--queries", str(queries),
          "--out", str(run_dir), "--k", "10", "--query-string"])
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in spark.read.parquet(str(run_dir)).collect()
    )
    docs = spark.read.parquet(str(idx / "docs" / "data")).select("doc_id", "text")
    qdf = spark.createDataFrame([("q7", qs)], "qid string, query string")
    want = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in simple_query_string_search(docs, qdf, k=10).collect()
    )
    assert got == want and len(got) > 0

    exp_dir = tmp_path / "exprun"
    main(["query", "--index", str(idx / "index"), "--queries", str(queries),
          "--out", str(exp_dir), "--k", "5", "--explain"])
    exp = spark.read.parquet(str(exp_dir))
    bad = exp.groupBy("qid", "doc_id", "score").agg(
        F.round(F.sum("term_score"), 6).alias("re")
    ).filter(F.expr("abs(score - re) > 1e-9")).count()
    assert bad == 0 and exp.count() > 0

    with pytest.raises(SystemExit, match="one query mode"):
        main(["query", "--index", str(idx / "index"), "--queries", str(queries),
              "--out", str(tmp_path / "y"), "--phrase", "--explain"])


def test_cli_search_body(spark, tmp_path):
    """The `search` subcommand: one ES _search body JSON -> hits +
    aggregation parquet outputs, equal to the direct executor call."""
    import json

    from sgpt_spark.cli import main
    from sgpt_spark.operators.indexer import (
        build_postings_with_docvalues,
        write_docvalues,
        write_index,
    )

    docs = spark.createDataFrame(
        [(0, "quick brown fox", "en"), (1, "quick dog", "en"),
         (2, "lazy dog", "es"), (3, "quick quick brown", "es")],
        "doc_id long, text string, lang string",
    )
    idx = tmp_path / "idx"
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["lang"], segment_size=2
    )
    write_index(postings, meta, str(idx))
    write_docvalues(dv, str(idx))

    body = {
        "query": {"match": {"text": "quick brown"}},
        "size": 3,
        "aggs": {"langs": {"terms": {"field": "lang"}}},
    }
    bf = tmp_path / "body.json"
    bf.write_text(json.dumps(body))
    out = tmp_path / "resp"
    main(["search", "--index", str(idx), "--body", f"@{bf}",
          "--out", str(out), "--docvalues", str(idx)])
    hits = spark.read.parquet(str(out / "hits")).collect()
    assert len(hits) == 3 and all(r["score"] > 0 for r in hits)
    langs = {
        (r["value"], r["doc_count"])
        for r in spark.read.parquet(str(out / "agg_langs")).collect()
    }
    # match set: docs 0,1 (en) + 3 (es); doc 2 matches neither term
    assert langs == {("en", 2), ("es", 1)}
