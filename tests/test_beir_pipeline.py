"""End-to-end BEIR lifecycle (reference entry point A): JSONL/TSV in ->
index -> deep retrieval -> (rerank) -> run parquet -> multi-k metrics.
The run must be rank-identical to the exhaustive DataFrame path over the
same title+text projection and analyzer."""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_standard
from sgpt_spark.operators.corpus import doc_fulltext
from sgpt_spark.operators.search import bm25_search
from sgpt_spark.plans.beir import run_beir_bm25
from sgpt_spark.sources.pages import _VOCAB, _doc_terms


@pytest.fixture(scope="module")
def beir_dir(spark):
    base = Path(tempfile.mkdtemp(prefix="sgpt_beir_"))
    corpus = base / "corpus.jsonl"
    queries = base / "queries.jsonl"
    qrels = base / "qrels.tsv"
    with corpus.open("w") as fp:
        for i in range(40):
            body = " ".join(_VOCAB[_doc_terms(i)][:60])
            fp.write(json.dumps({"_id": f"d{i}", "title": f"Title {i}!", "text": body}) + "\n")
    with queries.open("w") as fp, qrels.open("w") as qf:
        qf.write("query-id\tcorpus-id\tscore\n")
        for i in range(0, 40, 8):
            body = " ".join(_VOCAB[_doc_terms(i)][:60])
            q = " ".join(body.split(" ")[:5])
            fp.write(json.dumps({"_id": f"q{i}", "text": q.upper() + "."}) + "\n")
            qf.write(f"q{i}\td{i}\t1\n")
    return base


def test_beir_pipeline_end_to_end(spark, beir_dir):
    out = Path(tempfile.mkdtemp(prefix="sgpt_beir_out_"))
    metrics = run_beir_bm25(
        spark,
        str(beir_dir / "corpus.jsonl"),
        str(beir_dir / "queries.jsonl"),
        str(beir_dir / "qrels.tsv"),
        str(out),
        k_values=(1, 3, 10),
    ).collect()
    m = {r["k"]: r for r in metrics}
    assert set(m) == {1, 3, 10}
    # known-item queries, uppercased+punctuated -> only the standard
    # analyzer retrieves them; source doc should top every list
    assert m[1]["ndcg"] == 1.0 and m[1]["precision"] == 1.0
    assert m[10]["recall"] == 1.0
    assert (out / "run").exists() and (out / "index" / "meta.json").exists()

    # rank-identity vs the exhaustive path over the same projection
    run = spark.read.parquet(str(out / "run"))
    corpus = spark.read.json(str(beir_dir / "corpus.jsonl")).select(
        F.col("_id").alias("doc_id"),
        doc_fulltext(F.col("title"), F.col("text")).alias("text"),
    )
    queries = spark.read.json(str(beir_dir / "queries.jsonl")).select(
        F.col("_id").alias("qid"), F.col("text").alias("query")
    )
    want = sorted(
        tuple(r) for r in bm25_search(corpus, queries, k=10, tokenizer=tokenize_standard).collect()
    )
    got = sorted(tuple(r) for r in run.filter(F.col("rank") <= 10).collect())
    assert got == want


def test_beir_pipeline_rerank_and_self_exclusion(spark, beir_dir):
    out = Path(tempfile.mkdtemp(prefix="sgpt_beir_out2_"))
    metrics = run_beir_bm25(
        spark,
        str(beir_dir / "corpus.jsonl"),
        str(beir_dir / "queries.jsonl"),
        str(beir_dir / "qrels.tsv"),
        str(out),
        k_values=(1, 10),
        rerank_top_k=3,
    ).collect()
    assert {r["k"] for r in metrics} == {1, 10}
    run = spark.read.parquet(str(out / "run"))
    # tail below the reranked head keeps consecutive ranks
    per_q = run.groupBy("qid").agg(F.max("rank").alias("mx"), F.count("*").alias("n")).collect()
    assert all(r["mx"] == r["n"] for r in per_q)

    # exclude_self with colliding ids: rename queries to doc ids
    queries2 = Path(tempfile.mkdtemp(prefix="sgpt_beir_q2_")) / "queries.jsonl"
    lines = [json.loads(l) for l in (beir_dir / "queries.jsonl").read_text().splitlines()]
    with queries2.open("w") as fp:
        for rec in lines:
            rec["_id"] = "d" + rec["_id"][1:]  # q8 -> d8 (collides)
            fp.write(json.dumps(rec) + "\n")
    out2 = Path(tempfile.mkdtemp(prefix="sgpt_beir_out3_"))
    run_beir_bm25(
        spark,
        str(beir_dir / "corpus.jsonl"),
        str(queries2),
        str(beir_dir / "qrels.tsv"),
        str(out2),
        k_values=(1, 10),
        exclude_self=True,
    ).collect()
    run2 = spark.read.parquet(str(out2 / "run"))
    assert run2.count() > 0
    assert run2.filter(F.col("doc_id") == F.col("qid")).count() == 0


def test_cli_beir(spark, beir_dir):
    from sgpt_spark.cli import main

    out = Path(tempfile.mkdtemp(prefix="sgpt_beir_cli_"))
    main([
        "beir", "--corpus", str(beir_dir / "corpus.jsonl"),
        "--queries", str(beir_dir / "queries.jsonl"),
        "--qrels", str(beir_dir / "qrels.tsv"),
        "--out", str(out), "--k-values", "1,10",
    ])
    assert (out / "run").exists()


def test_beir_pipeline_multifield(spark, beir_dir):
    """fields="multi": the persisted run must be value-identical to the
    exhaustive multi-field plan (standard analyzer, tie_breaker=0.5) over
    the raw (title, text) corpus, and known-item metrics must stay
    perfect — the titles here are noise ("Title i!"), so the text field
    dominates via best_fields."""
    from sgpt_spark.operators.search import bm25_multifield_search

    out = Path(tempfile.mkdtemp(prefix="sgpt_beir_mf_"))
    metrics = run_beir_bm25(
        spark,
        str(beir_dir / "corpus.jsonl"),
        str(beir_dir / "queries.jsonl"),
        str(beir_dir / "qrels.tsv"),
        str(out),
        k_values=(1, 10),
        fields="multi",
    ).collect()
    m = {r["k"]: r for r in metrics}
    assert m[1]["ndcg"] == 1.0
    assert m[10]["recall"] == 1.0

    run = spark.read.parquet(str(out / "run"))
    corpus = spark.read.json(str(beir_dir / "corpus.jsonl")).select(
        F.col("_id").alias("doc_id"),
        F.coalesce("title", F.lit("")).alias("title"),
        F.coalesce("text", F.lit("")).alias("text"),
    )
    queries = spark.read.json(str(beir_dir / "queries.jsonl")).select(
        F.col("_id").alias("qid"), F.col("text").alias("query")
    )
    want = sorted(
        tuple(r)
        for r in bm25_multifield_search(
            corpus, queries, k=10, tokenizer=tokenize_standard
        ).collect()
    )
    got = sorted(tuple(r) for r in run.filter(F.col("rank") <= 10).collect())
    assert got == want
    # a doc whose TITLE matches must be retrievable: title tokens only
    # exist in the title field ("title" itself appears in every title)
    tq = spark.createDataFrame([("tq1", "title")], "qid string, query string")
    hits = bm25_multifield_search(corpus, tq, k=5, tokenizer=tokenize_standard)
    assert hits.count() == 5


def test_beir_kill_resume_between_index_and_search(spark, beir_dir, monkeypatch):
    """North-rule resumability, end to end: kill the lifecycle between
    index build and retrieval; the resumed run must (a) NOT rebuild the
    index (manifest checkpoint) and (b) produce metrics identical to an
    uninterrupted run."""
    import sgpt_spark.plans.beir as beir_mod

    args = (
        str(beir_dir / "corpus.jsonl"),
        str(beir_dir / "queries.jsonl"),
        str(beir_dir / "qrels.tsv"),
    )
    # uninterrupted baseline
    out_a = Path(tempfile.mkdtemp(prefix="sgpt_beir_base_"))
    baseline = sorted(
        tuple(r) for r in run_beir_bm25(spark, *args, str(out_a), k_values=(1, 10)).collect()
    )

    # killed run: die exactly between the two stages
    out_b = Path(tempfile.mkdtemp(prefix="sgpt_beir_kill_"))
    real_search = beir_mod.search_index

    def killed(*a, **kw):
        raise RuntimeError("killed between index build and search")

    monkeypatch.setattr(beir_mod, "search_index", killed)
    with pytest.raises(RuntimeError, match="killed"):
        run_beir_bm25(spark, *args, str(out_b), k_values=(1, 10))
    assert (out_b / "index" / "_MANIFEST.json").exists()  # stage 1 committed
    assert not (out_b / "run" / "_MANIFEST.json").exists()  # stage 2 did not

    # resume: search works again, but any index rebuild is a failure
    monkeypatch.setattr(beir_mod, "search_index", real_search)

    def no_rebuild(*a, **kw):
        raise AssertionError("resume must not rebuild the index")

    monkeypatch.setattr(beir_mod, "build_index", no_rebuild)
    resumed = sorted(
        tuple(r) for r in run_beir_bm25(spark, *args, str(out_b), k_values=(1, 10)).collect()
    )
    assert resumed == baseline

    # param change invalidates the checkpoint instead of silently reusing
    monkeypatch.setattr(beir_mod, "build_index", no_rebuild)
    with pytest.raises(AssertionError, match="rebuild"):
        run_beir_bm25(spark, *args, str(out_b), k_values=(1, 10), analyzer="whitespace")


def test_beir_multifield_engines_agree(spark, beir_dir):
    """fields="multi": the index engine (co-segmented per-field indexes,
    the scale path and the default) must produce the same persisted run
    and metrics as the exhaustive DataFrame engine."""
    out_i = Path(tempfile.mkdtemp(prefix="sgpt_beir_mfi_"))
    out_e = Path(tempfile.mkdtemp(prefix="sgpt_beir_mfe_"))
    args = (
        str(beir_dir / "corpus.jsonl"),
        str(beir_dir / "queries.jsonl"),
        str(beir_dir / "qrels.tsv"),
    )
    mi = sorted(tuple(r) for r in run_beir_bm25(
        spark, *args, str(out_i), k_values=(1, 10), fields="multi", engine="index"
    ).collect())
    me = sorted(tuple(r) for r in run_beir_bm25(
        spark, *args, str(out_e), k_values=(1, 10), fields="multi", engine="exhaustive"
    ).collect())
    assert mi == me
    run_i = sorted(tuple(r) for r in spark.read.parquet(str(out_i / "run")).collect())
    run_e = sorted(tuple(r) for r in spark.read.parquet(str(out_e / "run")).collect())
    assert run_i == run_e and run_i
