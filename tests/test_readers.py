"""Round trips through the BEIR-format readers/sinks."""

from __future__ import annotations

import json

import pytest

from sgpt_spark.sources.readers import (
    read_beir_corpus,
    read_beir_qrels,
    read_beir_queries,
    read_jsonl_fields,
    read_results_json,
)
from sgpt_spark.sources.sinks import write_qrels_tsv, write_results_json


def test_corpus_queries_jsonl(spark, tmp_path):
    corpus = tmp_path / "corpus.jsonl"
    corpus.write_text(
        '{"_id": "d1", "title": "T", "text": "hello world"}\n'
        '{"_id": "d2", "text": "no title here"}\n'
    )
    df = read_beir_corpus(spark, str(corpus))
    rows = {r["doc_id"]: (r["title"], r["text"]) for r in df.collect()}
    assert rows == {"d1": ("T", "hello world"), "d2": ("", "no title here")}

    queries = tmp_path / "queries.jsonl"
    queries.write_text('{"_id": "q1", "text": "find me"}\n')
    q = read_beir_queries(spark, str(queries)).collect()
    assert (q[0]["qid"], q[0]["query"]) == ("q1", "find me")


def test_qrels_tsv_roundtrip(spark, tmp_path):
    qrels = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 0), ("q2", "d3", 2)],
        "qid string, doc_id string, relevance int",
    )
    out = tmp_path / "qrels_out"
    write_qrels_tsv(qrels, str(out))
    back = read_beir_qrels(spark, str(out))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, qrels.collect()))


def test_results_json_roundtrip(spark, tmp_path):
    results = spark.createDataFrame(
        [("q1", "d1", 2.5, 1), ("q1", "d2", 1.5, 2), ("q2", "d9", 0.5, 1)],
        "qid string, doc_id string, score double, rank int",
    )
    path = tmp_path / "run.json"
    write_results_json(results, str(path))
    data = json.loads(path.read_text())
    assert data == {"q1": {"d1": 2.5, "d2": 1.5}, "q2": {"d9": 0.5}}
    back = read_results_json(spark, str(path))
    got = sorted(map(tuple, back.collect()))
    assert got == sorted(map(tuple, results.collect()))


def test_jsonl_field_extraction(spark, tmp_path):
    """Distributed line-wise JSON scan (the 19 GB BioASQ pattern)."""
    raw = tmp_path / "big.jsonl"
    raw.write_text(
        '{"pmid": "p1", "abstractText": "alpha beta", "title": "A"}\n'
        "garbage line that is not json\n"
        '{"pmid": "p2", "abstractText": "gamma", "title": "B"}\n'
    )
    df = read_jsonl_fields(
        spark,
        str(raw),
        {"doc_id": "$.pmid", "text": "$.abstractText", "title": "$.title"},
    )
    rows = {r["doc_id"]: r["text"] for r in df.collect()}
    assert rows == {"p1": "alpha beta", "p2": "gamma"}
