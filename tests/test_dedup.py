"""Dedup operators: planted exact/near duplicates must be found; unrelated
docs must not pair. MinHash/SimHash verified against exact ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash64_py,
    simhash_near_pairs,
)
from sgpt_spark.sources.pages import _VOCAB, _doc_terms

BASE = " ".join(_VOCAB[_doc_terms(7)][:120])
NEAR = " ".join(_VOCAB[_doc_terms(7)][:120][:-3]) + " zzz yyy xxx"  # ~97% same
OTHER = " ".join(_VOCAB[_doc_terms(99)][:120])


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),          # exact dup of 1
        (3, NEAR),          # near dup of 1
        (4, OTHER),         # unrelated
        (5, "tiny doc"),
        (6, "tiny doc"),    # exact dup of 5
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(spark, docs):
    m = {r["doc_id"]: r["canonical_id"] for r in dedup_exact(docs).collect()}
    assert m == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5, 6: 5}


def test_ngram_jaccard(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.8 < pairs[(1, 3)] < 1.0
    assert (2, 3) in pairs
    assert not any(4 in p or 5 in p or 6 in p for p in pairs)


def test_minhash_lsh_matches_exact(spark, docs):
    got = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.8).collect()}
    want = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    # verification step makes LSH output a subset of exact pairs;
    # at jaccard >= 0.8 with r=4,b=16 recall is ~1 on this fixture
    assert got == want
    assert (1, 2) in got


def test_simhash_udf_matches_python_twin(spark, docs):
    got = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    for row in docs.collect():
        toks = [t for t in row["text"].split(" ") if t]
        assert got[row["doc_id"]] == simhash64_py(toks), row["doc_id"]


def test_simhash_near_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_near_pairs(docs, max_hamming=6).collect()}
    assert pairs[(1, 2)] == 0      # identical text -> identical simhash
    assert pairs[(5, 6)] == 0
    assert (1, 3) in pairs         # near-dup within hamming 6
    assert (1, 4) not in pairs and (3, 4) not in pairs
