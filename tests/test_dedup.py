"""Dedup operators: planted exact/near duplicates must be found; unrelated
docs must not pair. MinHash/SimHash verified against exact ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.dedup import (
    _block_bounds,
    dedup_exact,
    lsh_bucket_stats,
    minhash_lsh_pairs,
    minhash_lsh_pairs_md5,
    near_dup_pairs,
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


def test_block_bounds():
    assert _block_bounds(64, 6) == [(0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10)]
    assert sum(w for _, w in _block_bounds(64, 7)) == 64


def test_simhash_banding_sound_vs_bruteforce(spark):
    """Manku multi-block banding must find EXACTLY the brute-force
    Hamming<=3 pairs (banding is candidate generation only; the exact
    bit_count filter makes precision 1, pigeonhole makes recall 1)."""
    import itertools

    rows = [(i, " ".join(_VOCAB[_doc_terms(i % 5)][: 40 + i % 7])) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    want = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3:
            want.add((a, b))
    got = {(r["id_a"], r["id_b"]) for r in simhash_near_pairs(docs, max_hamming=3).collect()}
    assert got == want


def test_minhash_md5_matches_exact(spark, docs):
    """The md5 twin's verified output is a subset of exact Jaccard pairs
    and finds the planted dups (same contract as the xxhash path)."""
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           minhash_lsh_pairs_md5(docs, threshold=0.8).collect()}
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    assert set(got) <= set(exact)
    assert (1, 2) in got and got[(1, 2)] == 1.0
    for p, j in got.items():
        assert j == exact[p]


def test_near_dup_pairs_giant_cluster_is_linear(spark):
    """Adversarial case: a large exact-dup cluster must produce a LINEAR
    star (N-1 pairs), never the quadratic N(N-1)/2 — the giant-bucket
    hole the pre-collapse closes."""
    n = 500
    rows = [(i, BASE) for i in range(n)]          # 500 identical docs
    rows += [(1000, NEAR), (2000, OTHER)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = near_dup_pairs(docs, method="minhash", threshold=0.8).collect()
    star = [p for p in pairs if p["jaccard"] == 1.0]
    near = [p for p in pairs if p["jaccard"] < 1.0]
    assert len(star) == n - 1                      # linear, canonical id 0
    assert all(p["id_a"] == 0 for p in star)
    assert {(p["id_a"], p["id_b"]) for p in near} == {(0, 1000)}
    # simhash flavor too: star pairs at hamming 0 + rep near-pair
    sh = near_dup_pairs(docs, method="simhash", max_hamming=6).collect()
    sh_star = [p for p in sh if p["id_b"] != 1000]
    assert len(sh_star) == n - 1
    assert {(p["id_a"], p["id_b"]) for p in sh if p["id_b"] == 1000} == {(0, 1000)}


def test_lsh_bucket_stats(spark, docs):
    row = lsh_bucket_stats(docs).collect()[0]
    assert row["n_buckets"] > 0
    assert row["max_bucket"] >= 2          # the exact dups share all buckets
    assert row["candidate_pairs"] >= 1


def test_connected_components_chain_and_singletons(spark):
    """A chain a-b, b-c, c-d needs multiple propagation rounds; e-f is a
    separate component; g is a singleton."""
    from sgpt_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in
           connected_components(nodes, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_dedup_clusters_over_planted_dups(spark, docs):
    from sgpt_spark.operators.dedup import dedup_clusters

    got = {r["doc_id"]: r["cluster_id"] for r in
           dedup_clusters(docs, threshold=0.5).collect()}
    # 1,2 exact dups and 3 near-dup of 1 -> one cluster rooted at 1;
    # 4 alone; 5,6 exact dups but too short for 3-gram shingles -> the
    # jaccard edge set misses them (each its own cluster)
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4


def test_simhash_md5_twin_matches_bruteforce(spark):
    """The md5 twin (value-gated by the DuckDB oracle) must equal the
    brute-force Hamming<=3 pair set computed from its own signatures —
    same soundness/completeness contract as the blake2b scale path."""
    import itertools

    from sgpt_spark.operators.dedup import simhash_near_pairs_md5

    rows = [(i, " ".join(_VOCAB[_doc_terms(i % 5)][: 40 + i % 7])) for i in range(40)]
    rows.append((99, ""))  # empty doc: no tokens -> excluded, never paired
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash64(docs, hash_name="md5").collect()
        if r["doc_id"] != 99
    }
    want = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3:
            want.add((a, b))
    got = {(r["id_a"], r["id_b"]) for r in simhash_near_pairs_md5(docs).collect()}
    assert got == want and all(99 not in p for p in got)
