"""Similarity search: brute force vs JVM-exhaustive identity, LSH recall."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_exhaustive,
    lsh_cosine_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.persist().count()
    return df


@pytest.fixture(scope="module")
def qvecs(spark, emb):
    q = (
        emb.filter(F.col("vec_id") % 50 == 0)
        .select(F.col("vec_id").alias("qid"), "embedding")
    )
    q.persist().count()
    return q


def as_runs(rows):
    out = {}
    for r in rows:
        out.setdefault(r["qid"], []).append((r["rank"], r["vec_id"], r["score"]))
    for v in out.values():
        v.sort()
    return out


def test_pandas_matches_jvm_exhaustive(spark, emb, qvecs):
    a = as_runs(cosine_topk(emb, qvecs, k=10).collect())
    b = as_runs(cosine_topk_exhaustive(emb, qvecs, k=10).collect())
    assert set(a) == set(b) and len(a) > 0
    for qid in a:
        assert [(r, v) for r, v, _ in a[qid]] == [(r, v) for r, v, _ in b[qid]], qid
        for (_, _, sa), (_, _, sb) in zip(a[qid], b[qid]):
            assert math.isclose(sa, sb, abs_tol=1e-6)


def test_self_is_top1(spark, emb, qvecs):
    run = as_runs(cosine_topk(emb, qvecs, k=3).collect())
    for qid, hits in run.items():
        assert hits[0][1] == qid  # a vector's nearest neighbour is itself
        assert math.isclose(hits[0][2], 1.0, abs_tol=1e-6)


def test_lsh_recall(spark, emb, qvecs):
    """LSH candidates rescored exactly: top-1 recall must be high and
    every returned pair must carry the exact cosine score."""
    truth = as_runs(cosine_topk(emb, qvecs, k=5).collect())
    approx = as_runs(lsh_cosine_topk(emb, qvecs, k=5, n_planes=6, n_tables=6).collect())
    hits = sum(1 for q in truth if q in approx and approx[q][0][1] == truth[q][0][1])
    assert hits / len(truth) >= 0.9
    # scores are exact cosines (verified vs truth where pairs coincide)
    for q, ah in approx.items():
        tmap = {v: s for _, v, s in truth.get(q, [])}
        for _, v, s in ah:
            if v in tmap:
                assert math.isclose(s, tmap[v], abs_tol=1e-6)
