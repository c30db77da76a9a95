"""Text-analysis operators: counting, lang-id, quality, fingerprints."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.textstats import (
    KR_WINDOW,
    fingerprint_md5,
    lang_id,
    rolling_fingerprints,
    rolling_fingerprints_py,
    text_profile,
    token_count_bpe_ish,
    token_count_ws,
)

ROWS = [
    (1, "the cat sat on the mat and it is fine for now"),
    (2, "der hund ist nicht auf der couch und das ist gut"),
    (3, "le chat est dans la maison et il est pour les amis"),
    (4, "el perro es de la casa y es un buen perro con todos"),
    (5, ""),
    (6, "zzz qqq www"),  # no markers -> und
    (7, "Hello, world! It's 2024: a test-case (v2)."),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_token_counts(spark, df):
    got = {
        r["doc_id"]: (r["ws"], r["bpe"])
        for r in df.select(
            "doc_id",
            token_count_ws(F.col("text")).alias("ws"),
            token_count_bpe_ish(F.col("text")).alias("bpe"),
        ).collect()
    }
    assert got[1][0] == 12
    assert got[5] == (0, 0)
    # "Hello, world! It's 2024: a test-case (v2)." pieces:
    # Hello , world ! It ' s 2024 : a test - case ( v 2 ) . = 18
    assert got[7][1] == 18


def test_lang_id(spark, df):
    got = {r["doc_id"]: r["l"] for r in df.select("doc_id", lang_id(F.col("text")).alias("l")).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "es"
    assert got[5] == "und" and got[6] == "und"


def test_fingerprint_md5_matches_stdlib(spark, df):
    got = {r["doc_id"]: r["f"] for r in df.select("doc_id", fingerprint_md5(F.col("text")).alias("f")).collect()}
    for did, text in ROWS:
        assert got[did] == hashlib.md5(text.encode()).hexdigest()


def test_rolling_fingerprints_match_twin(spark, df):
    got: dict = {}
    for r in rolling_fingerprints(df).collect():
        got.setdefault(r["doc_id"], []).append(r["fp"])
    for did, text in ROWS:
        toks = [t for t in text.split(" ") if t]
        want = rolling_fingerprints_py(toks)
        assert got.get(did, []) == want, did
        if len(toks) >= KR_WINDOW:
            assert len(want) == len(toks) - KR_WINDOW + 1


def test_rolling_fingerprint_shift_invariance():
    """The same window hashes identically wherever it appears — the
    property copy-span detection relies on."""
    a = rolling_fingerprints_py(["p", "q"] + [f"w{i}" for i in range(8)], 8)
    b = rolling_fingerprints_py([f"w{i}" for i in range(8)] + ["x", "y"], 8)
    assert a[-1] == b[0]


def test_text_profile_shape(spark, df):
    prof = text_profile(df)
    rows = {r["doc_id"]: r for r in prof.collect()}
    assert rows[1]["lang_pred"] == "en"
    assert rows[1]["quality_score"] == 1.0
    assert rows[5]["n_tokens"] == 0 and rows[5]["quality_score"] < 1.0
    assert set(prof.columns) >= {
        "doc_id", "n_chars", "n_tokens", "quality_score", "lang_pred", "fingerprint",
    }


def test_window_fingerprints_align_with_rolling(spark, df):
    """md5 window fingerprints (oracle twin) cover exactly the same
    spans as the Karp-Rabin rolling path: same (doc, pos) keys, same
    equal-span structure (fp_a == fp_b iff the token spans match)."""
    from sgpt_spark.operators.textstats import window_fingerprints

    wfp = {(r["doc_id"], r["pos"]): r["fp"] for r in window_fingerprints(df).collect()}
    texts = dict(ROWS)
    want_keys = set()
    for did, text in texts.items():
        toks = [t for t in text.split(" ") if t]
        for i in range(len(toks) - KR_WINDOW + 1):
            want_keys.add((did, i + 1))
    assert set(wfp) == want_keys
    # value = md5 of the joined span
    for (did, pos), fp in wfp.items():
        toks = [t for t in texts[did].split(" ") if t]
        span = " ".join(toks[pos - 1 : pos - 1 + KR_WINDOW])
        assert fp == hashlib.md5(span.encode()).hexdigest(), (did, pos)
