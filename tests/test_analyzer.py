"""Lucene-standard analyzer: three-spelling agreement (Spark JVM regex,
Python re twin, DuckDB RE2) + end-to-end retrieval parity through both
the exhaustive and the compressed-index paths.

Reference semantics: ES ``standard`` analysis behind BM25Search
(crossencoder/beir/crossencoder_beir_bm25.ipynb:298-310 cell 10).
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import (
    STANDARD_RE_SQL,
    analyze_py,
    resolve_py_analyzer,
    tokenize_py_ws,
    tokenize_standard,
)
from sgpt_spark.operators.index_search import search_index
from sgpt_spark.operators.indexer import build_index, read_index
from sgpt_spark.operators.search import bm25_search

TRICKY = [
    "The cat's hat, 42 times!",
    "Füße GROß élan",
    "ΟΣ ΣΟΦΟΣ λόγος",  # Greek final sigma — canonicalized to σ everywhere
    "",
    "   ",
    "a_b c-d",
    "''quoted'' rock'n'roll",
    "UPPER lower MiXeD",
    "dots...and,commas;semis",
    "42x 3.14 1,000",
    "tab\tand\nnewline",
]


def test_jvm_matches_python_twin(spark):
    df = spark.createDataFrame([(t,) for t in TRICKY], "text string")
    got = [r["t"] for r in df.select(tokenize_standard(F.col("text")).alias("t")).collect()]
    want = [analyze_py(t) for t in TRICKY]
    assert got == want


def test_duckdb_matches_python_twin():
    con = duckdb.connect()
    pat = STANDARD_RE_SQL.replace("'", "''")
    for t in TRICKY:
        lit = t.replace("'", "''").replace("\t", " ").replace("\n", " ")
        got = con.sql(
            f"SELECT regexp_extract_all(replace(lower('{lit}'), 'ς', 'σ'), '{pat}')"
        ).fetchone()[0]
        want = analyze_py(t.replace("\t", " ").replace("\n", " "))
        assert got == want, t


def test_arrow_standard_codes_match_python_twin():
    """The Arrow-native standard tokenize path used by the fused index
    builder must be code-for-code identical to analyze_py."""
    import random
    import string

    import numpy as np
    import pandas as pd

    from sgpt_spark.operators.indexer import _tokenize_codes_py, _tokenize_codes_standard

    random.seed(7)
    alphabet = string.ascii_letters + string.digits + "'''   _-.,!?ü߀\n\t"
    fuzz = [
        "".join(random.choice(alphabet) for _ in range(random.randint(0, 60)))
        for _ in range(400)
    ]
    texts = pd.Series(TRICKY + [None, "a''b x'''y", "' '' '''", "O'Brien's CAN'T"] + fuzz)
    got = _tokenize_codes_standard(texts)
    want = _tokenize_codes_py(texts, analyze_py)
    for name, g, w in zip(("codes", "doc_idx", "lens", "vocab"), got, want):
        assert np.array_equal(g, w), name


def test_resolve_py_analyzer():
    assert resolve_py_analyzer("analyze_py") is analyze_py
    assert resolve_py_analyzer("tokenize_py_ws") is tokenize_py_ws
    # unknown/custom analyzer names must raise, not silently fall back
    # to whitespace (that would split a custom-analyzed index's vocab)
    with pytest.raises(ValueError, match="unknown analyzer"):
        resolve_py_analyzer("whatever")


def test_resolve_jvm_analyzer_unknown_raises():
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer

    with pytest.raises(ValueError, match="unknown analyzer"):
        resolve_jvm_analyzer("my_custom_tok")


@pytest.fixture()
def messy_corpus(spark):
    rows = [
        (0, "The End. Of an era, truly!"),
        (1, "the end of THE WORLD"),
        (2, "Punctuation!!! ... ???"),  # zero standard tokens
        (3, "era era era, The era"),
        (4, "unrelated words entirely different"),
        (5, "Era of The end?"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_standard_retrieves_across_case_and_punct(spark, messy_corpus):
    queries = spark.createDataFrame([(100, "the era")], "qid long, query string")
    std = bm25_search(messy_corpus, queries, k=10, tokenizer=tokenize_standard)
    got = {r["doc_id"] for r in std.collect()}
    # every doc containing the/era in any casing/punctuation matches
    assert got == {0, 1, 3, 5}
    # whitespace tokenizer misses the capitalized/punctuated forms
    ws = bm25_search(messy_corpus, queries, k=10)
    ws_ids = {r["doc_id"] for r in ws.collect()}
    assert ws_ids < got


def test_index_path_matches_exhaustive_standard(spark, messy_corpus):
    queries = spark.createDataFrame(
        [(100, "the era"), (101, "Punctuation's end!"), (102, "!!!")],
        "qid long, query string",
    )
    exhaustive = sorted(
        tuple(r) for r in
        bm25_search(messy_corpus, queries, k=10, tokenizer=tokenize_standard).collect()
    )
    path = tempfile.mkdtemp(prefix="sgpt_std_idx_")
    meta = build_index(messy_corpus.repartition(3, "doc_id"), path, py_tokenizer=analyze_py)
    assert meta.analyzer == "analyze_py"
    postings, meta2 = read_index(spark, path)
    via_index = sorted(
        tuple(r) for r in search_index(spark, postings, meta2, queries, k=10).collect()
    )
    assert via_index == exhaustive
    # zero-token docs still count toward N/avgdl
    assert meta.n_docs == 6
