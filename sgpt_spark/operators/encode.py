"""Dense path — text -> embedding encoding (reference entry point B).

The reference encodes with SGPT bi-encoders (beir_dense_retriever.py:
158-314: tokenize -> model forward -> weighted-mean pooling). No GPU
models exist in this container, so the encoder is a STUB with the same
contract AND an exactly-reproducible definition: a deterministic,
vectorized ``texts -> array<double>`` pandas UDF whose output is a pure
function of the token sequence via md5 arithmetic — each (token, dim)
contributes the signed 32-bit integer folded from the first 8 hex
nibbles of ``md5(token || ':' || dim)``, pooled with SGPT's
position-ramp weights (w = 1..L, beir_dense_retriever.py:258-270) and
L2-normalized.

Why integer md5 arithmetic: the pooled numerator ``sum(i * v)`` and
denominator ``sum(i)`` are EXACT int64 values, so ``num / den`` is one
exactly-rounded IEEE division — DuckDB reproduces the pre-normalization
embedding bit-for-bit (see ``md5_embedding_sql`` below), which makes
the full encode -> cosine-top-k lifecycle value-gateable against a SQL
oracle (cosine is scale-invariant, so the oracle skips normalization).

A real model swaps in by replacing ``_token_vec_int``/``embed_text_py``
only; every Spark plan stays identical.

``encode_corpus`` + ``encode_queries`` + similarity.cosine_topk =
the reference's DenseRetrievalExactSearch pipeline
(custommodels/exact_search.py:34-134).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 32

# int64 position-weighted sums stay exact only while
# 2^31 * L*(L+1)/2 < 2^63  =>  L <= ~92k tokens. Real corpora truncate
# far below this (corpus.truncate_tokens); guard instead of wrapping.
MAX_TOKENS = 92_000

_TOKEN_CACHE: dict[tuple[str, int], np.ndarray] = {}
_TOKEN_CACHE_CAP = 200_000


def _token_vec_int(token: str, dim: int) -> np.ndarray:
    """Signed-int32 direction for one token: per dim d, the first 8 hex
    nibbles of md5(f"{token}:{d}") as an unsigned 32-bit int, minus
    2^31. Exactly reproducible in any engine with md5 + substring."""
    key = (token, dim)
    v = _TOKEN_CACHE.get(key)
    if v is None:
        v = np.fromiter(
            (
                int(hashlib.md5(f"{token}:{d}".encode()).hexdigest()[:8], 16) - 2**31
                for d in range(dim)
            ),
            dtype=np.int64,
            count=dim,
        )
        if len(_TOKEN_CACHE) < _TOKEN_CACHE_CAP:
            _TOKEN_CACHE[key] = v
    return v


def embed_text_py(text: str, dim: int = DIM) -> np.ndarray:
    """Deterministic stub embedding with position-weighted mean pooling
    (weights 1..L like SGPT, beir_dense_retriever.py:258-270), then L2
    normalization. The pre-normalization vector is num/den with exact
    int64 num, den."""
    toks = [t for t in (text or "").split(" ") if t]
    if not toks:
        return np.zeros(dim)
    if len(toks) > MAX_TOKENS:
        raise ValueError(
            f"document has {len(toks)} tokens > {MAX_TOKENS}; truncate first "
            "(corpus.truncate_tokens) — int64 pooling would overflow"
        )
    num = np.zeros(dim, dtype=np.int64)
    for i, t in enumerate(toks, start=1):
        num += i * _token_vec_int(t, dim)
    den = len(toks) * (len(toks) + 1) // 2
    v = num.astype(np.float64) / float(den)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def encode_texts(
    df: DataFrame, id_col: str, text_col: str, dim: int = DIM,
    out_id: str = "vec_id", out_col: str = "embedding",
) -> DataFrame:
    """df -> (vec_id, embedding array<double>) via an Arrow-batched UDF.

    Double, not float: the md5-arithmetic stub is oracle-checked to 6
    decimals, and a float32 cast would inject ~1e-7 noise right at the
    rounding boundary. A real float32 model output widens losslessly.
    """

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = [embed_text_py(t, dim).tolist() for t in pdf[text_col]]
            yield pd.DataFrame({out_id: pdf[id_col], out_col: embs})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        enc, schema=f"{out_id} {id_type}, {out_col} array<double>"
    )


def encode_corpus(corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  dim: int = DIM) -> DataFrame:
    return encode_texts(corpus, id_col, text_col, dim)


def encode_queries(queries: DataFrame, qid_col: str = "qid", query_col: str = "query",
                   dim: int = DIM) -> DataFrame:
    return encode_texts(queries, qid_col, query_col, dim, out_id="qid")


# --- DuckDB SQL twin (kept beside the Spark definition so they cannot
# --- drift). Emits CTEs computing the UN-normalized embedding num/den —
# --- bit-identical to the Spark pre-normalization vector; cosine is
# --- scale-invariant so downstream list_cosine_similarity matches.

_HEX = "0123456789abcdef"
_NIBBLE8 = " + ".join(
    f"(strpos('{_HEX}', substr(h, {j + 1}, 1)) - 1) * {16 ** (7 - j)}" for j in range(8)
)


def md5_embedding_sql(
    prefix: str, source: str, id_col: str, text_col: str,
    dim: int = DIM, out_id: str = "vec_id",
) -> str:
    """CTE chain ``{prefix}_toks, {prefix}_tok, {prefix}_tv,
    {prefix}_emb`` where ``{prefix}_emb`` is (out_id, e DOUBLE[]) — the
    un-normalized md5-arithmetic embedding of ``source``. Rows with no
    tokens produce no output (filter empties upstream, as the Spark
    side's non_empty_text does)."""
    return f"""
{prefix}_toks AS (
  SELECT {id_col} AS vid,
         list_filter(string_split(coalesce({text_col}, ''), ' '), x -> x <> '') AS toks
  FROM {source}
),
{prefix}_tok AS (
  SELECT vid, CAST(g.i AS BIGINT) AS i, toks[g.i] AS t
  FROM {prefix}_toks, unnest(generate_series(1, len(toks))) AS g(i)
),
{prefix}_tv AS (
  SELECT vid, i, d, CAST({_NIBBLE8} AS BIGINT) - 2147483648 AS v
  FROM (SELECT vid, i, dd.d AS d, md5(t || ':' || dd.d) AS h
        FROM {prefix}_tok
        CROSS JOIN (SELECT unnest(generate_series(0, {dim - 1})) AS d) dd)
),
{prefix}_emb AS (
  SELECT vid AS {out_id}, list(ed ORDER BY d) AS e
  FROM (
    SELECT vid, d,
           CAST(CAST(sum(i * v) AS BIGINT) AS DOUBLE)
           / CAST(CAST(sum(i) AS BIGINT) AS DOUBLE) AS ed
    FROM {prefix}_tv GROUP BY vid, d
  ) GROUP BY vid
)"""
