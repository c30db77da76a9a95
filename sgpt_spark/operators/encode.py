"""Dense path — text -> embedding encoding (reference entry point B).

The reference encodes with SGPT bi-encoders (beir_dense_retriever.py:
158-314: tokenize -> model forward -> weighted-mean pooling). No GPU
models exist in this container, so the encoder is a STUB with the same
contract: a deterministic, vectorized ``texts -> array<float>`` pandas
UDF whose output is a unit vector that is a pure function of the token
multiset (hashing trick — each token adds a seeded Gaussian direction
weighted by a position-ramp, mirroring SGPT's position-weighted mean
pooling shape, beir_dense_retriever.py:258-270). A real model swaps in
by replacing ``_embed_batch`` only; every Spark plan stays identical.

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


def _token_vec(token: str, dim: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.blake2b(token.encode(), digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim)


def embed_text_py(text: str, dim: int = DIM) -> np.ndarray:
    """Deterministic stub embedding with position-weighted mean pooling
    (weights 1..L like SGPT, beir_dense_retriever.py:258-270)."""
    toks = [t for t in (text or "").split(" ") if t]
    if not toks:
        return np.zeros(dim)
    acc = np.zeros(dim)
    wsum = 0.0
    for i, t in enumerate(toks):
        w = float(i + 1)
        acc += w * _token_vec(t, dim)
        wsum += w
    v = acc / wsum
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def encode_texts(
    df: DataFrame, id_col: str, text_col: str, dim: int = DIM,
    out_id: str = "vec_id", out_col: str = "embedding",
) -> DataFrame:
    """df -> (vec_id, embedding array<float>) via an Arrow-batched UDF."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = [embed_text_py(t, dim).astype(np.float32).tolist() for t in pdf[text_col]]
            yield pd.DataFrame({out_id: pdf[id_col], out_col: embs})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        enc, schema=f"{out_id} {id_type}, {out_col} array<float>"
    )


def encode_corpus(corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  dim: int = DIM) -> DataFrame:
    return encode_texts(corpus, id_col, text_col, dim)


def encode_queries(queries: DataFrame, qid_col: str = "qid", query_col: str = "query",
                   dim: int = DIM) -> DataFrame:
    return encode_texts(queries, qid_col, query_col, dim, out_id="qid")
