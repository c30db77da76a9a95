"""Text analysis (string -> terms) — the index-build front end.

The reference tokenizes with a HuggingFace subword tokenizer
(/root/reference/biencoder/beir/beir_dense_retriever.py:171-173) for the
dense path and delegates BM25 analysis to Elasticsearch's Lucene
``standard`` analyzer (crossencoder/beir/crossencoder_beir_bm25.ipynb
cell 10). This module provides both analyzers the BM25 graft needs:

- ``tokenize_ws``: whitespace split, pure JVM column expression
  (whole-stage codegen, zero Python) — exactly mirrors the DuckDB oracle's
  ``string_split(text, ' ')`` so Spark-vs-oracle comparisons are
  tokenizer-identical.
- ``tokenize_standard``: Lucene-standard-equivalent (lowercase + Unicode
  word boundaries), as a vectorized Arrow/pandas UDF (input_hint: no
  per-row Python). Deterministic, versioned; parity is defined by this
  function, not by reproducing Lucene bit-for-bit (SURVEY.md §7.4(1)).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Unicode-aware "word" pattern: runs of letters/digits (+ apostrophes kept
# inside words, like Lucene's standard tokenizer treats English
# possessives before stripping). Versioned — changing it invalidates
# indexes built with the old version.
ANALYZER_VERSION = "standard-v1"
_WORD_RE = r"[^\W_]+(?:'[^\W_]+)*"


def tokenize_ws(text: Column) -> Column:
    """Whitespace tokenizer as a JVM column expression (no UDF).

    ``split`` on a single space then drop empty strings — identical
    semantics to DuckDB ``string_split(text, ' ')`` minus empties.
    """
    return F.filter(F.split(text, " ", -1), lambda t: t != F.lit(""))


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_standard(texts: pd.Series) -> pd.Series:
    """Lucene-standard-like analyzer, vectorized over an Arrow batch.

    lowercase -> extract Unicode word runs. Pure function of the input
    string; same bytes in => same terms out on every executor.
    """
    lowered = texts.fillna("").str.lower()
    return lowered.str.findall(_WORD_RE)


def tokenize_py_ws(text: str) -> list[str]:
    """Driver/oracle-side twin of ``tokenize_ws``."""
    return [t for t in (text or "").split(" ") if t]


def analyze_py(text: str) -> list[str]:
    """Driver/oracle-side twin of ``tokenize_standard`` (same regex).

    Used by the pure-Python brute-force oracle so engine and oracle share
    one tokenizer definition.
    """
    import re

    return re.findall(_WORD_RE, (text or "").lower())
