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
  word runs, apostrophes kept inside words) — ALSO a pure JVM column
  expression (``lower`` + ``regexp_extract_all``), so the full-text
  analysis chain stays inside whole-stage codegen at 100 TB.
  Deterministic, versioned; parity is defined by this function, not by
  reproducing Lucene bit-for-bit (SURVEY.md §7.4(1)).

One word-pattern, three spellings (tested for agreement):
  Python ``re``      [^\\W_]+(?:'[^\\W_]+)*        (\\w == L* ∪ N* ∪ _)
  Java regex (Spark) [\\p{L}\\p{N}]+(?:'[\\p{L}\\p{N}]+)*
  RE2 (DuckDB)       same as Java
All three classify "word chars" as Unicode letters+digits (L*, N*).
Lowercasing uses each engine's default Unicode lowering, which is
identical on ASCII. The one known divergence — the Greek Final_Sigma
rule (Python/JVM lower 'ΟΣ' -> 'ος', Arrow/DuckDB -> 'οσ') — is
canonicalized away: every analyzer maps final sigma to σ after
lowering, so the SAME bytes yield the SAME terms in the Arrow-native
index builder, the Python twin, the JVM expression, and the DuckDB
oracle (tested).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Versioned — changing these invalidates indexes built with the old
# version.
ANALYZER_VERSION = "standard-v2"
_WORD_RE = r"[^\W_]+(?:'[^\W_]+)*"  # Python re spelling
STANDARD_RE_JAVA = r"[\p{L}\p{N}]+(?:'[\p{L}\p{N}]+)*"  # Spark/Java spelling
STANDARD_RE_SQL = STANDARD_RE_JAVA  # DuckDB/RE2 spelling (identical)


def tokenize_ws(text: Column) -> Column:
    """Whitespace tokenizer as a JVM column expression (no UDF).

    ``split`` on a single space then drop empty strings — identical
    semantics to DuckDB ``string_split(text, ' ')`` minus empties.
    """
    return F.filter(F.split(text, " ", -1), lambda t: t != F.lit(""))


def tokenize_standard(text: Column) -> Column:
    """Lucene-standard-like analyzer as a JVM column expression (no UDF):
    lowercase, then extract Unicode word runs (letters/digits, with
    apostrophes kept inside words — Lucene's standard tokenizer treats
    English possessives the same way before stripping).

    Matches the ES ``standard`` analysis the reference's BM25 delegates
    to (crossencoder_beir_bm25.ipynb:298-310 cell 10): real text such as
    "The end." retrieves under query term "the".
    """
    lowered = F.translate(F.lower(F.coalesce(text, F.lit(""))), "ς", "σ")
    return F.regexp_extract_all(lowered, F.lit(STANDARD_RE_JAVA), F.lit(0))


def tokenize_py_ws(text: str) -> list[str]:
    """Driver/oracle-side twin of ``tokenize_ws``."""
    return [t for t in (text or "").split(" ") if t]


def resolve_py_analyzer(name: str):
    """IndexMeta.analyzer name -> Python tokenizer fn, so the query side
    analyzes with the SAME analyzer the index was built with.

    Unknown/custom names raise: an index built with a custom
    ``py_tokenizer`` records that custom name in IndexMeta, and silently
    whitespace-analyzing its appends/queries would split the vocabulary
    and mis-score. Callers with custom analyzers must pass the tokenizer
    explicitly (``collect_query_terms(tokenize=...)`` /
    ``append_to_index(py_tokenizer=...)``).
    """
    table = {"tokenize_py_ws": tokenize_py_ws, "analyze_py": analyze_py}
    if name not in table:
        raise ValueError(
            f"unknown analyzer {name!r} in IndexMeta: this index was built "
            "with a custom tokenizer — pass it explicitly (tokenize=/"
            f"py_tokenizer=) instead of relying on resolution. Built-ins: "
            f"{sorted(table)}"
        )
    return table[name]


def resolve_jvm_analyzer(name: str):
    """IndexMeta.analyzer name -> JVM column tokenizer (the twin of
    ``resolve_py_analyzer`` for plans that analyze queries inside the
    DataFrame plan rather than on the driver). Unknown names raise for
    the same vocabulary-split reason."""
    table = {"tokenize_py_ws": tokenize_ws, "analyze_py": tokenize_standard}
    if name not in table:
        raise ValueError(
            f"unknown analyzer {name!r} in IndexMeta: this index was built "
            "with a custom tokenizer — analyze queries with that tokenizer "
            f"explicitly. Built-ins: {sorted(table)}"
        )
    return table[name]


def analyze_py(text: str) -> list[str]:
    """Driver/oracle-side twin of ``tokenize_standard`` (same word
    pattern, Python ``re`` spelling).

    Used by the fused single-pass index builder
    (``indexer._tokenize_codes_py``) and the pure-Python brute-force
    oracle, so engine and oracle share one tokenizer definition.
    """
    import re

    return re.findall(_WORD_RE, (text or "").lower().replace("ς", "σ"))
