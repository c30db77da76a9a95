"""ES term suggester — spell-correction candidates from the index
dictionary (the Lucene DirectSpellChecker role behind ES ``suggest``).

For each suggest-entry token, propose up to ``size`` dictionary terms
within ``max_edits`` classical Levenshtein, sharing the first
``prefix_length`` chars (ES default 1 — corrections rarely err on the
first letter, and the prefix key prunes the dictionary join), skipping
tokens shorter than ``min_word_length`` (ES default 4). Candidate
order is the ES ``sort: score`` contract: similarity desc, then
doc_freq desc, then term asc (deterministic final tie-break).
Similarity = 1 - edits / min(len(token), len(term)) — the same
DirectSpellChecker/FuzzyTermsEnum blend the engine's fuzzy query
boosts with (operators/multiterm.expand_fuzzy), so the two surfaces
can't disagree about what "close" means.

``suggest_mode`` (ES spellings):

* ``missing`` (default): suggest only for tokens NOT in the index.
* ``popular``: only candidates with a HIGHER doc freq than the token.
* ``always``: every token gets candidates.

The candidate generation is the engine's standard dictionary-expansion
shape: the token side explodes to its admissible term lengths and
equi-joins (length, prefix) against the termstats dictionary — only
band survivors reach the JVM ``levenshtein`` filter, never the full
vocabulary. Fully declarative (no UDF, no driver step) and
value-gateable: DuckDB's ``levenshtein`` is the same classical
distance.

Scale notes (10^12 docs): termstats is |vocabulary|-sized (millions of
rows, not corpus-sized); the suggest-entry side is tiny and broadcast;
the per-token top-``size`` window compiles to WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUGGEST_MODES = ("missing", "popular", "always")


def term_suggest(
    term_stats: DataFrame,
    tokens: DataFrame,
    size: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
    min_word_length: int = 4,
    suggest_mode: str = "missing",
) -> DataFrame:
    """(term, df) dictionary x (token) suggest entries -> (token,
    suggestion, score, doc_freq, suggest_rank). See module docstring
    for the ES semantics carried."""
    if suggest_mode not in SUGGEST_MODES:
        raise ValueError(
            f"unknown suggest_mode {suggest_mode!r}: {SUGGEST_MODES}"
        )
    if not (0 <= max_edits <= 2):
        # Lucene DirectSpellChecker caps at 2 (LevenshteinAutomata limit)
        raise ValueError(f"max_edits must be 0..2, got {max_edits}")
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    p = int(prefix_length)
    toks = (
        tokens.select("token")
        .distinct()
        .filter(F.length("token") >= int(min_word_length))
    )
    # the token's own doc freq decides missing/popular eligibility
    toks = toks.join(
        term_stats.select(
            F.col("term").alias("token"), F.col("df").alias("_tok_df")
        ),
        "token",
        "left",
    )
    q = toks.select(
        "token",
        "_tok_df",
        F.length("token").alias("_qlen"),
        F.explode(
            F.sequence(
                F.greatest(F.length("token") - max_edits, F.lit(1)),
                F.length("token") + max_edits,
            )
        ).alias("_tlen"),
    )
    cond = (F.length(F.col("term")) == F.col("_tlen")) & (
        F.col("term") != F.col("token")
    )
    if p > 0:
        cond = cond & (
            F.substring(F.col("term"), 1, p) == F.substring(F.col("token"), 1, p)
        )
    cand = (
        term_stats.join(F.broadcast(q), cond)
        .withColumn("_ed", F.levenshtein(F.col("term"), F.col("token")))
        .filter(F.col("_ed") <= max_edits)
    )
    if suggest_mode == "missing":
        cand = cand.filter(F.col("_tok_df").isNull())
    elif suggest_mode == "popular":
        cand = cand.filter(
            F.col("df") > F.coalesce(F.col("_tok_df"), F.lit(0))
        )
    scored = cand.select(
        "token",
        F.col("term").alias("suggestion"),
        (
            F.lit(1.0)
            - F.col("_ed")
            / F.least(F.col("_qlen"), F.length("term")).cast("double")
        ).alias("score"),
        F.col("df").alias("doc_freq"),
    )
    w = Window.partitionBy("token").orderBy(
        F.col("score").desc(), F.col("doc_freq").desc(), F.col("suggestion").asc()
    )
    return (
        scored.withColumn("suggest_rank", F.row_number().over(w))
        .filter(F.col("suggest_rank") <= size)
    )
