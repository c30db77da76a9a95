"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything except the Karp-Rabin rolling hash is pure JVM column
expressions (codegen'd, ANSI-SQL-expressible for the DuckDB oracle).
The rolling hash is a vectorized pandas UDF with a tested Python twin.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sgpt_spark.functions.analyzer import tokenize_ws

# Tiny deterministic stopword lists for the n-gram language heuristic.
# Real pipelines plug fastText/cld3 here; the operator shape (score per
# language -> argmax with deterministic tie order) is what matters.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es": ("el", "la", "los", "de", "que", "es", "en", "un", "por", "con"),
}

# A BPE-ish token pattern: word pieces, numbers, or single non-space
# symbols — a deterministic proxy for subword token counting.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (empty/null text -> 0)."""
    return F.size(tokenize_ws(F.coalesce(text, F.lit(""))))


def token_count_bpe_ish(text: Column) -> Column:
    """Count of BPE-ish pieces via regexp_count — JVM-side."""
    return F.regexp_count(F.coalesce(text, F.lit("")), F.lit(BPE_ISH_PATTERN))


def lang_scores(tokens: Column) -> list[tuple[str, Column]]:
    return [
        (lang, F.size(F.array_intersect(tokens, F.array(*[F.lit(w) for w in words]))))
        for lang, words in LANG_MARKERS.items()
    ]


def lang_id(text: Column) -> Column:
    """Heuristic language ID: distinct-marker hits per language, argmax
    with deterministic tie order (alphabetical via ordered comparison
    chain); no hits at all -> 'und' (undetermined)."""
    toks = tokenize_ws(F.coalesce(text, F.lit("")))
    scores = lang_scores(toks)
    best_score = F.greatest(*[s for _, s in scores])
    pick = F.lit("und")
    # iterate reversed so earlier (alphabetical) languages win ties
    for lang, s in sorted(scores, key=lambda t: t[0], reverse=True):
        pick = F.when(s == best_score, F.lit(lang)).otherwise(pick)
    return F.when(best_score > 0, pick).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds deterministic quality-signal columns:

    n_chars, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
    uniq_token_ratio, and a [0,1] quality_score combining them — the
    standard pre-training corpus filters (C4/Gopher-style rules),
    expressed as pure column arithmetic.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokenize_ws(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    en_stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()]", ""))
    uniq = F.size(F.array_distinct(toks))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    out = (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn(
            "mean_token_len",
            F.round((n_chars - F.greatest(n_tokens - 1, F.lit(0))) / safe_tokens, 6),
        )
        .withColumn("punct_ratio", F.round(punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("stopword_ratio", F.round(stop_hits / safe_tokens, 6))
        .withColumn("uniq_token_ratio", F.round(uniq / safe_tokens, 6))
    )
    # quality: in-range length, some lexical diversity, sane token length
    score = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 0.4).otherwise(0.0)
        + F.when((F.col("mean_token_len") >= 2) & (F.col("mean_token_len") <= 12), 0.3).otherwise(0.0)
        + F.when(F.col("uniq_token_ratio") >= 0.1, 0.3).otherwise(0.0)
    )
    return out.withColumn("quality_score", F.round(score, 6))


def fingerprint_md5(text: Column) -> Column:
    """Exact content fingerprint — md5 of the UTF-8 bytes (identical
    semantics in Spark and DuckDB, so fully oracle-checkable)."""
    return F.md5(F.coalesce(text, F.lit("")))


# ---- Karp-Rabin rolling window fingerprints (pandas UDF + twin) ----------

KR_BASE = 257
KR_MOD = (1 << 61) - 1
KR_WINDOW = 8  # tokens per window


def rolling_fingerprints_py(tokens: list[str], window: int = KR_WINDOW) -> list[int]:
    """Karp-Rabin hashes of every ``window``-token span (token-level
    rolling hash over per-token md5-derived values)."""
    import hashlib

    if len(tokens) < window:
        return []
    vals = [
        int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") % KR_MOD
        for t in tokens
    ]
    out = []
    h = 0
    power = pow(KR_BASE, window - 1, KR_MOD)
    for i, v in enumerate(vals):
        h = (h * KR_BASE + v) % KR_MOD
        if i >= window:
            h = (h - vals[i - window] * power * KR_BASE) % KR_MOD
        if i >= window - 1:
            out.append(h)
    return out


def rolling_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", window: int = KR_WINDOW
) -> DataFrame:
    """-> (doc_id, fp long) exploded rolling-window fingerprints, the
    building block for copy-span detection across a corpus."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _fps(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: rolling_fingerprints_py([x for x in (t or "").split(" ") if x], window)
        )

    return (
        df.select(F.col(id_col).alias("doc_id"), _fps(F.col(text_col)).alias("fps"))
        .select("doc_id", F.explode("fps").alias("fp"))
    )


def window_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", window: int = KR_WINDOW
) -> DataFrame:
    """-> (doc_id, pos, fp): md5 fingerprint of every ``window``-token
    span (pos = 1-based start token). Same copy-span-detection output
    shape as ``rolling_fingerprints``, but hash = md5(joined span) so it
    is a pure JVM expression AND expressible in ANSI SQL — the
    oracle-gated twin of the Karp-Rabin rolling path. O(n_tokens *
    window) bytes hashed vs the rolling hash's O(n_tokens); use the
    rolling variant when the window is large.
    """
    toks = tokenize_ws(F.coalesce(F.col(text_col), F.lit("")))
    wins = F.transform(
        F.sequence(F.lit(1), F.size(toks) - window + 1),
        lambda i: F.md5(F.array_join(F.slice(toks, i, window), " ")),
    )
    safe = F.when(F.size(toks) >= window, wins).otherwise(
        F.array().cast("array<string>")
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), safe.alias("wins"))
        .select("doc_id", F.posexplode("wins").alias("pos", "fp"))
        .withColumn("pos", (F.col("pos") + 1).cast("int"))
    )


def text_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-stop per-doc profile: counts + quality + lang + fingerprint."""
    out = quality_features(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")), "text"
    )
    return out.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.col("mean_token_len"),
        "punct_ratio",
        "stopword_ratio",
        "uniq_token_ratio",
        "quality_score",
        lang_id(F.col("text")).alias("lang_pred"),
        token_count_bpe_ish(F.col("text")).cast("long").alias("n_bpe_ish"),
        fingerprint_md5(F.col("text")).alias("fingerprint"),
    )
