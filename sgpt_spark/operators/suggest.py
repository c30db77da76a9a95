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

import math

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


def lm_counts(corpus: DataFrame, tokenizer=None):
    """Corpus language-model counts for the phrase suggester -> the ES
    shingle-field role: (unigrams (term, cnt), bigrams (w1, w2, cnt),
    total_tokens, vocab_size). Counts are token OCCURRENCES (not doc
    freq). Bigrams are adjacent pairs within a doc (no cross-doc or
    sentence-boundary markers — the documented simplification).
    ``total_tokens``/``vocab_size`` are two scalars collected once
    (the corpus_stats contract); everything else stays distributed."""
    from sgpt_spark.functions.analyzer import tokenize_ws

    tok = tokenizer or tokenize_ws
    toks = corpus.select(tok(F.col("text")).alias("toks")).filter(
        F.size("toks") > 0
    )
    unigrams = (
        toks.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    bigrams = (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1),"
                    " (t, i) -> struct(t AS w1, element_at(toks, i + 2) AS w2))"
                )
            ).alias("bg")
        )
        .groupBy("bg.w1", "bg.w2")
        .agg(F.count("*").alias("cnt"))
    )
    row = unigrams.agg(
        F.sum("cnt").alias("t"), F.count("*").alias("v")
    ).collect()[0]
    return unigrams, bigrams, int(row["t"]), int(row["v"])


def phrase_suggest(
    term_stats: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    total_tokens: int,
    vocab_size: int,
    phrases: DataFrame,
    size: int = 3,
    max_edits: int = 2,
    prefix_length: int = 1,
    min_word_length: int = 4,
    candidates_per_token: int = 5,
    suggest_mode: str = "missing",
    discount: float = 0.4,
    confidence: float = 1.0,
) -> DataFrame:
    """ES ``phrase`` suggester -> (qid, suggestion, score, suggest_rank):
    whole-phrase spell correction ranked by a bigram language model,
    the Lucene PhraseSuggester shape with the ES defaults this engine
    carries — direct_generator candidates from the index dictionary
    (``term_suggest``'s contract: max_edits/prefix_length/
    min_word_length/suggest_mode), max_errors=1 (each variant corrects
    exactly ONE token — the ES default), StupidBackoff(discount=0.4)
    smoothing, and ``confidence``: only variants scoring above
    ``score(original) + log10(confidence)`` return.

    Scoring (log10 domain; fixed, engine-reproducible arithmetic):

        lp_uni(w)      = log10((cnt(w) + 1) / (total + |V|))   [Laplace]
        lp_big(w1, w2) = log10(bcnt(w1,w2) / cnt(w1))  if bigram seen
                         log10(discount) + lp_uni(w2)  otherwise
        score(t_0..t_{n-1}) = lp_uni(t_0) + sum_i lp_big(t_{i-1}, t_i)

    (the Stupid Backoff conditional uses the unigram count of w1 as
    denominator — the standard approximation of the prefix count).

    Plan shape: variants are RELATIONAL, never arrays — the phrase's
    (pos, token) rows and its (i, w1, w2) bigram rows join the
    (j, candidate) substitutions with two CASE columns, so candidate
    phrases are (|tokens| x candidates_per_token) rows per phrase and
    scoring is one probability join + one groupBy; the suggestion
    string reassembles with an ordered collect per variant. At scale
    everything is bounded by the query batch except the LM relations,
    which are vocabulary-sized (unigrams) and pair-vocabulary-sized
    (bigrams) — both broadcast-or-shuffle join the tiny variant side.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if not (0 < discount <= 1):
        raise ValueError(f"discount must be in (0, 1], got {discount}")
    if confidence < 0:
        raise ValueError(f"confidence must be >= 0, got {confidence}")
    lg_total = float(total_tokens + vocab_size)

    def lp_uni(col):
        # log10((cnt + 1) / (total + V)) with cnt = 0 for OOV
        return F.log10((F.coalesce(col, F.lit(0)) + F.lit(1)) / F.lit(lg_total))

    # phrase tokens with position (0-based) and bigram rows
    toks = phrases.select(
        "qid", F.posexplode(F.split("query", " ", -1)).alias("pos", "t")
    ).filter(F.col("t") != "")
    pb = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.qid") == F.col("b.qid"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .select(
            F.col("a.qid").alias("qid"),
            F.col("b.pos").alias("i"),
            F.col("a.t").alias("w1"),
            F.col("b.t").alias("w2"),
        )
    )
    # direct generator: per distinct token, the term suggester's top
    # candidates (the same dictionary join + levenshtein contract)
    gen = term_suggest(
        term_stats,
        toks.select(F.col("t").alias("token")),
        size=candidates_per_token,
        max_edits=max_edits,
        prefix_length=prefix_length,
        min_word_length=min_word_length,
        suggest_mode=suggest_mode,
    ).select(F.col("token").alias("t"), F.col("suggestion").alias("cand"))
    variants = toks.join(gen, "t").select(
        "qid", F.col("pos").alias("j"), "cand"
    ).unionByName(
        # the original phrase rides as variant j=-1; its cand sentinel
        # is "" (a join key, so it must be non-NULL — equi-joins drop
        # NULL keys — and no dictionary term is empty)
        phrases.select("qid", F.lit(-1).alias("j"), F.lit("").alias("cand"))
    )
    # variant bigrams: substitute cand at position j, then one
    # probability join (bigram count, w1 unigram, w2 unigram)
    vb = variants.join(pb, "qid").select(
        "qid",
        "j",
        "cand",
        F.when(F.col("i") - 1 == F.col("j"), F.col("cand"))
        .otherwise(F.col("w1"))
        .alias("bw1"),
        F.when(F.col("i") == F.col("j"), F.col("cand"))
        .otherwise(F.col("w2"))
        .alias("bw2"),
    )
    probs = (
        vb.join(
            bigrams.select(
                F.col("w1").alias("bw1"),
                F.col("w2").alias("bw2"),
                F.col("cnt").alias("_bc"),
            ),
            ["bw1", "bw2"],
            "left",
        )
        .join(
            unigrams.select(F.col("term").alias("bw1"), F.col("cnt").alias("_u1")),
            "bw1",
            "left",
        )
        .join(
            unigrams.select(F.col("term").alias("bw2"), F.col("cnt").alias("_u2")),
            "bw2",
            "left",
        )
        .select(
            "qid",
            "j",
            "cand",
            F.when(
                F.col("_bc").isNotNull(),
                F.log10(F.col("_bc") / F.col("_u1").cast("double")),
            )
            .otherwise(F.lit(math.log10(discount)) + lp_uni(F.col("_u2")))
            .alias("lp"),
        )
    )
    bsum = probs.groupBy("qid", "j", "cand").agg(F.sum("lp").alias("_bsum"))
    # start-token unigram (position 0, substituted when j == 0)
    t0 = toks.filter(F.col("pos") == 0).select("qid", F.col("t").alias("_t0"))
    starts = (
        variants.join(t0, "qid")
        .select(
            "qid",
            "j",
            "cand",
            F.when(F.col("j") == 0, F.col("cand"))
            .otherwise(F.col("_t0"))
            .alias("w0"),
        )
        .join(
            unigrams.select(F.col("term").alias("w0"), F.col("cnt").alias("_u0")),
            "w0",
            "left",
        )
        .select("qid", "j", "cand", lp_uni(F.col("_u0")).alias("_lp0"))
    )
    scores = starts.join(bsum, ["qid", "j", "cand"], "left").select(
        "qid",
        "j",
        "cand",
        (F.col("_lp0") + F.coalesce(F.col("_bsum"), F.lit(0.0))).alias("_score"),
    )
    orig = scores.filter(F.col("j") == -1).select(
        "qid", F.col("_score").alias("_orig")
    )
    kept = (
        scores.filter(F.col("j") >= 0)
        .join(orig, "qid")
        .filter(
            F.col("_score") > F.col("_orig") + F.lit(math.log10(confidence))
            if confidence > 0
            else F.lit(True)
        )
    )
    # reassemble the suggestion string (ordered collect per variant)
    sug = (
        kept.join(toks, "qid")
        .select(
            "qid",
            "j",
            "cand",
            "_score",
            "pos",
            F.when(F.col("pos") == F.col("j"), F.col("cand"))
            .otherwise(F.col("t"))
            .alias("t2"),
        )
        .groupBy("qid", "j", "cand", "_score")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "t2"))),
                    lambda s: s.t2,
                ),
                " ",
            ).alias("suggestion")
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.round("_score", 6).desc(), F.col("suggestion").asc()
    )
    return (
        sug.withColumn("score", F.round("_score", 6))
        .withColumn("suggest_rank", F.row_number().over(w))
        .filter(F.col("suggest_rank") <= size)
        .select("qid", "suggestion", "score", "suggest_rank")
    )
