"""Multi-term queries — Lucene's MultiTermQuery family (``prefix``,
``wildcard``, ``fuzzy``) re-expressed over the engine's inverted index.

The reference's retrieval stack is Elasticsearch/Lucene
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10). Its BM25
benchmark uses ``multi_match``, but the SAME index answers ES
``prefix`` / ``wildcard`` / ``fuzzy`` queries — the Lucene
MultiTermQuery family any ES user switching to this engine expects.
Lucene answers them in two stages (public Lucene docs/source,
MultiTermQuery + FuzzyTermsEnum):

  1. EXPANSION: walk the term dictionary and collect the concrete
     terms the pattern matches (prefix walk / automaton intersection);
  2. REWRITE: score the expanded term set —
       - ``constant_score`` (ES default for prefix/wildcard): every
         doc containing >= 1 expanded term scores the query boost
         (1.0 here); ranking degenerates to the deterministic
         tie-break (doc_id asc), exactly Lucene's bitset rewrite.
       - ``scoring_boolean``: one SHOULD TermQuery per expanded term,
         each with its OWN idf — doc score = sum over matched terms
         of idf(df_t) * tf_norm(tf, dl).
       - fuzzy's ``top_terms_blended_freqs`` (Lucene FuzzyQuery
         default): keep the ``max_expansions`` best terms by boost
         (boost = 1 - edits/min(|q|,|t|), FuzzyTermsEnum), BLEND df
         as the max over the kept set (BlendedTermQuery), score
         sum_t boost_t * idf(df_blend) * tf_norm(tf_t, dl).

This engine's term dictionary is the build-time ``termstats`` side
table (term, df) — the FST role. Expansion is a JOIN against it, never
a driver loop:

  - prefix: an EQUI-join on ``substring(term, 1, len(prefix))``, one
    hash join per distinct prefix length (the lengths — a handful of
    small ints — are the only thing collected). No theta/BNL join
    touches the dictionary, so expansion scales to a 10^8-term
    vocabulary: each join probes the broadcast prefix set once per
    dictionary term with an O(1) hash, and everything downstream sees
    only matched terms.
  - wildcard: the literal prefix before the first metacharacter prunes
    via the same equi-join, then a JVM ``LIKE`` post-filter applies the
    full pattern (``*`` -> ``%``, ``?`` -> ``_``; both engines' LIKE
    agree). A leading-wildcard pattern has no literal prefix and
    degrades to a full dictionary scan — exactly Lucene's documented
    leading-wildcard behavior, and still dictionary-sized, not
    corpus-sized.
  - fuzzy: Levenshtein(q, t) <= max_edits constrains |len(t) - len(q)|
    <= max_edits, so candidates come from an equi-join on
    (length(term), first ``prefix_length`` chars) against the query
    side exploded to its admissible lengths — the join fans each query
    term out to at most (2*max_edits + 1) keys and only same-length-
    band terms reach the ``levenshtein`` filter. (Lucene prunes
    tighter with a Levenshtein automaton over the FST; the length band
    + shared-prefix equi-join is the relational analog and keeps the
    filter dictionary-sized.) ``transpositions=False`` spelling: both
    Spark and DuckDB ship classical Levenshtein, so the engine and the
    oracle share one distance. Boost follows Lucene's FuzzyTermsEnum:
    ``1 - edits / min(len(q), len(t))`` (exact match => 1.0).

Scoring then runs over the SAME flat posting relation as
``search_index_join`` (flatten_postings: term-pruned parquet scan ->
Arrow-batched decode), so the whole path is in-plan — queries, the
expansion, and the probe are DataFrame joins with no driver collect;
only the distinct prefix/query-term LENGTHS (small ints) touch the
driver, to enumerate the equi-join keys.

Exhaustive twins over a raw corpus (``prefix_search`` /
``fuzzy_search``) tokenize with the same analyzer and score the same
formula — the differential-test and oracle anchors (DuckDB: LIKE /
levenshtein are built-in, so every path here is value-gateable).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_ws
from sgpt_spark.functions.bm25 import B, K1, idf, idf_py, tf_norm
from sgpt_spark.operators.indexer import IndexMeta
from sgpt_spark.operators.stats import (
    CorpusStats,
    corpus_stats,
    doc_terms,
    term_df,
    term_freqs,
)
from sgpt_spark.operators.topk import topk_per_group

REWRITES = ("constant_score", "scoring_boolean")
DEFAULT_MAX_EXPANSIONS = 50  # ES fuzzy/match_phrase_prefix default


def _normalize_pairs(
    spark: SparkSession, pairs: DataFrame | Iterable[tuple], col: str
) -> DataFrame:
    """(qid, <col>) input as DataFrame or iterable-of-tuples -> DataFrame
    with the iterable qid-type rule of ``normalize_queries`` (bigint for
    ints, else string)."""
    from sgpt_spark.operators.index_search import normalize_queries

    if isinstance(pairs, DataFrame):
        cols = pairs.columns
        if "qid" not in cols or col not in cols:
            raise ValueError(f"expected columns (qid, {col}); got {cols}")
        return pairs.select("qid", col)
    rows, qid_type = normalize_queries((q, p) for q, p in pairs)
    return spark.createDataFrame(rows, f"qid {qid_type}, {col} string")


def _distinct_lengths(df: DataFrame, col: str) -> list[int]:
    """The ONLY driver-side step in expansion: the distinct LENGTHS of
    the pattern column — a handful of small ints regardless of how many
    patterns or dictionary terms exist. Includes 0/NULL so callers can
    validate or branch without a second Spark job."""
    return [
        (int(r["n"]) if r["n"] is not None else 0)
        for r in df.select(F.length(col).alias("n")).distinct().collect()
    ]


def expand_prefix(
    term_stats: DataFrame,
    prefixes: DataFrame,
    max_expansions: int | None = None,
) -> DataFrame:
    """(term, df) dictionary x (qid, prefix) -> (qid, term, df).

    One hash equi-join per distinct prefix LENGTH on
    ``substring(term, 1, L) = prefix`` with the (broadcast) prefix set —
    the scalable spelling of Lucene's FST prefix walk. Empty prefixes
    are a contract violation (they'd match the whole dictionary).

    ``max_expansions``: keep the FIRST N terms per qid in term order
    (Lucene's TopTermsScoringBooleanQueryRewrite cap; for prefix all
    boosts tie at 1.0 and Lucene's tie order is the term's natural
    order). None = unbounded — the constant_score bitset shape.
    """
    lengths = _distinct_lengths(prefixes, "prefix")
    if 0 in lengths:
        raise ValueError("empty prefix matches the whole dictionary; refuse")
    parts = []
    for L in lengths:
        p = prefixes.filter(F.length("prefix") == L)
        parts.append(
            term_stats.join(
                F.broadcast(p),
                F.substring(F.col("term"), 1, L) == F.col("prefix"),
            ).select("qid", "term", "df")
        )
    if not parts:
        return prefixes.sparkSession.createDataFrame(
            [], "qid string, term string, df long"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if max_expansions is not None:
        w = Window.partitionBy("qid").orderBy(F.col("term").asc())
        out = (
            out.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= int(max_expansions))
            .drop("_r")
        )
    return out


def wildcard_literal_prefix(pattern: str) -> str:
    """The literal run before the first ``*``/``?`` metacharacter —
    the dictionary-prune key (Lucene extracts the same prefix from the
    wildcard automaton)."""
    out = []
    for ch in pattern:
        if ch in "*?":
            break
        out.append(ch)
    return "".join(out)


def expand_wildcard(
    term_stats: DataFrame,
    patterns: DataFrame,
    max_expansions: int | None = None,
) -> DataFrame:
    """(term, df) x (qid, pattern) -> (qid, term, df) for ES ``wildcard``
    patterns (``*`` = any run, ``?`` = any one char).

    Prune with the literal-prefix equi-join (per distinct prefix
    length), then post-filter with SQL LIKE (``*``->``%``, ``?``->``_``,
    LIKE metacharacters escaped). Patterns with no literal prefix scan
    the whole dictionary — Lucene's leading-wildcard caveat, still
    dictionary-sized.
    """
    esc = F.regexp_replace(F.col("pattern"), r"([%_\\])", r"\\$1")
    like = F.translate(esc, "*?", "%_")
    # literal prefix = chars before the first metachar (Spark `least`
    # skips NULLs; neither metachar present -> whole pattern)
    pats = patterns.select(
        "qid",
        F.col("pattern"),
        F.expr(
            "substring(pattern, 1, coalesce("
            "least(nullif(instr(pattern, '*'), 0), nullif(instr(pattern, '?'), 0)) - 1,"
            " length(pattern)))"
        ).alias("prefix"),
        like.alias("_like"),
    )
    parts = []
    for L in _distinct_lengths(pats, "prefix"):
        if L == 0:
            # leading wildcard: no prune key — cross the (tiny) pattern
            # set with the dictionary; the LIKE below is the only filter
            no_pfx = pats.filter(F.length("prefix") == 0)
            parts.append(
                term_stats.crossJoin(
                    F.broadcast(no_pfx.select("qid", "_like"))
                ).select("qid", "term", "df", "_like")
            )
            continue
        p = pats.filter(F.length("prefix") == L)
        parts.append(
            term_stats.join(
                F.broadcast(p),
                F.substring(F.col("term"), 1, L) == F.col("prefix"),
            ).select("qid", "term", "df", "_like")
        )
    if not parts:
        return patterns.sparkSession.createDataFrame(
            [], "qid string, term string, df long"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.filter(F.expr(r"term like _like escape '\\'")).select(
        "qid", "term", "df"
    )
    if max_expansions is not None:
        w = Window.partitionBy("qid").orderBy(F.col("term").asc())
        out = (
            out.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= int(max_expansions))
            .drop("_r")
        )
    return out


# Leading run of regex-literal characters (chars before the first
# Java-regex metacharacter) — the regexp analog of the wildcard
# literal prefix.
_REGEX_LITERAL_RUN = r"^[^.?+*|(){}\[\]\\^$]*"


def expand_regexp(
    term_stats: DataFrame,
    patterns: DataFrame,
    max_expansions: int | None = None,
) -> DataFrame:
    """(term, df) x (qid, pattern) -> (qid, term, df) for ES ``regexp``
    patterns — the last member of the Lucene MultiTermQuery expansion
    family (prefix / wildcard / fuzzy / regexp).

    Dialect: Java regex (Spark ``RLIKE``), matched against the WHOLE
    term (Lucene regexp is implicitly anchored; the pattern is wrapped
    ``^(?:...)$``). Lucene's own syntax (RegExp class, ``~``/``<>``
    operators) is a documented divergence — the standard
    class/alternation/quantifier core agrees.

    Prune: the leading LITERAL run (chars before the first regex
    metacharacter) plays the wildcard literal prefix — minus one char
    when the first metachar is a quantifier (``*?+{`` quantify the
    PREVIOUS char: ``ab*c`` matches "ac", so only "a" is certain).
    Lucene extracts the same bound from the automaton's common prefix.
    A pattern with no literal prefix scans the dictionary (the
    leading-wildcard caveat; still dictionary-sized, never corpus-
    sized). Per distinct prefix LENGTH (the only driver-side step) the
    dictionary equi-joins on ``substring(term, 1, L)``; the anchored
    RLIKE post-filter applies the full pattern JVM-side.
    """
    lit = F.regexp_extract(F.col("pattern"), _REGEX_LITERAL_RUN, 0)
    quantified = F.expr(
        "length(_lit) < length(pattern) AND "
        "substring(pattern, length(_lit) + 1, 1) IN ('*', '?', '+', '{')"
    )
    pats = (
        patterns.select("qid", "pattern", lit.alias("_lit"))
        .select(
            "qid",
            F.when(quantified, F.expr("substring(_lit, 1, length(_lit) - 1)"))
            .otherwise(F.col("_lit"))
            .alias("prefix"),
            F.concat(F.lit("^(?:"), F.col("pattern"), F.lit(")$")).alias("_re"),
        )
    )
    parts = []
    for L in _distinct_lengths(pats, "prefix"):
        if L == 0:
            no_pfx = pats.filter(F.length("prefix") == 0)
            parts.append(
                term_stats.crossJoin(
                    F.broadcast(no_pfx.select("qid", "_re"))
                ).select("qid", "term", "df", "_re")
            )
            continue
        p = pats.filter(F.length("prefix") == L)
        parts.append(
            term_stats.join(
                F.broadcast(p),
                F.substring(F.col("term"), 1, L) == F.col("prefix"),
            ).select("qid", "term", "df", "_re")
        )
    if not parts:
        return patterns.sparkSession.createDataFrame(
            [], "qid string, term string, df long"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.filter(F.expr("term rlike _re")).select("qid", "term", "df")
    if max_expansions is not None:
        w = Window.partitionBy("qid").orderBy(F.col("term").asc())
        out = (
            out.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= int(max_expansions))
            .drop("_r")
        )
    return out


def expand_fuzzy(
    term_stats: DataFrame,
    qterms: DataFrame,
    max_edits: int = 2,
    prefix_length: int = 0,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """(term, df) x (qid, qterm) -> (qid, term, df, boost) — the terms
    within ``max_edits`` classical Levenshtein of each query term.

    Candidate generation is an equi-join: the query side explodes to
    its admissible term lengths (len(q) - e .. len(q) + e) and, when
    ``prefix_length`` > 0, carries the shared prefix as a second join
    key (Lucene FuzzyQuery's prefix_length — edits never touch the
    first p chars). Only the length-band/prefix survivors reach the
    ``levenshtein`` filter. Boost = 1 - edits/min(len(q), len(t))
    (FuzzyTermsEnum); the top ``max_expansions`` per qid by
    (boost desc, term asc) survive — Lucene's top-terms priority queue.
    """
    if max_edits < 0:
        raise ValueError("max_edits must be >= 0")
    p = int(prefix_length)
    qterms = qterms.filter(F.length("qterm") > 0)
    q = qterms.select(
        "qid",
        F.col("qterm"),
        F.length("qterm").alias("_qlen"),
        F.explode(
            F.sequence(
                F.greatest(F.length("qterm") - max_edits, F.lit(1)),
                F.length("qterm") + max_edits,
            )
        ).alias("_tlen"),
    )
    cond = F.length(F.col("term")) == F.col("_tlen")
    if p > 0:
        cond = cond & (
            F.substring(F.col("term"), 1, p) == F.substring(F.col("qterm"), 1, p)
        )
    cand = term_stats.join(F.broadcast(q), cond).withColumn(
        "_ed", F.levenshtein(F.col("term"), F.col("qterm"))
    )
    cand = cand.filter(F.col("_ed") <= max_edits).withColumn(
        "boost",
        F.lit(1.0)
        - F.col("_ed") / F.least(F.col("_qlen"), F.length("term")).cast("double"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("boost").desc(), F.col("term").asc())
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= int(max_expansions))
        .select("qid", "term", "df", "boost")
    )


def _score_expansions(
    flat: DataFrame,
    expansions: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int,
    rewrite: str,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared rewrite over the flat (term, doc_id, tf, doc_len) posting
    relation: constant_score -> distinct matched docs at score 1.0
    (ranking = doc_id tie-break, Lucene's bitset rewrite);
    scoring_boolean -> sum of per-term BM25 with each term's own idf."""
    if rewrite not in REWRITES:
        raise ValueError(f"unknown rewrite {rewrite!r}: use {'|'.join(REWRITES)}")
    joined = flat.join(expansions, "term")
    if rewrite == "constant_score":
        scored = (
            joined.select("qid", "doc_id")
            .distinct()
            .withColumn("score", F.lit(1.0))
        )
    else:
        scored = (
            joined.select(
                "qid",
                "doc_id",
                (
                    idf(F.col("df"), float(n_docs))
                    * tf_norm(F.col("tf"), F.col("doc_len"), float(avgdl), k1, b)
                ).alias("s"),
            )
            .groupBy("qid", "doc_id")
            .agg(F.sum("s").alias("score"))
        )
    return topk_per_group(scored, k=k).select("qid", "doc_id", "score", "rank")


def _index_flat_for(postings: DataFrame, expansions: DataFrame, codec: str) -> DataFrame:
    """Prune the compressed postings to the expanded vocabulary BEFORE
    decoding (left-semi on term, same shape as search_index_join), then
    flatten to (term, doc_id, tf, doc_len)."""
    from sgpt_spark.operators.index_search import flatten_postings

    cand = postings.join(expansions.select("term").distinct(), "term", "left_semi")
    return flatten_postings(cand, codec=codec)


def prefix_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    prefixes: DataFrame | Iterable[tuple],
    k: int = 10,
    rewrite: str = "constant_score",
    term_stats: DataFrame | None = None,
    max_expansions: int | None = None,
    strategy: str = "join",
) -> DataFrame:
    """ES ``prefix`` query over the compressed index -> RESULTS
    (qid, doc_id, score, rank). ``prefixes``: (qid, prefix) rows.

    strategy:
      'join'  fully in-plan (no driver collect of queries or terms;
              only the distinct prefix lengths). ``scoring_boolean``
              requests execute on the COGROUP kernel (r6): the in-plan
              expansion feeds the numpy TAAT kernel by-presence
              (``_cogroup_weighted``) — value-identical to the
              relational spelling (tested) and ~5x cheaper, since the
              relational probe pays JVM row materialization per
              (expanded term, posting). ``constant_score`` stays on the
              relational bitset spelling (a set operation).
      'relational'  pin the pure relational probe + groupBy spelling
              (the verification twin).
      'taat'  collect the (bounded — max_expansions required) expansion
              set and score with the search_index TAAT kernels
              (interactive path); scoring_boolean only.

    The dictionary must exist — pass ``term_stats`` or have
    {path}/termstats readable via the caller (read_index exposes it).
    """
    prefixes = _normalize_pairs(spark, prefixes, "prefix")
    if term_stats is None:
        term_stats = postings.filter(F.col("term").isNotNull()).groupBy("term").agg(
            F.sum("df").alias("df")
        )
    exp = expand_prefix(term_stats, prefixes, max_expansions=max_expansions)
    if strategy == "taat":
        _check_taat_args(rewrite, max_expansions)
        qid_type = prefixes.schema["qid"].dataType.simpleString()
        return _scoring_boolean_taat(spark, postings, meta, exp, qid_type, k)
    if strategy not in ("join", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use join|relational|taat"
        )
    if strategy == "join" and rewrite == "scoring_boolean":
        qtw = exp.select(
            "qid", "term", idf(F.col("df"), float(meta.n_docs)).alias("w")
        )
        return _cogroup_weighted(
            spark, postings, meta, qtw,
            prefixes.schema["qid"].dataType.simpleString(), k,
        )
    flat = _index_flat_for(postings, exp, meta.codec)
    return _score_expansions(
        flat, exp, meta.n_docs, meta.avgdl, k, rewrite, meta.k1, meta.b
    )


def wildcard_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    patterns: DataFrame | Iterable[tuple],
    k: int = 10,
    rewrite: str = "constant_score",
    term_stats: DataFrame | None = None,
    max_expansions: int | None = None,
    strategy: str = "join",
) -> DataFrame:
    """ES ``wildcard`` query over the compressed index. ``patterns``:
    (qid, pattern) rows with ``*``/``?`` metacharacters. ``strategy``
    as in ``prefix_search_index`` ('taat' = collected bounded expansion
    + TAAT kernels, scoring_boolean only)."""
    patterns = _normalize_pairs(spark, patterns, "pattern")
    if term_stats is None:
        term_stats = postings.filter(F.col("term").isNotNull()).groupBy("term").agg(
            F.sum("df").alias("df")
        )
    exp = expand_wildcard(term_stats, patterns, max_expansions=max_expansions)
    if strategy == "taat":
        _check_taat_args(rewrite, max_expansions)
        qid_type = patterns.schema["qid"].dataType.simpleString()
        return _scoring_boolean_taat(spark, postings, meta, exp, qid_type, k)
    if strategy not in ("join", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use join|relational|taat"
        )
    if strategy == "join" and rewrite == "scoring_boolean":
        qtw = exp.select(
            "qid", "term", idf(F.col("df"), float(meta.n_docs)).alias("w")
        )
        return _cogroup_weighted(
            spark, postings, meta, qtw,
            patterns.schema["qid"].dataType.simpleString(), k,
        )
    flat = _index_flat_for(postings, exp, meta.codec)
    return _score_expansions(
        flat, exp, meta.n_docs, meta.avgdl, k, rewrite, meta.k1, meta.b
    )


def regexp_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    patterns: DataFrame | Iterable[tuple],
    k: int = 10,
    rewrite: str = "constant_score",
    term_stats: DataFrame | None = None,
    max_expansions: int | None = None,
    strategy: str = "join",
) -> DataFrame:
    """ES ``regexp`` query over the compressed index. ``patterns``:
    (qid, pattern) rows in Java-regex dialect, whole-term anchored (see
    ``expand_regexp``). ``rewrite``/``strategy`` as in
    ``wildcard_search_index`` (ES default constant_score)."""
    patterns = _normalize_pairs(spark, patterns, "pattern")
    if term_stats is None:
        term_stats = postings.filter(F.col("term").isNotNull()).groupBy("term").agg(
            F.sum("df").alias("df")
        )
    exp = expand_regexp(term_stats, patterns, max_expansions=max_expansions)
    if strategy == "taat":
        _check_taat_args(rewrite, max_expansions)
        qid_type = patterns.schema["qid"].dataType.simpleString()
        return _scoring_boolean_taat(spark, postings, meta, exp, qid_type, k)
    if strategy not in ("join", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use join|relational|taat"
        )
    if strategy == "join" and rewrite == "scoring_boolean":
        qtw = exp.select(
            "qid", "term", idf(F.col("df"), float(meta.n_docs)).alias("w")
        )
        return _cogroup_weighted(
            spark, postings, meta, qtw,
            patterns.schema["qid"].dataType.simpleString(), k,
        )
    flat = _index_flat_for(postings, exp, meta.codec)
    return _score_expansions(
        flat, exp, meta.n_docs, meta.avgdl, k, rewrite, meta.k1, meta.b
    )


def fuzzy_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    qterms: DataFrame | Iterable[tuple],
    k: int = 10,
    max_edits: int = 2,
    prefix_length: int = 0,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    term_stats: DataFrame | None = None,
    strategy: str = "join",
) -> DataFrame:
    """ES ``fuzzy`` query over the compressed index -> RESULTS
    (qid, doc_id, score, rank). ``qterms``: (qid, qterm) rows, one term
    per query (the ES fuzzy query is single-term; match+fuzziness runs
    one expansion per analyzed token and sums — compose upstream).

    Scoring follows Lucene's ``top_terms_blended_freqs`` rewrite: the
    kept expansion set shares ONE blended df (the max over the set,
    BlendedTermQuery), each term weighted by its fuzzy boost:

        score(q, d) = sum_t boost_t * idf(df_blend_q) * tf_norm(tf_t, dl)

    ``strategy`` as in ``prefix_search_index``: 'join' keeps everything
    in-plan (unbounded query sets); 'taat' collects the expansion set
    (always bounded here — max_expansions defaults to 50) and scores
    with the search_index TAAT kernels, ~an order of magnitude faster
    per query batch.
    """
    qterms = _normalize_pairs(spark, qterms, "qterm")
    if term_stats is None:
        term_stats = postings.filter(F.col("term").isNotNull()).groupBy("term").agg(
            F.sum("df").alias("df")
        )
    exp = expand_fuzzy(
        term_stats,
        qterms,
        max_edits=max_edits,
        prefix_length=prefix_length,
        max_expansions=max_expansions,
    )
    if strategy == "taat":
        # bounded: max_expansions x |queries|; Arrow toPandas (see
        # _scoring_boolean_taat)
        pdf = exp.select("qid", "term", "df", "boost").toPandas()
        blend_py: dict = {}
        for qid, df_ in zip(pdf["qid"], pdf["df"]):
            blend_py[qid] = max(blend_py.get(qid, 0), int(df_))
        per_query: dict = {}
        for qid, term, boost in zip(pdf["qid"], pdf["term"], pdf["boost"]):
            per_query.setdefault(qid, []).append(
                (term, boost * idf_py(blend_py[qid], meta.n_docs))
            )
        qid_type = qterms.schema["qid"].dataType.simpleString()
        return _taat_weighted(spark, postings, meta, per_query, qid_type, k)
    if strategy not in ("join", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use join|relational|taat"
        )
    blend = exp.groupBy("qid").agg(F.max("df").alias("df_blend"))
    exp_b = exp.join(blend, "qid")
    if strategy == "join":
        # r6: in-plan expansion feeds the cogroup TAAT kernel — the
        # blended weight boost_t * idf(df_blend) compiles in codegen,
        # value-identical to the relational probe (tested)
        qtw = exp_b.select(
            "qid",
            "term",
            (F.col("boost") * idf(F.col("df_blend"), float(meta.n_docs))).alias("w"),
        )
        return _cogroup_weighted(
            spark, postings, meta, qtw,
            qterms.schema["qid"].dataType.simpleString(), k,
        )
    flat = _index_flat_for(postings, exp_b, meta.codec)
    scored = (
        flat.join(exp_b, "term")
        .select(
            "qid",
            "doc_id",
            (
                F.col("boost")
                * idf(F.col("df_blend"), float(meta.n_docs))
                * tf_norm(F.col("tf"), F.col("doc_len"), meta.avgdl, meta.k1, meta.b)
            ).alias("s"),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("s").alias("score"))
    )
    return topk_per_group(scored, k=k).select("qid", "doc_id", "score", "rank")


# --- in-plan cogroup kernel strategy (r6) ----------------------------------


def _cogroup_weighted(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    qtw: DataFrame,
    qid_type: str,
    k: int,
    required: DataFrame | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """In-plan kernel execution for an EXPANDED weight relation ``qtw``
    = (qid, term, w): the expansion never touches the driver (the
    ``search_index_cogroup`` contract), and each segment scores with
    the same numpy TAAT kernels as the collect path.

    Replication is BY PRESENCE, not a segment cross join: a (qid, term)
    weight row ships only to segments that actually HOLD the term (one
    inner join against the (segment, term) posting keys), so the
    replication row count is sum_t |segments(t)| — for the rare terms a
    dictionary expansion mostly yields, about 1 row per (qid, term) —
    instead of |expansion| x n_segments. A segment never misses a
    needed weight: absent (term, segment) pairs have no postings to
    score there.

    ``required``: optional (qid, req) minimum-matched-clause gate (the
    ``score_candidates`` semantics — qtf units; every qtw row carries
    qtf=1 here, so req counts matched terms), applied inside the kernel
    per segment (globally correct: a doc lives in one segment).
    ``exclude_self`` drops doc_id == qid rows with the search_index
    k+1-per-segment spare so the global page never starves."""
    import numpy as np  # noqa: F401  (kernel deps resolved in imports below)
    import pandas as pd

    from sgpt_spark.operators.index_search import (
        _decode_terms,
        _emit_topk_frame,
        _query_maps,
        _taat_parts,
    )

    if exclude_self and qid_type not in (
        "bigint", "int", "long", "smallint", "tinyint"
    ):
        raise ValueError(
            f"exclude_self needs integer qids matching index doc ids; "
            f"got qid type {qid_type}"
        )
    seg_schema = f"qid {qid_type}, doc_id long, score double"
    cand = postings.join(
        qtw.select("term").distinct(), "term", "left_semi"
    ).select("segment", "term", "blocks")
    # explicit dataset aliases — qtw may derive from postings (the
    # term_stats fallback aggregates it), so the presence join is a
    # self-join the analyzer otherwise rejects as ambiguous
    presence = postings.select(
        F.col("segment").cast("int").alias("segment"),
        F.col("term").cast("string").alias("term"),
    ).alias("_mt_presence")
    qtw_a = qtw.alias("_mt_qtw")
    qseg = qtw_a.join(
        presence, F.col("_mt_qtw.term") == F.col("_mt_presence.term")
    ).select(
        F.col("_mt_presence.segment").alias("segment"),
        F.col("_mt_qtw.qid").alias("qid"),
        F.col("_mt_qtw.term").alias("term"),
        F.lit(1).alias("qtf"),
        F.col("_mt_qtw.w").alias("w"),
    )
    if required is not None:
        qseg = qseg.join(required, "qid", "left").withColumn(
            "req", F.coalesce(F.col("req"), F.lit(0)).cast("int")
        )
    codec, k1, b_, avgdl = meta.codec, meta.k1, meta.b, meta.avgdl
    kk = int(k) + 1 if exclude_self else int(k)

    def score(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        if len(pleft) == 0 or len(pright) == 0:
            return _emit_topk_frame([])
        decoded = _decode_terms(pleft["term"], pleft["blocks"], codec, k1, b_, avgdl)
        if not decoded:
            return _emit_topk_frame([])
        qid_list, tmap, per_query = _query_maps(
            pright["qid"], pright["term"], pright["w"], pright["qtf"]
        )
        msm_b = (
            {q: int(r) for q, r in zip(pright["qid"], pright["req"])}
            if "req" in pright.columns
            else None
        )
        return _emit_topk_frame(
            _taat_parts(decoded, qid_list, tmap, per_query, kk, msm=msm_b)
        )

    seg_topk = (
        cand.groupBy("segment")
        .cogroup(qseg.groupBy("segment"))
        .applyInPandas(score, schema=seg_schema)
    )
    if exclude_self:
        seg_topk = seg_topk.filter(F.col("doc_id") != F.col("qid"))
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")


# --- collect-path TAAT strategy (interactive speed) -----------------------


def _taat_weighted(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    per_query: dict,
    qid_type: str,
    k: int,
) -> DataFrame:
    """Weighted-OR TAAT over the compressed index for an EXPANDED term
    set: ``per_query`` = {qid: [(term, weight)]}, scored with the same
    segment kernels as ``search_index`` strategy='taat'
    (``_decode_terms``/``_taat_parts``/``_emit_topk_frame``) — decode
    each candidate term once per segment, one numpy scatter-add per
    (term, query-chunk), <= k rows per (query, segment) shuffled.

    This is the collect-path speed contract: the caller has already
    collected the expansions (bounded by max_expansions x |queries|),
    exactly the ``collect_query_terms`` contract of ``search_index``.
    The relational 'join' strategy remains the unbounded-query-set path.
    """
    import numpy as np
    import pandas as pd

    from sgpt_spark.operators.index_search import (
        _decode_terms,
        _emit_topk_frame,
        _taat_parts,
    )

    seg_schema = f"qid {qid_type}, doc_id long, score double"
    terms = sorted({t for tws in per_query.values() for t, _ in tws})
    if not terms:
        return spark.createDataFrame([], seg_schema + ", rank int")
    if len(terms) <= 2048:
        cand = postings.filter(F.col("term").isin(terms))
    else:
        # a 100k-literal In() predicate bloats the plan (compile +
        # serialize per task); past Lucene's maxClauseCount-sized sets,
        # semi-join a term relation instead (broadcast-sized)
        tdf = spark.createDataFrame([(t,) for t in terms], "term string")
        cand = postings.join(F.broadcast(tdf), "term", "left_semi")
    qid_list = sorted(per_query)
    qrow = {q: i for i, q in enumerate(qid_list)}
    term_to_q: dict = {}
    pq3: dict = {}
    for qid, tws in per_query.items():
        pq3[qid] = [(t, w, 1) for t, w in tws]
        for t, w in tws:
            term_to_q.setdefault(t, ([], []))
            term_to_q[t][0].append(qrow[qid])
            term_to_q[t][1].append(w)
    bcast = spark.sparkContext.broadcast(
        (
            qid_list,
            {
                t: (np.asarray(r), np.asarray(w), np.ones(len(r), dtype=np.int16))
                for t, (r, w) in term_to_q.items()
            },
            pq3,
        )
    )
    codec, k1, b_, avgdl = meta.codec, meta.k1, meta.b, meta.avgdl

    def wrapper(batches):
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        qids_b, tmap, pq = bcast.value
        for seg in pdf["segment"].unique():
            sub = pdf[pdf["segment"] == seg]
            decoded = _decode_terms(sub["term"], sub["blocks"], codec, k1, b_, avgdl)
            if decoded:
                yield _emit_topk_frame(_taat_parts(decoded, qids_b, tmap, pq, k))

    seg_topk = cand.repartition("segment").mapInPandas(wrapper, schema=seg_schema)
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")


def _check_taat_args(rewrite: str | None, max_expansions: int | None) -> None:
    if rewrite is not None and rewrite != "scoring_boolean":
        raise ValueError(
            "strategy='taat' needs rewrite='scoring_boolean' — the "
            "constant_score bitset rewrite is a set operation, use the "
            "relational 'join' strategy for it"
        )
    if max_expansions is None:
        raise ValueError(
            "strategy='taat' collects the expansions to the driver — "
            "pass max_expansions (Lucene caps scoring rewrites at "
            "BooleanQuery.maxClauseCount=1024 for the same reason)"
        )


def _scoring_boolean_taat(
    spark: SparkSession, postings: DataFrame, meta: IndexMeta,
    exp: DataFrame, qid_type: str, k: int,
) -> DataFrame:
    # bounded: max_expansions x |queries|; Arrow toPandas — a Row-object
    # collect of a 6-figure expansion set costs seconds of pure driver
    # deserialization
    pdf = exp.select("qid", "term", "df").toPandas()
    per_query: dict = {}
    for qid, term, df_ in zip(pdf["qid"], pdf["term"], pdf["df"]):
        per_query.setdefault(qid, []).append(
            (term, idf_py(int(df_), meta.n_docs))
        )
    return _taat_weighted(spark, postings, meta, per_query, qid_type, k)


# --- exhaustive twins over a raw corpus (differential-test / oracle
# --- anchors; same analyzer, same formulas) ------------------------------


def _corpus_relations(corpus: DataFrame, tokenizer, id_col: str, text_col: str):
    dt = doc_terms(corpus, id_col=id_col, text_col=text_col, tokenizer=tokenizer)
    tfs = term_freqs(dt)  # already carries denormalized doc_len
    dfs = term_df(tfs)
    stats = corpus_stats(dt)
    flat = tfs.select("term", "doc_id", "tf", "doc_len")
    return flat, dfs, stats


def prefix_search(
    corpus: DataFrame,
    prefixes: DataFrame | Iterable[tuple],
    k: int = 10,
    rewrite: str = "constant_score",
    tokenizer=tokenize_ws,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    max_expansions: int | None = None,
) -> DataFrame:
    """Exhaustive twin of ``prefix_search_index`` (tokenize the corpus
    in-plan instead of reading the persisted index)."""
    spark = corpus.sparkSession
    prefixes = _normalize_pairs(spark, prefixes, "prefix")
    flat, dfs, stats = _corpus_relations(corpus, tokenizer, id_col, text_col)
    exp = expand_prefix(dfs, prefixes, max_expansions=max_expansions)
    return _score_expansions(flat, exp, stats.n_docs, stats.avgdl, k, rewrite, k1, b)


def wildcard_search(
    corpus: DataFrame,
    patterns: DataFrame | Iterable[tuple],
    k: int = 10,
    rewrite: str = "constant_score",
    tokenizer=tokenize_ws,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    max_expansions: int | None = None,
) -> DataFrame:
    """Exhaustive twin of ``wildcard_search_index``."""
    spark = corpus.sparkSession
    patterns = _normalize_pairs(spark, patterns, "pattern")
    flat, dfs, stats = _corpus_relations(corpus, tokenizer, id_col, text_col)
    exp = expand_wildcard(dfs, patterns, max_expansions=max_expansions)
    return _score_expansions(flat, exp, stats.n_docs, stats.avgdl, k, rewrite, k1, b)


def regexp_search(
    corpus: DataFrame,
    patterns: DataFrame | Iterable[tuple],
    k: int = 10,
    rewrite: str = "constant_score",
    tokenizer=tokenize_ws,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    max_expansions: int | None = None,
) -> DataFrame:
    """Exhaustive twin of ``regexp_search_index``."""
    spark = corpus.sparkSession
    patterns = _normalize_pairs(spark, patterns, "pattern")
    flat, dfs, stats = _corpus_relations(corpus, tokenizer, id_col, text_col)
    exp = expand_regexp(dfs, patterns, max_expansions=max_expansions)
    return _score_expansions(flat, exp, stats.n_docs, stats.avgdl, k, rewrite, k1, b)


def fuzzy_search(
    corpus: DataFrame,
    qterms: DataFrame | Iterable[tuple],
    k: int = 10,
    max_edits: int = 2,
    prefix_length: int = 0,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    tokenizer=tokenize_ws,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Exhaustive twin of ``fuzzy_search_index``."""
    spark = corpus.sparkSession
    qterms = _normalize_pairs(spark, qterms, "qterm")
    flat, dfs, stats = _corpus_relations(corpus, tokenizer, id_col, text_col)
    exp = expand_fuzzy(
        dfs,
        qterms,
        max_edits=max_edits,
        prefix_length=prefix_length,
        max_expansions=max_expansions,
    )
    blend = exp.groupBy("qid").agg(F.max("df").alias("df_blend"))
    exp_b = exp.join(blend, "qid")
    scored = (
        flat.join(exp_b, "term")
        .select(
            "qid",
            "doc_id",
            (
                F.col("boost")
                * idf(F.col("df_blend"), float(stats.n_docs))
                * tf_norm(F.col("tf"), F.col("doc_len"), stats.avgdl, k1, b)
            ).alias("s"),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("s").alias("score"))
    )
    return topk_per_group(scored, k=k).select("qid", "doc_id", "score", "rank")
