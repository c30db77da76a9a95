"""ES ``simple_query_string`` — the user-facing mini query LANGUAGE
(Lucene SimpleQueryParser role): one string per query mixing bare
terms, ``+term`` (must), ``-term`` (must_not), and ``"a b"`` phrases,
compiled into the engine's existing gated machinery.

Supported syntax (the documented subset — the operators the reference's
ES indexes answer today):

    token        a SHOULD term clause (default_operator='or'; 'and'
                 makes bare tokens MUST — the ES default_operator knob)
    +token       a MUST term clause
    -token       a MUST_NOT term clause (binary: never scores)
    "a b c"      a phrase clause (Lucene PhraseQuery slop=0), with the
                 same +/- prefixes
    "a b c"~N    a SLOPPY phrase clause (Lucene SloppyPhraseQuery,
                 ``operators.sloppy``) — N position moves allowed,
                 fractional sloppy frequency through the same BM25
    ES's ``|``/``(`` grouping, ``~N`` fuzziness AFTER A TERM and ``*``
    prefix suffixes are a documented divergence (their standalone
    families — bool occurs, fuzzy/prefix/regexp expansion — are
    separate gated operators; the flat +/-/phrase[~N] core is what
    this parser compiles).

Parsing is FULLY IN-PLAN (JVM regexp_extract_all + posexplode + CASE
columns — no driver loop, no UDF), so a billion-row query-string table
parses distributively. Malformed input is lenient the ES way: a quote
pairs with the NEXT quote, a quote with no partner degrades its tail
to bare terms, a lone ``+``/``-`` or empty phrase is dropped.

Execution model (the relational spelling of Lucene's BooleanQuery over
per-clause scorers):

  1. every clause becomes a row (qid, cid, occur, kind, clause);
  2. TERM clauses score through the block postings exactly like the
     gated match path (``funcscore.match_scores`` — term-pruned scan,
     in-plan probe; one relation for ALL clauses keyed by a composite
     uid, so clause count never multiplies scans);
  3. PHRASE clauses score through the positional sidecar
     (``positions.phrase_hits_index`` — ALL hits, Lucene PhraseQuery
     BM25), one call for all phrase clauses;
  4. ONE groupBy(qid, doc_id) folds the union: sum of scoring-clause
     scores (must_not never scores), matched-must count, must_not flag,
     matched-should count;
  5. constraints filter (all musts matched, no must_not, ES
     minimum_should_match default: 1 when no must/filter clause else
     0), then the engine's rounded top-k window.

Candidate-driven contract (same as boolquery): a pure-negation query
string has no positive clause to drive candidates and is refused
loudly under ``validate=True`` (default; one bounded aggregate job) —
ES would match all documents, which no index-driven engine enumerates.

Scale shape: the union relation is bounded by the clause terms' dfs +
phrase member dfs (never |corpus|); the fold is one map-side-combinable
groupBy; phrase clauses ride the phrase family's documented contract
(collect-bounded batch; the cogroup in-plan twin exists in
positions.py for unbounded sets).

Reference seam: the reference drives ES with programmatic query bodies
(crossencoder/beir/crossencoder_beir_bm25.ipynb); simple_query_string
is the same index's interactive front door (SURVEY.md §2.5 ES-parity).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.topk import topk_per_group

# one clause token: an optionally-signed quoted phrase with an optional
# ~N slop tail, or an optionally-signed bare word (quotes excluded so an
# unclosed quote degrades to bare terms — the ES lenient behavior)
_CLAUSE_TOKEN_RE = r'[+\-]?"[^"]*"(?:~[0-9]+)?|[+\-]?[^\s"]+'

# composite (qid, cid) key separator for the shared score relations —
# U+001F unit separator, not a character an analyzed term can contain
_SEP = "\x1f"

_OPERATORS = ("or", "and")


def parse_simple_query_string(
    queries: DataFrame, default_operator: str = "or"
) -> DataFrame:
    """(qid, query) -> one row per clause: (qid, cid, occur, kind,
    clause, slop); cid = 0-based clause position, occur in
    must/should/must_not, kind in term/phrase, slop = the phrase's ~N
    tail (0 when absent or for term clauses). Pure JVM columns."""
    if default_operator not in _OPERATORS:
        raise ValueError(
            f"default_operator {default_operator!r} not in {_OPERATORS}"
        )
    bare = "must" if default_operator == "and" else "should"
    toks = F.regexp_extract_all(F.col("query"), F.lit(_CLAUSE_TOKEN_RE), 0)
    first = F.substring("tok", 1, 1)
    body = F.when(first.isin("+", "-"), F.expr("substring(tok, 2)")).otherwise(
        F.col("tok")
    )
    exploded = queries.select(
        "qid", F.posexplode(toks).alias("cid", "tok")
    ).withColumn("_body", body)
    is_phrase = F.col("_body").rlike('^"[^"]*"(~[0-9]+)?$') & (
        F.length("_body") >= 2
    )
    clause = F.when(
        is_phrase, F.trim(F.regexp_extract(F.col("_body"), '^"([^"]*)"', 1))
    ).otherwise(F.col("_body"))
    # ES "..."~N phrase slop (Lucene SloppyPhraseQuery); absent tail = 0
    slop_c = F.when(
        is_phrase,
        F.coalesce(
            F.regexp_extract(F.col("_body"), "~([0-9]+)$", 1).try_cast("int"),
            F.lit(0),
        ),
    ).otherwise(F.lit(0))
    occur = (
        F.when(first == "+", F.lit("must"))
        .when(first == "-", F.lit("must_not"))
        .otherwise(F.lit(bare))
    )
    return (
        exploded.select(
            "qid",
            "cid",
            occur.alias("occur"),
            F.when(is_phrase, F.lit("phrase")).otherwise(F.lit("term")).alias(
                "kind"
            ),
            clause.alias("clause"),
            slop_c.alias("slop"),
        )
        .filter(F.length(F.trim("clause")) > 0)
    )


def _uid(qid_col, cid_col):
    return F.concat(qid_col.cast("string"), F.lit(_SEP), cid_col.cast("string"))


def _combine(
    parsed: DataFrame,
    clause_scores: DataFrame,
    qid_field,
    k: int,
    minimum_should_match: int | None,
) -> DataFrame:
    """(per-clause scores keyed by uid) x (clause meta) -> constrained
    summed top-k. ``clause_scores``: (uid, doc_id, score)."""
    meta = parsed.select(
        _uid(F.col("qid"), F.col("cid")).alias("uid"), "qid", "cid", "occur"
    )
    scored = clause_scores.join(meta, "uid").select(
        "qid", "cid", "occur", "doc_id", "score"
    )
    per_doc = scored.groupBy("qid", "doc_id").agg(
        F.sum(
            F.when(F.col("occur") != "must_not", F.col("score")).otherwise(F.lit(0.0))
        ).alias("score"),
        F.count_distinct(
            F.when(F.col("occur") == "must", F.col("cid"))
        ).alias("_must_hit"),
        F.max((F.col("occur") == "must_not").cast("int")).alias("_neg"),
        F.count_distinct(
            F.when(F.col("occur") == "should", F.col("cid"))
        ).alias("_should_hit"),
    )
    counts = parsed.groupBy("qid").agg(
        F.count_distinct(
            F.when(F.col("occur") == "must", F.col("cid"))
        ).alias("_n_must"),
    )
    per_doc = per_doc.join(counts, "qid")
    if minimum_should_match is None:
        # ES default: 1 when the query has no must clause, else 0
        msm = F.when(F.col("_n_must") == 0, F.lit(1)).otherwise(F.lit(0))
    else:
        msm = F.lit(int(minimum_should_match))
    kept = per_doc.filter(
        (F.col("_must_hit") == F.col("_n_must"))
        & (F.col("_neg") == 0)
        & (F.col("_should_hit") >= msm)
    ).select("qid", "doc_id", "score")
    out = topk_per_group(kept, k=k)
    return out.withColumn("qid", F.col("qid").cast(qid_field.dataType))


def _validate_positive(parsed: DataFrame) -> None:
    """Refuse pure-negation query strings loudly (one bounded job)."""
    bad = (
        parsed.groupBy("qid")
        .agg(
            F.sum((F.col("occur") != "must_not").cast("int")).alias("_pos")
        )
        .filter(F.col("_pos") == 0)
        .limit(5)
        .collect()
    )
    if bad:
        raise ValueError(
            "pure-negation query strings (no positive clause) are "
            f"candidate-driven-unanswerable, e.g. qids {[r['qid'] for r in bad]} "
            "— same contract as boolquery (ES would match ALL documents)"
        )


def simple_query_string_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    default_operator: str = "or",
    minimum_should_match: int | None = None,
    term_stats: DataFrame | None = None,
    tokenize=None,
    validate: bool = True,
    strategy: str | None = None,
) -> DataFrame:
    """``simple_query_string`` over a persisted POSITIONAL index (the
    phrase clauses need the .pos sidecar; plain-postings queries with
    no phrase clause also work off a positional build since the block
    postings derive from it). -> (qid, doc_id, score, rank).

    DEFAULT ROUTE: with the ES-default ``minimum_should_match`` (None)
    this delegates to ``simple_query_string_cogroup`` — the bool-bitmap
    kernel path, value-identical on this shape (tested:
    test_querystring.test_cogroup_matches_index and the slop twin) and
    ~6x cheaper: the clause-relation spelling materializes every
    clause's FULL scored match set into one groupBy (rows ~= sum of
    clause-term dfs) where the kernel emits <= k rows per (query,
    segment). The clause-relation path below remains the verification
    twin and still serves the two shapes whose semantics it alone
    defines: an EXPLICIT minimum_should_match (the documented
    should-less divergence) and ``validate=False`` (silent empty for
    pure negation, where the kernel guard raises in-plan).
    ``strategy`` pins a path explicitly: "cogroup" | "clauses" | None
    (auto — the routing above); the identity tests pin "clauses" so
    the twin keeps verifying the kernel.
    """
    if strategy not in (None, "clauses", "cogroup"):
        raise ValueError(
            f"strategy {strategy!r} not in (None, 'clauses', 'cogroup')"
        )
    from sgpt_spark.operators.funcscore import match_scores
    from sgpt_spark.operators.index_search import normalize_queries
    from sgpt_spark.operators.indexer import read_index
    from sgpt_spark.operators.positions import phrase_hits_index

    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    parsed = parse_simple_query_string(queries, default_operator)
    if validate:
        _validate_positive(parsed)
    route_fast = strategy == "cogroup" or (
        strategy is None and minimum_should_match is None and validate
    )
    if route_fast:
        return simple_query_string_cogroup(
            spark, path, queries, k=k, default_operator=default_operator,
            minimum_should_match=minimum_should_match,
            term_stats=term_stats, tokenize=tokenize,
        )
    postings, meta = read_index(spark, path)

    term_cl = parsed.filter(F.col("kind") == "term").select(
        _uid(F.col("qid"), F.col("cid")).alias("qid"),
        F.col("clause").alias("query"),
    )
    term_scores = match_scores(
        spark, postings, meta, term_cl, term_stats=term_stats, tokenizer=tokenize
    ).toDF("uid", "doc_id", "score")

    ph_all = parsed.filter(F.col("kind") == "phrase")
    # one positional-kernel call per DISTINCT slop value — bounded by
    # the syntax (the ~N tails actually present), not the query count;
    # the same bounded-collect idiom as multiterm's prefix lengths.
    # An all-term batch yields zero calls and an all-term clause_scores.
    slop_vals = sorted(
        int(r["slop"]) for r in ph_all.select("slop").distinct().collect()
    )
    clause_scores = term_scores
    for s_v in slop_vals:
        ph_cl = ph_all.filter(F.col("slop") == s_v).select(
            _uid(F.col("qid"), F.col("cid")).alias("qid"),
            F.col("clause").alias("query"),
        )
        hits, _ = phrase_hits_index(
            spark, path, ph_cl, tokenize=tokenize, term_stats=term_stats,
            slop=s_v,
        )
        clause_scores = clause_scores.unionByName(
            hits.toDF("uid", "doc_id", "score")
        )
    return _combine(
        parsed, clause_scores, queries.schema["qid"], k, minimum_should_match
    )


def simple_query_string_cogroup(
    spark: SparkSession,
    path: str,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    default_operator: str = "or",
    minimum_should_match: int | None = None,
    term_stats: DataFrame | None = None,
    tokenize=None,
) -> DataFrame:
    """``simple_query_string`` through the bool BITMAP kernel — the fast
    path, value-identical to ``simple_query_string_index`` (tested).

    Where the clause-relation path materializes every clause's FULL
    scored match set and shuffles it into one groupBy (rows ~= sum of
    clause-term dfs), this path compiles the term clauses into
    ``bool_search_index_cogroup``'s one-pass bitmap TAAT — the postings
    shuffle once (compressed, term-pruned), per-segment accumulators
    fold score + clause bits, and only <= k rows per (query, segment)
    leave the kernel. Phrase clauses score in the positional kernel
    (``phrase_hits_index_cogroup(with_segment=True)`` — hits bounded by
    the rarest phrase term's df) and enter the bitmap kernel as SCORED
    doc-bit rows: their occur folds into the same per-query masks, so a
    must phrase constrains, a must_not phrase excludes, and a should
    phrase both scores and counts toward minimum_should_match. Fully
    in-plan end to end: no driver collect, no UDF outside the two
    Arrow-batched kernels; pure-negation strings raise in-plan (the
    bool kernel's guard).

    One documented divergence from the clause-relation twin: an
    EXPLICIT ``minimum_should_match`` is enforced only for queries that
    have at least one should clause (the bool kernel's convention);
    the twin drops should-less queries entirely in that case.
    """
    from sgpt_spark.operators.boolquery import bool_search_index_cogroup
    from sgpt_spark.operators.index_search import normalize_queries
    from sgpt_spark.operators.indexer import read_index
    from sgpt_spark.operators.positions import phrase_hits_index_cogroup

    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    parsed = parse_simple_query_string(queries, default_operator)
    postings, meta = read_index(spark, path)

    term_cl = parsed.filter(F.col("kind") == "term").select(
        "qid", "occur", F.col("clause").alias("query")
    )
    ph = parsed.filter(F.col("kind") == "phrase")
    scored = ph.select("qid", "occur", F.col("cid").cast("string").alias("key"))
    # one positional-kernel call per DISTINCT slop value — a bounded
    # collect (the ~N tails present in the syntax, not the query
    # count; multiterm's prefix-length idiom). Composite uid through
    # the positional kernel, CID FIRST so the split-back never depends
    # on the qid's own characters.
    slop_vals = sorted(
        int(r["slop"]) for r in ph.select("slop").distinct().collect()
    )
    hits = None
    for s_v in slop_vals:
        ph_q = ph.filter(F.col("slop") == s_v).select(
            F.concat(
                F.col("cid").cast("string"), F.lit(_SEP),
                F.col("qid").cast("string"),
            ).alias("qid"),
            F.col("clause").alias("query"),
        )
        h, _ = phrase_hits_index_cogroup(
            spark, path, ph_q, tokenizer=tokenize, term_stats=term_stats,
            with_segment=True, slop=s_v,
        )
        hits = h if hits is None else hits.unionByName(h)
    if hits is None:  # all-term batch
        hits = spark.createDataFrame(
            [], "qid string, doc_id long, score double, segment int"
        )
    key_c = F.substring_index(F.col("qid"), _SEP, 1)
    real_qid = F.substring(
        F.col("qid"),
        (F.length(key_c) + F.lit(2)).cast("int"),
        F.length(F.col("qid")).cast("int"),
    ).cast(queries.schema["qid"].dataType)
    scored_hits = hits.select(
        real_qid.alias("qid"),
        key_c.alias("key"),
        "segment",
        "doc_id",
        "score",
    )
    return bool_search_index_cogroup(
        spark,
        postings,
        meta,
        term_cl,
        k=k,
        term_stats=term_stats,
        tokenizer=tokenize,
        minimum_should_match=minimum_should_match,
        scored=scored,
        scored_hits=scored_hits,
    )


def simple_query_string_search(
    corpus: DataFrame,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    default_operator: str = "or",
    minimum_should_match: int | None = None,
    tokenizer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    validate: bool = True,
) -> DataFrame:
    """Exhaustive declarative twin (no persisted index): term clauses
    score via the corpus tf/df relations, phrase clauses via the
    exhaustive phrase pipeline's full candidate set — value-identical
    to ``simple_query_string_index``.

    ``"..."~N`` sloppy phrases are refused loudly: the exhaustive
    phrase pipeline is the exact (slop=0) relational alignment; sloppy
    matching lives on the positional-index paths."""
    from sgpt_spark.functions.analyzer import tokenize_ws
    from sgpt_spark.operators.index_search import normalize_queries
    from sgpt_spark.operators.phrase import (
        phrase_frequencies,
        phrase_idf_sums,
        positional_postings,
        query_phrases,
        score_phrase_candidates,
    )
    from sgpt_spark.operators.search import query_terms, score_candidates
    from sgpt_spark.operators.stats import (
        corpus_stats,
        doc_terms,
        term_df,
        term_freqs,
    )

    spark = corpus.sparkSession
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tok = tokenizer or tokenize_ws
    parsed = parse_simple_query_string(queries, default_operator)
    if validate:
        _validate_positive(parsed)
    if parsed.filter(
        (F.col("kind") == "phrase") & (F.col("slop") > 0)
    ).limit(1).count():
        raise ValueError(
            'simple_query_string_search does not support "..."~N phrase '
            "slop — the exhaustive phrase pipeline is the exact (slop=0) "
            "relational alignment; use simple_query_string_index or "
            "_cogroup over a positional index"
        )

    dt = doc_terms(corpus, id_col=id_col, text_col=text_col, tokenizer=tok)
    stats = corpus_stats(dt)
    tfreqs = term_freqs(dt)
    dfs = term_df(tfreqs)

    term_cl = parsed.filter(F.col("kind") == "term").select(
        _uid(F.col("qid"), F.col("cid")).alias("qid"),
        F.col("clause").alias("query"),
    )
    qt = query_terms(term_cl, tokenizer=tok)
    term_scores = score_candidates(
        tfreqs, qt, dfs, stats, broadcast_queries=False
    ).toDF("uid", "doc_id", "score")

    ph_cl = parsed.filter(F.col("kind") == "phrase").select(
        _uid(F.col("qid"), F.col("cid")).alias("qid"),
        F.col("clause").alias("query"),
    )
    qp = query_phrases(ph_cl, tokenizer=tok)
    pf_df = phrase_frequencies(positional_postings(dt), qp)
    sidf = phrase_idf_sums(qp, dfs, stats.n_docs)
    ph_scores = score_phrase_candidates(pf_df, sidf, stats).toDF(
        "uid", "doc_id", "score"
    )
    clause_scores = term_scores.unionByName(ph_scores)
    return _combine(
        parsed, clause_scores, queries.schema["qid"], k, minimum_should_match
    )
