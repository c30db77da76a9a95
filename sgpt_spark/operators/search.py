"""BM25 query execution — exhaustive (DataFrame-native) path.

Replaces the reference's delegated ES query
(``retriever.retrieve(corpus, queries)`` -> ES multi_match top-1000,
crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10) with an explicit
Spark plan:

    postings_flat (term, doc_id, tf, doc_len)       [big: index scan]
      join BROADCAST(query terms)  on term          [no shuffle]
      -> per-(qid, doc) partial scores               [codegen'd BM25 math]
      groupBy(qid, doc_id).sum                       [map-side combine]
      -> per-qid top-k window                        [one narrow shuffle]

Scale notes (100 TB / 10^12 docs): the only full scan is the postings
probe, and it is filtered by the broadcast query-term set *before* any
shuffle — the shuffled data is candidate rows only (|queries| x df(t)).
Query sets are small (BEIR: 10^2..10^4 queries) so the broadcast side is
KBs. doc_len is denormalized into the postings at index time, so no join
against a 10^12-row doc-stats table ever happens at query time.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_ws
from sgpt_spark.functions.bm25 import B, K1, bm25_term_score
from sgpt_spark.operators.corpus import non_empty_text
from sgpt_spark.operators.stats import CorpusStats, corpus_stats, doc_terms, term_df, term_freqs
from sgpt_spark.operators.topk import topk_per_group

Tokenizer = Callable[[Column], Column]


def query_terms(
    queries: DataFrame,
    qid_col: str = "qid",
    query_col: str = "query",
    tokenizer: Tokenizer = tokenize_ws,
) -> DataFrame:
    """queries -> (qid, term, qtf). Query-term multiplicity is kept
    (Lucene scores a duplicated query term once per occurrence)."""
    return (
        non_empty_text(queries, query_col)
        .select(F.col(qid_col).alias("qid"), tokenizer(F.col(query_col)).alias("qterms"))
        .select("qid", F.explode("qterms").alias("term"))
        .groupBy("qid", "term")
        .agg(F.count("*").alias("qtf"))
    )


def score_candidates(
    postings_flat: DataFrame,
    qterms: DataFrame,
    dfs: DataFrame,
    stats: CorpusStats,
    k1: float = K1,
    b: float = B,
    broadcast_queries: bool = True,
    required: DataFrame | None = None,
) -> DataFrame:
    """-> (qid, doc_id, score): BM25 over every (query, matching doc).

    ``required``: optional (qid, req) relation — a doc is kept only when
    it matched at least ``req`` of that query's match CLAUSES (ES
    minimum_should_match / operator=and). Lucene's match query builds
    one clause per analyzed query-token OCCURRENCE, so a matched term
    contributes qtf clauses: a doc containing only 'alpha' matches 2 of
    the 3 clauses of 'alpha alpha beta' (one partial row per matched
    (qid, doc, term) carrying qtf, so sum(qtf) IS the matched-clause
    count). A qid absent from ``required`` is unfiltered. Build the
    relation with ``required_df`` so the clause units always agree.

    ``qterms`` and ``dfs``-restricted-to-query-terms are both tiny ->
    broadcast; the big postings relation is filtered by the join without
    shuffling. For query sets too large to broadcast (millions of
    queries), pass ``broadcast_queries=False`` and the probe becomes a
    plain shuffle join on term.
    """
    # df lookup only needed for terms that appear in some query.
    qterm_df = qterms.join(dfs, "term", "inner")
    if broadcast_queries:
        qterm_df = F.broadcast(qterm_df)
    partial = postings_flat.join(qterm_df, "term", "inner").select(
        "qid",
        "doc_id",
        "qtf",
        (
            F.col("qtf")
            * bm25_term_score(
                F.col("tf"), F.col("df"), F.col("doc_len"), stats.n_docs, stats.avgdl, k1, b
            )
        ).alias("partial"),
    )
    if required is not None:
        # required is query-sized: broadcast only under the same
        # contract as the query probe itself — the no-broadcast scale
        # path (millions of queries) must not force it through the
        # driver/broadcast limit
        req_rel = F.broadcast(required) if broadcast_queries else required
        return (
            partial.groupBy("qid", "doc_id")
            .agg(F.sum("partial").alias("score"), F.sum("qtf").alias("_nm"))
            .join(req_rel, "qid", "left")
            .filter(F.col("_nm") >= F.coalesce(F.col("req"), F.lit(0)))
            .select("qid", "doc_id", "score")
        )
    return partial.groupBy("qid", "doc_id").agg(F.sum("partial").alias("score"))


def parse_field_boosts(
    specs,
) -> tuple[tuple[str, ...], dict[str, float] | None]:
    """ES ``multi_match`` field spellings -> (fields, boosts):
    ``["title^2", "text"]`` -> ``(("title", "text"), {"title": 2.0})``
    (Lucene query-syntax caret boost; boost-less fields default 1.0,
    returned as None when no field carries a boost)."""
    fields: list[str] = []
    boosts: dict[str, float] = {}
    for s in specs:
        name, sep, bv = str(s).partition("^")
        if not name:
            raise ValueError(f"empty field name in spec {s!r}")
        if name in fields:
            # a duplicate field would union its projection twice
            # downstream (double tf and docCount — silently wrong scores)
            raise ValueError(f"duplicate field {name!r} in specs {list(specs)!r}")
        fields.append(name)
        if sep:
            boosts[name] = float(bv)
    return tuple(fields), (boosts or None)


def _validate_msm_args(minimum_should_match: int, operator: str) -> None:
    """Shared validation for the ES match-query knobs (used by the
    exhaustive path here and the index paths in index_search)."""
    if operator not in ("or", "and"):
        raise ValueError(f"unknown operator {operator!r}: or|and")
    if minimum_should_match < 0:
        raise ValueError(
            f"minimum_should_match must be >= 0, got {minimum_should_match}"
        )
    if operator == "and" and minimum_should_match:
        raise ValueError("pass operator='and' OR minimum_should_match, not both")


def required_df(
    qt: DataFrame, minimum_should_match: int, operator: str
) -> DataFrame | None:
    """(qid, term, qtf) analyzed query terms -> the optional (qid, req)
    match-clause bar every path's ``required=`` gate consumes, or None
    when the knobs never filter (req <= 1: every scored doc matched at
    least one clause).

    The bar is counted in CLAUSES, not distinct terms: Lucene's match
    query builds one SHOULD clause per analyzed query-token occurrence,
    and a doc containing a term satisfies every duplicate clause of that
    term at once. So ``operator='and'`` requires sum(qtf) matched
    clauses (equivalent to matching every DISTINCT term — duplicates
    come free), and the count a matched doc accumulates is qtf per
    matched term. Counting distinct terms instead would filter
    'alpha alpha beta' with minimum_should_match=2 more strictly than
    ES (an alpha-only doc matches 2 of its 3 clauses)."""
    _validate_msm_args(minimum_should_match, operator)
    if operator == "and":
        # counted over the ANALYZED terms BEFORE any df/corpus join, so
        # a query containing a corpus-absent term can never reach the
        # bar — ES operator=and semantics
        return qt.groupBy("qid").agg(F.sum("qtf").cast("int").alias("req"))
    if minimum_should_match > 1:
        return qt.select("qid").distinct().withColumn(
            "req", F.lit(int(minimum_should_match))
        )
    return None


def normalize_boosts(
    fields: tuple[str, ...], boosts: dict[str, float] | None
) -> dict[str, float]:
    """-> {field: boost} covering every field (default 1.0). Boosts must
    be positive and finite: the dis-max combine (and the per-segment
    spare-candidate logic under exclude_self) relies on per-field BM25
    scores staying strictly positive, which a zero/negative boost would
    break."""
    import math

    out = {f: 1.0 for f in fields}
    if boosts:
        unknown = sorted(set(boosts) - set(fields))
        if unknown:
            raise ValueError(f"boosts name unknown fields {unknown}; fields={list(fields)}")
        for f, v in boosts.items():
            v = float(v)
            if not math.isfinite(v) or v <= 0.0:
                raise ValueError(f"boost for field {f!r} must be a positive finite number, got {v}")
            out[f] = v
    return out


def dismax_combine(
    partials: DataFrame,
    fields: tuple[str, ...],
    tie_breaker: float,
    required: DataFrame | None = None,
) -> DataFrame:
    """(qid, doc_id, field, partial) term-level rows -> (qid, doc_id,
    score) with the ES best_fields combine max + tie_breaker*(sum-max)
    in ONE groupBy: per-field sums come from conditional aggregation
    (sum(when(field=f))), so the per-field aggregate and the cross-field
    combine share a single shuffle instead of one per field plus one.
    BM25 partials are strictly positive (Lucene idf > 0), so a missing
    field coalesces to 0 without changing max or sum.

    ``required``: optional (qid, req) — ES multi_match with
    minimum_should_match/operator=and puts the bar on EACH per-field
    match clause: a field whose matched-CLAUSE count (one partial row
    per matched qid/doc/field/term carrying qtf; a matched term
    satisfies all qtf of its duplicate clauses, see ``required_df``) is
    below ``req`` contributes nothing, and a doc where every field
    misses the bar is dropped (strictly positive partials make max>0
    the exact "some field matched" test). When set, ``partials`` must
    carry the ``qtf`` column."""
    sums = [
        F.coalesce(
            F.sum(F.when(F.col("field") == f, F.col("partial"))), F.lit(0.0)
        ).alias(f"_s{i}")
        for i, f in enumerate(fields)
    ]
    if required is not None:
        cnts = [
            F.coalesce(
                F.sum(F.when(F.col("field") == f, F.col("qtf"))), F.lit(0)
            ).alias(f"_c{i}")
            for i, f in enumerate(fields)
        ]
        g = (
            partials.groupBy("qid", "doc_id")
            .agg(*sums, *cnts)
            .join(F.broadcast(required), "qid", "left")
        )
        req = F.coalesce(F.col("req"), F.lit(0))
        scols = [
            F.when(F.col(f"_c{i}") >= req, F.col(f"_s{i}")).otherwise(F.lit(0.0))
            for i in range(len(fields))
        ]
    else:
        g = partials.groupBy("qid", "doc_id").agg(*sums)
        scols = [F.col(f"_s{i}") for i in range(len(fields))]
    mx = F.greatest(*scols) if len(scols) > 1 else scols[0]
    total = scols[0]
    for c in scols[1:]:
        total = total + c
    out = g.select(
        "qid",
        "doc_id",
        (mx + F.lit(float(tie_breaker)) * (total - mx)).alias("score"),
    )
    if required is not None:
        out = out.filter(F.col("score") > 0.0)
    return out


def bm25_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    tokenizer: Tokenizer = tokenize_ws,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    exclude_self: bool = False,
    minimum_should_match: int = 0,
    operator: str = "or",
    after: dict | None = None,
) -> DataFrame:
    """End-to-end exhaustive BM25 top-k: corpus x queries -> RESULTS.

    ``after``: ES ``search_after`` keyset pagination — {qid: (score,
    doc_id)} cursors from a previous page's last rows; only hits
    strictly after the cursor in the total (score desc, doc_id asc)
    order return, re-ranked 1..k (a pure broadcast-join filter before
    the top-k window — the declarative twin of
    ``index_search.search_index(after=)``). Cursor scores compare in
    rounded-score space, the ranking contract.

    ``minimum_should_match`` / ``operator='and'``: ES match-query knobs —
    keep only docs matching at least N / all of the query's match
    clauses, one clause per analyzed token occurrence (see
    ``required_df``; operator='and' counts clauses BEFORE the corpus
    join, so a query containing a corpus-absent term matches nothing —
    ES semantics). Single-field only; the multifield operator keeps ES
    multi_match defaults.

    The "index" here is the flat (term, doc_id, tf, doc_len) relation
    built inline; the persisted compressed-index path lives in
    ``sgpt_spark.operators.indexer`` + ``wand``.

    ``exclude_self``: drop hits where ``doc_id == qid`` — the
    reference's self-match filter for quora/cqadupstack-style query sets
    whose ids collide with doc ids (exact_search.py:117-119). Applied
    BEFORE the top-k cut, so the result is the true top-k of the
    non-self candidates (the reference retrieves k+1 then drops self
    for the same reason).
    """
    if exclude_self:
        _check_self_comparable(corpus.schema[id_col], queries.schema["qid"])
    _validate_msm_args(minimum_should_match, operator)
    dt = doc_terms(corpus, id_col=id_col, text_col=text_col, tokenizer=tokenizer)
    tf = term_freqs(dt)
    dfs = term_df(tf)
    stats = corpus_stats(dt)
    qt = query_terms(queries, tokenizer=tokenizer)
    required = required_df(qt, minimum_should_match, operator)
    scored = score_candidates(tf, qt, dfs, stats, k1=k1, b=b, required=required)
    if exclude_self:
        scored = scored.filter(F.col("doc_id") != F.col("qid"))
    if after is not None:
        from sgpt_spark.operators.topk import SCORE_DECIMALS

        qid_t = queries.schema["qid"].dataType.simpleString()
        adf = corpus.sparkSession.createDataFrame(
            [(q, float(s), int(d)) for q, (s, d) in after.items()],
            f"qid {qid_t}, aft_s double, aft_d long",
        )
        scored = (
            scored.withColumn("score", F.round("score", SCORE_DECIMALS))
            .join(F.broadcast(adf), "qid", "left")
            .filter(
                F.col("aft_s").isNull()
                | (F.col("score") < F.col("aft_s"))
                | ((F.col("score") == F.col("aft_s")) & (F.col("doc_id") > F.col("aft_d")))
            )
            .drop("aft_s", "aft_d")
        )
    return topk_per_group(scored, k=k).select("qid", "doc_id", "score", "rank")


def bm25_multifield_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fields: tuple[str, ...] = ("title", "text"),
    tie_breaker: float = 0.5,
    tokenizer: Tokenizer = tokenize_ws,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    exclude_self: bool = False,
    boosts: dict[str, float] | None = None,
    minimum_should_match: int = 0,
    operator: str = "or",
) -> DataFrame:
    """Multi-field BM25 top-k — the ES ``multi_match`` query the
    reference actually ran (crossencoder_beir_bm25.ipynb:298-310 cell
    10): BEIR 0.2.3's ``BM25Search`` indexes each doc as
    ``{"title", "txt"}`` and queries both fields with
    ``type=best_fields, tie_breaker=0.5``.

    Semantics (Lucene/ES, public docs):
      - each field is scored as an INDEPENDENT BM25 index: per-field
        docCount N_f (docs with >=1 token in that field), per-field
        avgdl_f, per-field df_f — a doc with an empty title simply has
        no rows in the title index;
      - best_fields combine: score = max_f s_f + tie_breaker *
        (sum_f s_f - max_f s_f).  tie_breaker=0 is pure dis-max,
        tie_breaker=1 is a plain per-field sum;
      - per-field boosts (the ES ``"title^2"`` spelling — use
        ``parse_field_boosts``): s_f is multiplied by boost_f BEFORE the
        combine, exactly Lucene's per-clause query boost;
      - ``minimum_should_match`` / ``operator='and'`` apply to EACH
        per-field match clause (ES multi_match semantics; clause units
        per ``required_df`` — one per analyzed token occurrence): a
        field matching fewer than the required clauses contributes
        nothing, and
        a doc whose matches are split across fields — every field below
        the bar — matches nothing at all.

    Plan shape (scale notes as ``bm25_search``): the per-field posting
    relations are one UNION of narrow projections over a single corpus
    scan; query terms x per-field dfs stay broadcast, so the only
    shuffles are the (field, term, doc_id) tf aggregation and the final
    per-query top-k — both keyed on high-cardinality keys.
    """
    if exclude_self:
        _check_self_comparable(corpus.schema[id_col], queries.schema["qid"])
    _validate_msm_args(minimum_should_match, operator)
    boost = normalize_boosts(fields, boosts)
    base = corpus
    fdocs = None
    for f in fields:
        part = base.select(
            F.col(id_col).alias("doc_id"),
            F.lit(f).alias("field"),
            tokenizer(F.col(f)).alias("terms"),
        ).filter(F.size("terms") > 0)
        fdocs = part if fdocs is None else fdocs.unionByName(part)

    # per-field posting relation (field, term, doc_id, tf, doc_len)
    tf = (
        fdocs.select(
            "field",
            "doc_id",
            F.size("terms").alias("doc_len"),
            F.explode("terms").alias("term"),
        )
        .groupBy("field", "term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("doc_len").alias("doc_len"))
    )
    dfs = tf.groupBy("field", "term").agg(F.count("*").alias("df"))
    # per-field docCount/avgdl: |fields| rows — safe to collect and fold
    # into the plan as literals (same contract as corpus_stats)
    stats = {
        r["field"]: (int(r["n"]), float(r["avgdl"] or 0.0))
        for r in fdocs.groupBy("field")
        .agg(F.count("*").alias("n"), F.avg(F.size("terms")).alias("avgdl"))
        .collect()
    }
    qt = query_terms(queries, tokenizer=tokenizer)
    qterm_df = F.broadcast(qt.join(dfs, "term", "inner"))

    n_map = F.create_map(
        *[x for f in fields for x in (F.lit(f), F.lit(float(stats.get(f, (0, 0.0))[0])))]
    )
    avgdl_map = F.create_map(
        *[x for f in fields for x in (F.lit(f), F.lit(stats.get(f, (0, 1.0))[1] or 1.0))]
    )
    # fold boosts into the partial only when some field is actually
    # boosted — the default plan stays free of the map lookup
    boost_col = (
        F.create_map(*[x for f in fields for x in (F.lit(f), F.lit(boost[f]))])[
            F.col("field")
        ]
        if any(v != 1.0 for v in boost.values())
        else F.lit(1.0)
    )
    partial = tf.join(qterm_df, ["field", "term"], "inner").select(
        "qid",
        "doc_id",
        "field",
        "qtf",
        (
            boost_col
            * F.col("qtf")
            * F.log(
                1.0
                + (n_map[F.col("field")] - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * F.col("tf")
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("doc_len") / avgdl_map[F.col("field")])
            )
        ).alias("partial"),
    )
    # the shared analyzer means one per-query clause bar serves every
    # field's match clause
    required = required_df(qt, minimum_should_match, operator)
    combined = dismax_combine(partial, fields, tie_breaker, required=required)
    if exclude_self:
        combined = combined.filter(F.col("doc_id") != F.col("qid"))
    return topk_per_group(combined, k=k).select("qid", "doc_id", "score", "rank")


_NUMERIC = ("bigint", "int", "long", "smallint", "tinyint")


def _check_self_comparable(doc_field, qid_field) -> None:
    """Mismatched doc_id/qid types under exclude_self would cast to NULL
    and silently drop every row — fail loudly instead (external-id query
    sets: filter after mapping ids back, see plans/beir.run_beir_bm25)."""
    dt, qt = doc_field.dataType.simpleString(), qid_field.dataType.simpleString()
    same_family = (dt in _NUMERIC and qt in _NUMERIC) or (dt == qt)
    if not same_family:
        raise ValueError(
            f"exclude_self needs comparable id types; got doc_id {dt} vs qid {qt}"
        )
