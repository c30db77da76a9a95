"""Multifield phrase search — ES ``multi_match`` with ``type: phrase``.

The reference's ES queries are ``multi_match`` over ``{title, txt}``
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10); the same
query DSL accepts ``"type": "phrase"``, which runs a ``match_phrase``
against EACH field and combines per-field scores with the best_fields
dis-max (max + tie_breaker * others) — exactly the combine the match
family already implements (``search.dismax_combine``). Semantics here
mirror the engine's multifield match paths field-for-field:

  - each field is scored as an independent match_phrase (slop=0) with
    ITS OWN corpus stats (N = docs with >= 1 token in that field,
    avgdl/df of that field) — the per-field index model of
    ``build_multifield_index``;
  - per-field Lucene caret boosts (``"title^2"``) multiply the field's
    phrase score (``parse_field_boosts`` / ``normalize_boosts``);
  - combine = max + tie_breaker * (sum - max) over the per-field
    scores, one groupBy (phrase scores are strictly positive, so a
    field without the phrase coalesces to 0 without affecting max).

Plan shape (100 TB notes): each field contributes the exhaustive
phrase pipeline of ``operators.phrase`` (positional posting stream
pruned by a broadcast of the query (term, offset) pairs BEFORE any
shuffle); per-field phrase HITS — naturally rare — union and combine
in one groupBy(qid, doc_id). No UDFs anywhere. The index-backed twin
runs off per-field positional sidecars (``positions.py``) built
co-segmented, mirroring ``build_multifield_index``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_ws
from sgpt_spark.functions.bm25 import B, K1
from sgpt_spark.operators.phrase import (
    Tokenizer,
    phrase_frequencies,
    phrase_idf_sums,
    positional_postings,
    query_phrases,
    score_phrase_candidates,
)
from sgpt_spark.operators.search import (
    dismax_combine,
    normalize_boosts,
    parse_field_boosts,
)
from sgpt_spark.operators.stats import corpus_stats, doc_terms, term_df, term_freqs
from sgpt_spark.operators.topk import topk_per_group


def field_phrase_scores(
    corpus: DataFrame,
    queries: DataFrame,
    field: str,
    tokenizer: Tokenizer = tokenize_ws,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    broadcast_queries: bool = True,
) -> DataFrame:
    """ONE field's full match_phrase relation (qid, doc_id, score) —
    every phrase hit, no top-k cut (the dis-max needs per-field scores
    for every candidate doc). Stats are the FIELD's own corpus stats,
    mirroring the per-field index model."""
    dt = doc_terms(corpus, id_col=id_col, text_col=field, tokenizer=tokenizer)
    dfs = term_df(term_freqs(dt))
    stats = corpus_stats(dt)
    qp = query_phrases(queries, tokenizer=tokenizer)
    pf_df = phrase_frequencies(
        positional_postings(dt), qp, broadcast_queries=broadcast_queries
    )
    sidf = phrase_idf_sums(qp, dfs, stats.n_docs, broadcast_queries=broadcast_queries)
    return score_phrase_candidates(
        pf_df, sidf, stats, k1=k1, b=b, broadcast_queries=broadcast_queries
    )


def multifield_phrase_search(
    corpus: DataFrame,
    queries: DataFrame,
    fields=("title", "text"),
    k: int = 10,
    tie_breaker: float = 0.0,
    tokenizer: Tokenizer = tokenize_ws,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    broadcast_queries: bool = True,
) -> DataFrame:
    """ES ``multi_match type=phrase`` (best_fields, slop=0), exhaustive
    -> (qid, doc_id, score, rank). ``fields`` accepts caret boosts
    (``["title^2", "text"]``)."""
    fields, raw_boosts = parse_field_boosts(fields)
    boosts = normalize_boosts(fields, raw_boosts)
    partials = None
    for f in fields:
        scored = field_phrase_scores(
            corpus, queries, f, tokenizer=tokenizer, id_col=id_col,
            k1=k1, b=b, broadcast_queries=broadcast_queries,
        ).select(
            "qid",
            "doc_id",
            F.lit(f).alias("field"),
            (F.col("score") * F.lit(float(boosts[f]))).alias("partial"),
        )
        partials = scored if partials is None else partials.unionByName(scored)
    combined = dismax_combine(partials, fields, tie_breaker)
    return topk_per_group(combined, k=k).select("qid", "doc_id", "score", "rank")


# --- index-backed twin (per-field positional sidecars) ----------------------


def build_multifield_positional_index(
    docs: DataFrame,
    path: str,
    fields: tuple[str, ...] = ("title", "text"),
    segment_size: int | None = None,
    py_tokenizer=None,
    tokenizer: Tokenizer | None = None,
    codec: str = "varint",
) -> dict:
    """One POSITIONAL index per field under ``{path}/{field}_index`` —
    ``build_multifield_index``'s layout and CO-SEGMENTATION invariant
    (one range-partitioned scan, narrow per-field >=1-token filter, so
    segment s covers the same doc range in every field), with each
    field built through ``build_positional_index`` (positions written,
    postings derived — the match-query paths run unchanged on them).
    Returns {field: IndexMeta}."""
    import json as _json
    import os

    from sgpt_spark.functions.analyzer import tokenize_py_ws
    from sgpt_spark.operators.indexer import (
        DEFAULT_SEGMENT_SIZE,
        _multifield_jvm_twin,
    )
    from sgpt_spark.operators.positions import build_positional_index

    if segment_size is None:
        segment_size = DEFAULT_SEGMENT_SIZE
    py_tok = py_tokenizer or tokenize_py_ws
    jvm_tok = _multifield_jvm_twin(py_tok, tokenizer)
    n = docs.count()
    n_seg = max(1, -(-n // segment_size))
    src = docs.repartitionByRange(n_seg, "doc_id")
    src.persist()
    try:
        metas = {}
        for f in fields:
            fd = src.select("doc_id", F.col(f).alias("text")).filter(
                F.size(jvm_tok(F.col("text"))) > 0
            )
            metas[f] = build_positional_index(
                fd, f"{path}/{f}_index", segment_size=segment_size,
                py_tokenizer=py_tok, codec=codec,
            )
    finally:
        src.unpersist()
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/fields.json", "w") as fp:
        _json.dump({"fields": list(fields)}, fp)
    return metas


def phrase_search_multifield_index(
    spark: SparkSession,
    path: str,
    queries,
    k: int = 10,
    tie_breaker: float = 0.0,
    fields=None,
    tokenize=None,
    strategy: str = "collect",
) -> DataFrame:
    """``multi_match type=phrase`` off the persisted per-field
    positional indexes -> (qid, doc_id, score, rank), value-identical to
    the exhaustive path (tested). ``fields`` (optional, with caret
    boosts) defaults to the layout's fields.json.

    Per field the segments emit ALL phrase hits (not a top-k: dis-max
    needs every candidate's per-field score, and phrase hits are
    naturally rare — bounded by the rarest phrase term's df); the union
    combines in ONE groupBy(qid, doc_id), then the global top-k.

    ``strategy``: 'collect' broadcasts the analyzed phrases (the
    interactive default); 'cogroup' keeps the query set in the plan
    (``positions.phrase_hits_index_cogroup`` per field — the
    millions-of-phrases scale contract; value-identical, tested). The
    'cogroup' strategy takes a JVM column ``tokenize``; 'collect' takes
    a Python one (the ``search_multifield_index`` convention)."""
    import json as _json

    from sgpt_spark.operators.positions import (
        phrase_hits_index,
        phrase_hits_index_cogroup,
    )

    if strategy not in ("collect", "cogroup"):
        raise ValueError(f"unknown strategy {strategy!r}: collect|cogroup")
    with open(f"{path}/fields.json") as fp:
        layout_fields = tuple(_json.load(fp)["fields"])
    if fields is None:
        fields, raw_boosts = layout_fields, None
    else:
        fields, raw_boosts = parse_field_boosts(fields)
        unknown = sorted(set(fields) - set(layout_fields))
        if unknown:
            raise ValueError(
                f"fields {unknown} not in this index layout {list(layout_fields)}"
            )
    boosts = normalize_boosts(fields, raw_boosts)
    partials = None
    qid_type = None
    for f in fields:
        if strategy == "cogroup":
            hits, qt = phrase_hits_index_cogroup(
                spark, f"{path}/{f}_index", queries, tokenizer=tokenize
            )
        else:
            hits, qt = phrase_hits_index(
                spark, f"{path}/{f}_index", queries, tokenize=tokenize
            )
        qid_type = qid_type or qt
        scored = hits.select(
            "qid",
            "doc_id",
            F.lit(f).alias("field"),
            (F.col("score") * F.lit(float(boosts[f]))).alias("partial"),
        )
        partials = scored if partials is None else partials.unionByName(scored)
    combined = dismax_combine(partials, fields, tie_breaker)
    return topk_per_group(combined, k=k).select("qid", "doc_id", "score", "rank")
