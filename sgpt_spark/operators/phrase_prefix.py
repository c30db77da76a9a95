"""``match_phrase_prefix`` — ES search-as-you-type, the Lucene
MultiPhraseQuery composition of the engine's phrase machinery
(operators/phrase.py, operators/positions.py) and its multi-term
dictionary expansion (operators/multiterm.py).

The reference's retrieval stack is Elasticsearch/Lucene
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10); the same
index that serves its ``multi_match`` queries answers ES
``match_phrase_prefix`` — the autocomplete staple any ES user
switching to this engine expects. Semantics (public ES docs +
Lucene MultiPhraseQuery source):

  - analyze the query into the ORDERED term sequence q[1..m]; the
    LAST term is a prefix, not a literal;
  - expand that prefix against the term dictionary to at most
    ``max_expansions`` concrete terms (ES default 50), selected in
    term-dictionary order — exactly the cap ES documents for this
    query ("the last term expands to the first max_expansions terms
    in term order");
  - build Lucene's MultiPhraseQuery: positions 1..m-1 hold one term
    each, position m holds the expanded SET — a document matches at
    start s where toks[s+j-1] = q[j] for j < m and toks[s+m-1] is
    ANY expanded term. pf = number of matching starts (a single
    position holds one token, so alternatives at the last slot can
    never double-count a start);
  - BM25 scores the phrase as one pseudo-term with freq = pf and
    idf = the SUM over ALL terms in the query's term arrays —
    the m-1 fixed terms plus every expanded term
    (MultiPhraseQuery.MultiPhraseWeight collects allTermStats and
    BM25Similarity sums their idfs):

        score = sum_idf * pf / (pf + k1*(1-b+b*dl/avgdl))

Plan shape (100 TB notes) — the exhaustive path is the phrase plan
with one extra QUERY-SIDED stage: prefix expansion is the SAME
per-length substring equi-join against the (term, df) relation as
``multiterm.expand_prefix`` (no theta join, no driver loop; the
dictionary is probed O(1)/term however large the vocabulary), and the
expanded rows simply union into the broadcast (term, offset) pair set
the phrase aligner already consumes. Nothing about the big positional
relation changes: one scan, broadcast-pruned before any shuffle,
alignment by map-side (qid, doc, start) vote counting.

The index-backed path follows ``positions.phrase_search_index``'s
collect contract (query sets contractually small): expansion runs
in-plan against the persisted ``termstats`` side table and only the
bounded (<= queries x max_expansions) expansion result is collected;
the positions scan is term-pruned by a pushed In(term, ...) over
fixed + expanded terms, and each segment aligns locally with the
whole-array numpy kernel generalized to per-offset term SETS (the
MultiPhraseQuery role: the last offset's start keys are the union of
its alternatives' keys — disjoint by construction, one token per
position).

DuckDB oracle: `__spark_entry__._PHRASE_PREFIX_SQL` mirrors this
relation-for-relation (expansion = substr equi-join + row_number cap,
alignment = the phrase oracle's start-vote CTEs over the unioned
term/offset rows).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_ws
from sgpt_spark.functions.bm25 import B, K1, idf_py
from sgpt_spark.operators.index_search import (
    _emit_topk_frame,
    deterministic_topk,
    normalize_queries,
)
from sgpt_spark.operators.multiterm import expand_prefix
from sgpt_spark.operators.phrase import (
    phrase_frequencies,
    phrase_idf_sums,
    positional_postings,
    query_phrases,
    score_phrase_candidates,
)
from sgpt_spark.operators.positions import (
    _LOCAL_DOC_BITS,
    _decode_rows,
    read_positional_index,
)
from sgpt_spark.operators.stats import corpus_stats, doc_terms, term_df, term_freqs
from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group

Tokenizer = Callable[[Column], Column]

DEFAULT_MAX_EXPANSIONS = 50  # the ES match_phrase_prefix default


def expanded_phrase_terms(
    queries: DataFrame,
    dictionary: DataFrame,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    tokenizer: Tokenizer = tokenize_ws,
) -> DataFrame:
    """queries x (term, df) dictionary -> (qid, j, m, term): the
    MultiPhraseQuery term/offset rows — offsets 1..m-1 carry the fixed
    query terms verbatim, offset m fans out to the prefix expansion
    (first ``max_expansions`` dictionary terms with that prefix, term
    order — the documented ES selection).

    The output feeds ``phrase.phrase_frequencies`` /
    ``phrase.phrase_idf_sums`` unchanged: at most one vote can exist
    per (doc, start, j) because a position holds exactly one token, so
    the full-coverage counting argument survives the fan-out.
    """
    qp = query_phrases(queries, tokenizer=tokenizer)
    fixed = qp.filter(F.col("j") < F.col("m"))
    last = qp.filter(F.col("j") == F.col("m")).select(
        "qid", "m", F.col("term").alias("prefix")
    )
    expanded = (
        expand_prefix(dictionary, last.select("qid", "prefix"), max_expansions)
        .join(last.select("qid", "m"), "qid")
        .select("qid", F.col("m").cast("int").alias("j"), "m", "term")
    )
    return fixed.select("qid", "j", "m", "term").unionByName(expanded)


def phrase_prefix_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    tokenizer: Tokenizer = tokenize_ws,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    broadcast_queries: bool = True,
) -> DataFrame:
    """End-to-end exhaustive ``match_phrase_prefix`` top-k: corpus x
    queries (last token = prefix) -> (qid, doc_id, score, rank).

    Ground-truth twin of ``phrase_prefix_search_index`` (tested
    value-identical) and the shape the DuckDB oracle mirrors. Corpus
    stats (N, avgdl, df) are the whole-corpus stats every other query
    type uses — same index, not a prefix-specific one.
    """
    dt = doc_terms(corpus, id_col=id_col, text_col=text_col, tokenizer=tokenizer)
    dfs = term_df(term_freqs(dt))
    stats = corpus_stats(dt)
    qexp = expanded_phrase_terms(
        queries, dfs, max_expansions=max_expansions, tokenizer=tokenizer
    )
    pf_df = phrase_frequencies(
        positional_postings(dt), qexp, broadcast_queries=broadcast_queries
    )
    sidf = phrase_idf_sums(qexp, dfs, stats.n_docs, broadcast_queries=broadcast_queries)
    scored = score_phrase_candidates(
        pf_df, sidf, stats, k1=k1, b=b, broadcast_queries=broadcast_queries
    )
    return topk_per_group(scored, k=k).select("qid", "doc_id", "score", "rank")


# --- index-backed path ----------------------------------------------------


def _mp_parts(decoded: dict, phrases: list, kk, k1: float, b: float, avgdl: float):
    """Score one segment's decoded positional postings against every
    MultiPhrase query -> [(qid, doc_ids, scores)].

    ``decoded``: term -> (docs, dls, occ_doc, occ_pos) as in
    ``positions._phrase_parts``; ``phrases``: [(qid, offsets, sum_idf)]
    where offsets[j] is a TUPLE of alternative terms for 1-based offset
    j+1 (the fixed offsets carry one alternative, the last offset the
    prefix expansion). Alignment is the phrase kernel's packed
    (doc, start) key intersection with the per-offset key array being
    the UNION over present alternatives — unions are concatenations
    because one position holds one token, so alternative key sets are
    disjoint and uniqueness is preserved for assume_unique.
    """
    if not decoded:
        return []
    base = min(int(v[0][0]) for v in decoded.values())
    hi = max(int(v[0][-1]) for v in decoded.values())
    if hi - base >= (1 << (_LOCAL_DOC_BITS - 1)):
        raise ValueError(
            "segment doc-id span exceeds 2^31 — rebuild with denser ids "
            "or smaller segments (phrase alignment packs (doc, start) "
            "into one int64 key)"
        )
    parts = []
    for qid, offsets, sum_idf in phrases:
        m = len(offsets)
        alts = [[t for t in alt if t in decoded] for alt in offsets]
        if any(not a for a in alts):
            continue
        # fewest occurrences first: every intersection is bounded by it
        order = sorted(
            range(m), key=lambda j: sum(len(decoded[t][2]) for t in alts[j])
        )
        keys = None
        for j in order:
            kparts = [
                ((decoded[t][2] - base) << _LOCAL_DOC_BITS)
                + (decoded[t][3] - (j + 1) + m)
                for t in alts[j]
            ]
            kj = kparts[0] if len(kparts) == 1 else np.concatenate(kparts)
            keys = kj if keys is None else np.intersect1d(keys, kj, assume_unique=True)
            if len(keys) == 0:
                break
        if keys is None or len(keys) == 0:
            continue
        local = keys >> _LOCAL_DOC_BITS
        uniq_local, pf = np.unique(local, return_counts=True)
        doc_ids = uniq_local + base
        j0 = order[0]
        if len(alts[j0]) == 1:
            tdocs, tdls = decoded[alts[j0][0]][0], decoded[alts[j0][0]][1]
        else:
            tdocs = np.concatenate([decoded[t][0] for t in alts[j0]])
            tdls = np.concatenate([decoded[t][1] for t in alts[j0]])
            o = np.argsort(tdocs, kind="stable")
            tdocs, tdls = tdocs[o], tdls[o]
        dl = tdls[np.searchsorted(tdocs, doc_ids)].astype(np.float64)
        raw = sum_idf * pf / (pf + k1 * (1.0 - b + b * dl / avgdl))
        scores = np.round(raw, SCORE_DECIMALS)
        sel = deterministic_topk(doc_ids, scores, kk)
        parts.append((qid, doc_ids[sel], scores[sel]))
    return parts


def phrase_prefix_search_index(
    spark: SparkSession,
    path: str,
    queries,
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    tokenize=None,
    term_stats: DataFrame | None = None,
) -> DataFrame:
    """ES ``match_phrase_prefix`` over a persisted positional index ->
    (qid, doc_id, score, rank); value-identical to the exhaustive
    ``phrase_prefix_search`` over the same corpus (tested).

    Follows the phrase index paths' collect contract: query sets are
    contractually small (the interactive/autocomplete shape this query
    exists for). Expansion runs IN-PLAN against ``{path}/termstats``
    via the same per-length substring equi-join as the multiterm
    operators; only its bounded result (<= |queries| x max_expansions
    rows) plus the fixed terms' (term, df) rows are collected. The
    positions scan is term-pruned with a pushed In(term, ...) over
    fixed + expanded terms and each segment scores locally, shipping
    <= k rows per (query, segment) into the global deterministic
    top-k — same 100 TB shape as every other index query path.
    """
    from sgpt_spark.functions.analyzer import resolve_py_analyzer

    positions, meta = read_positional_index(spark, path)
    queries, qid_type = normalize_queries(queries)
    tok = tokenize or resolve_py_analyzer(meta.analyzer)
    if isinstance(queries, DataFrame):
        pairs = [(r["qid"], r["query"]) for r in queries.collect()]
    else:
        pairs = list(queries)
    parsed = []  # (qid, fixed terms tuple, prefix)
    for qid, qtext in pairs:
        terms = tuple(tok(qtext or ""))
        if terms:
            parsed.append((qid, terms[:-1], terms[-1]))
    out_schema = "qid " + qid_type + ", doc_id long, score double, rank int"
    if not parsed:
        return spark.createDataFrame([], out_schema)

    ts = (
        term_stats
        if term_stats is not None
        else spark.read.parquet(f"{path}/termstats")
    )
    # expansion keyed by the PARSED ROW index, not the caller qid: qids
    # may repeat or be non-string; the index is a private join key.
    pfx_df = spark.createDataFrame(
        [(i, p) for i, (_, _, p) in enumerate(parsed)], "qid int, prefix string"
    )
    expanded: dict[int, list[tuple[str, int]]] = {}
    for r in expand_prefix(ts, pfx_df, max_expansions).collect():
        expanded.setdefault(int(r["qid"]), []).append((r["term"], int(r["df"])))
    fixed_terms = sorted({t for _, fx, _ in parsed for t in fx})
    fixed_df: dict[str, int] = {}
    if fixed_terms:
        fixed_df = {
            r["term"]: int(r["df"])
            for r in ts.filter(F.col("term").isin(fixed_terms)).collect()
        }

    phrases = []
    for i, (qid, fx, _) in enumerate(parsed):
        exp = expanded.get(i, [])
        if not exp or any(t not in fixed_df for t in fx):
            continue  # no expansion / corpus-absent fixed term: no hits
        sum_idf = sum(idf_py(fixed_df[t], meta.n_docs) for t in fx) + sum(
            idf_py(df, meta.n_docs) for _, df in exp
        )
        offsets = tuple((t,) for t in fx) + (tuple(t for t, _ in exp),)
        phrases.append((qid, offsets, sum_idf))
    if not phrases:
        return spark.createDataFrame([], out_schema)

    all_terms = sorted({t for _, offs, _ in phrases for alt in offs for t in alt})
    cand = positions.filter(F.col("term").isin(all_terms))
    b_phrases = spark.sparkContext.broadcast(phrases)
    k1, b, avgdl, codec = meta.k1, meta.b, meta.avgdl, meta.codec
    seg_schema = f"qid {qid_type}, doc_id long, score double"

    def score_wrapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        for seg in pdf["segment"].unique():
            sdf = pdf[pdf["segment"] == seg]
            row_off, docs, tfs, dls, pos_off, pos = _decode_rows(sdf["runs"], codec)
            decoded = {}
            for i, term in enumerate(sdf["term"]):
                ps, pe = int(row_off[i]), int(row_off[i + 1])
                if pe == ps:
                    continue
                d_i, tf_i, dl_i = docs[ps:pe], tfs[ps:pe], dls[ps:pe]
                os_, oe = int(pos_off[i]), int(pos_off[i + 1])
                decoded[term] = (d_i, dl_i, np.repeat(d_i, tf_i), pos[os_:oe])
            parts = _mp_parts(decoded, b_phrases.value, kk=k, k1=k1, b=b, avgdl=avgdl)
            if parts:
                yield _emit_topk_frame(parts)

    seg_topk = cand.repartition("segment").mapInPandas(score_wrapper, schema=seg_schema)
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")


# --- Python twin (brute-force oracle for tests) ---------------------------


def phrase_prefix_score_py(
    corpus_toks: dict,
    fixed: list[str],
    prefix: str,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    k1: float = K1,
    b: float = B,
) -> dict:
    """From-scratch match_phrase_prefix over tokenized docs
    {doc_id: [tok, ...]} -> {doc_id: score}; mirrors the Spark and
    DuckDB definitions token-for-token (dictionary-order expansion cap,
    summed idf over fixed + every expanded term, start-count pf)."""
    import math

    n = len(corpus_toks)
    if n == 0:
        return {}
    avgdl = sum(len(t) for t in corpus_toks.values()) / n
    dfs: dict[str, int] = {}
    for toks in corpus_toks.values():
        for t in set(toks):
            dfs[t] = dfs.get(t, 0) + 1
    exp = sorted(t for t in dfs if t.startswith(prefix))[:max_expansions]
    if not exp or any(t not in dfs for t in fixed):
        return {}
    expset = set(exp)

    def _idf(df: int) -> float:
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    sum_idf = sum(_idf(dfs[t]) for t in fixed) + sum(_idf(dfs[t]) for t in exp)
    m = len(fixed) + 1
    out = {}
    for doc_id, toks in corpus_toks.items():
        pf = 0
        for s in range(len(toks) - m + 1):
            if all(toks[s + j] == fixed[j] for j in range(m - 1)) and (
                toks[s + m - 1] in expset
            ):
                pf += 1
        if pf:
            dl = len(toks)
            out[doc_id] = sum_idf * pf / (pf + k1 * (1 - b + b * dl / avgdl))
    return out
