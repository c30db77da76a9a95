"""ES ``intervals`` query — minimal-interval matching (ordered /
unordered ``match`` rules with ``max_gaps``) over the positional index.

Elasticsearch's ``intervals`` query exposes Lucene's minimal-interval
algebra (the Clarke/Cormack/Vigna semantics behind
``IntervalsSource``): a ``match`` rule analyzes its text and produces,
per document, the set of MINIMAL position windows containing all terms
— in query order when ``ordered`` — where minimal means no reported
window properly contains another reported window; windows with more
than ``max_gaps`` interior gaps (``width - num_terms``) are filtered.
The reference delegates this DSL to its ES indexes
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10); this module
re-expresses the core ``match`` rule Spark-first on the same positional
sidecar the phrase family uses — it generalizes both: ordered with
``max_gaps=0`` IS the exact phrase (value-identical to
``phrase_search_index``, tested), unordered with unlimited gaps is the
"all terms in one doc, minimal windows" shape.

Scoring contract (engine-defined, documented): each surviving minimal
interval contributes ``1 / (1 + gaps)`` to the document's interval
frequency — the sloppy-phrase weight (``operators.sloppy``), which is
also the weight Lucene's ``IntervalScorer`` folds per interval — and
the document scores BM25 as ONE pseudo-term with that fractional freq
and the summed idf of the rule's terms, exactly the phrase/sloppy
pseudo-term contract, so scores are comparable across the whole
positional family.

Plan shape (the sloppy-phrase plumbing): the positions relation is
scanned ONCE, term-pruned by a pushed In(term, ...) filter; each
segment decodes its Arrow batch, intersects candidate docs (contain
ALL rule terms — the rarest term's df bounds everything), walks the
minimal-interval automaton per candidate doc in Python (bounded by the
rarest term's df, the bound ES pays), and ships <= k rows per
(query, segment) into the global deterministic top-k. Queries follow
the collect contract (interactive query sets; term lists broadcast).

Divergences (documented): repeated analyzed terms in one rule are
refused loudly (the sloppy-phrase rule — Lucene's repeat machinery is
out of scope); only the ``match`` rule is spelled (ES's ``any_of`` /
``all_of`` composition trees are request-side sugar over repeated
rules and score folds the engine's compound operators already cover).
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group

__all__ = [
    "minimal_intervals",
    "interval_freq",
    "intervals_search_index",
]


def _filter_minimal(iv: list) -> list:
    """Candidate windows (starts strictly increasing) -> the minimal
    set: a window whose end reaches past (or to) its successor's end
    contains it (starts increase), so it is not minimal."""
    out: list = []
    for s, e in iv:
        while out and out[-1][1] >= e:
            out.pop()
        out.append((s, e))
    return out


def minimal_intervals(arrs: list, ordered: bool) -> list:
    """Minimal (start, end) position windows over one document.

    ``arrs``: one strictly-ascending position array per rule term
    (distinct terms — distinct positions). ``ordered``: terms must
    appear in rule order (strictly increasing positions); otherwise any
    order. Every returned window starts and ends on a matched term
    occurrence and contains no other returned window.
    """
    m = len(arrs)
    if m == 0 or any(len(a) == 0 for a in arrs):
        return []
    if m == 1:
        return [(int(p), int(p)) for p in arrs[0]]
    out: list = []
    if ordered:
        idx = [0] * m
        while idx[0] < len(arrs[0]):
            prev = int(arrs[0][idx[0]])
            ok = True
            for i in range(1, m):
                a = arrs[i]
                while idx[i] < len(a) and int(a[idx[i]]) <= prev:
                    idx[i] += 1
                if idx[i] >= len(a):
                    ok = False
                    break
                prev = int(a[idx[i]])
            if not ok:
                break
            # shrink the start: the latest first-term occurrence still
            # before the second term's chain element
            nxt = int(arrs[1][idx[1]])
            a0 = arrs[0]
            while idx[0] + 1 < len(a0) and int(a0[idx[0] + 1]) < nxt:
                idx[0] += 1
            out.append((int(a0[idx[0]]), prev))
            idx[0] += 1
    else:
        idx = [0] * m
        heap = [(int(arrs[j][0]), j) for j in range(m)]
        heapq.heapify(heap)
        end = max(p for p, _ in heap)
        while True:
            s, j = heap[0]
            out.append((s, end))
            idx[j] += 1
            if idx[j] >= len(arrs[j]):
                break
            p = int(arrs[j][idx[j]])
            heapq.heapreplace(heap, (p, j))
            if p > end:
                end = p
    return _filter_minimal(out)


def interval_freq(arrs: list, ordered: bool, max_gaps: int) -> float:
    """Interval frequency of ONE document for ONE match rule: sum of
    ``1/(1+gaps)`` over minimal windows with ``gaps <= max_gaps``
    (``max_gaps=-1`` = unlimited; gaps = width - num_terms)."""
    m = len(arrs)
    if m == 0:
        return 0.0
    f = 0.0
    for s, e in minimal_intervals(arrs, ordered):
        gaps = (e - s + 1) - m
        if max_gaps < 0 or gaps <= max_gaps:
            f += 1.0 / (1.0 + gaps)
    return f


def check_intervals_rule(terms: tuple, max_gaps: int) -> None:
    """Refuse undefined combinations loudly (the sloppy-phrase rule)."""
    if len(set(terms)) != len(terms):
        raise ValueError(
            f"intervals rule with repeated terms is unsupported: {terms!r} "
            "(Lucene's repeat machinery is out of scope)"
        )
    if max_gaps < -1:
        raise ValueError(f"max_gaps must be >= -1, got {max_gaps}")


def intervals_parts(
    decoded: dict,
    rules: list,
    ordered: bool,
    max_gaps: int,
    kk,
    k1: float,
    b: float,
    avgdl: float,
) -> list:
    """Score one segment's decoded positional postings against every
    rule -> [(qid, doc_ids, scores)] — the intervals twin of
    ``sloppy.sloppy_parts`` (same decoded inputs, same output
    contract: top-kk per query rounded, ALL hits unrounded at None)."""
    from sgpt_spark.operators.index_search import deterministic_topk

    if not decoded:
        return []
    parts = []
    for qid, terms, sum_idf in rules:
        if any(t not in decoded for t in terms):
            continue
        order = sorted(range(len(terms)), key=lambda j: len(decoded[terms[j]][0]))
        cand = None
        for j in order:
            docs_j = decoded[terms[j]][0]
            cand = (
                docs_j
                if cand is None
                else np.intersect1d(cand, docs_j, assume_unique=True)
            )
            if len(cand) == 0:
                break
        if cand is None or len(cand) == 0:
            continue
        slices = []
        for t in terms:
            _, _, occ_doc, occ_pos = decoded[t]
            lo = np.searchsorted(occ_doc, cand, side="left")
            hi = np.searchsorted(occ_doc, cand, side="right")
            slices.append((occ_pos, lo, hi))
        t0 = terms[0]
        tdocs, tdls = decoded[t0][0], decoded[t0][1]
        dls = tdls[np.searchsorted(tdocs, cand)].astype(np.float64)
        hit_docs, hit_freqs = [], []
        for i, doc in enumerate(cand):
            arrs = [
                occ_pos[lo[i]:hi[i]].astype(np.int64)
                for occ_pos, lo, hi in slices
            ]
            f = interval_freq(arrs, ordered, max_gaps)
            if f > 0.0:
                hit_docs.append(int(doc))
                hit_freqs.append(f)
        if not hit_docs:
            continue
        docs_arr = np.asarray(hit_docs, dtype=np.int64)
        iv = np.asarray(hit_freqs, dtype=np.float64)
        dl = dls[np.searchsorted(cand, docs_arr)]
        raw = sum_idf * iv / (iv + k1 * (1.0 - b + b * dl / avgdl))
        if kk is None:
            parts.append((qid, docs_arr, raw))
        else:
            scores = np.round(raw, SCORE_DECIMALS)
            sel = deterministic_topk(docs_arr, scores, kk)
            parts.append((qid, docs_arr[sel], scores[sel]))
    return parts


def intervals_search_index(
    spark: SparkSession,
    path: str,
    queries,
    ordered: bool = False,
    max_gaps: int = -1,
    k: int = 10,
    tokenize=None,
    term_stats: DataFrame | dict | None = None,
) -> DataFrame:
    """ES ``intervals`` match rule over a persisted positional index ->
    (qid, doc_id, score, rank). ``queries``: (qid, query) rows; each
    query's analyzed terms form one match rule with the shared
    ``ordered`` / ``max_gaps`` parameters.

    ``ordered=True, max_gaps=0`` is the exact phrase — value-identical
    to ``phrase_search_index`` at slop=0 (tested). See the module
    docstring for the plan shape and the scoring contract.
    """
    from sgpt_spark.functions.analyzer import resolve_py_analyzer
    from sgpt_spark.operators.index_search import normalize_queries
    from sgpt_spark.operators.positions import (
        _decode_rows,
        _emit_topk_frame,
        read_positional_index,
    )

    positions, meta = read_positional_index(spark, path)
    queries, qid_type = normalize_queries(queries)
    tok = tokenize or resolve_py_analyzer(meta.analyzer)
    if isinstance(queries, DataFrame):
        pairs = [(r["qid"], r["query"]) for r in queries.collect()]
    else:
        pairs = list(queries)
    qrules: list = []
    for qid, qtext in pairs:
        terms = tuple(tok(qtext or ""))
        if terms:
            check_intervals_rule(terms, max_gaps)
            qrules.append((qid, terms))
    seg_schema = f"qid {qid_type}, doc_id long, score double"
    if not qrules:
        return (
            spark.createDataFrame([], seg_schema)
            .withColumn("rank", F.lit(1).cast("int"))
        )

    terms = sorted({t for _, ts in qrules for t in ts})
    cand = positions.filter(F.col("term").isin(terms))
    if isinstance(term_stats, dict):
        global_df = {t: int(term_stats[t]) for t in terms if t in term_stats}
    elif term_stats is not None:
        global_df = {
            r["term"]: int(r["df"])
            for r in term_stats.filter(F.col("term").isin(terms)).collect()
        }
    else:
        global_df = {
            r["term"]: int(r["df"])
            for r in cand.groupBy("term").agg(F.sum("df").alias("df")).collect()
        }
    idf = {t: idf_py(d, meta.n_docs) for t, d in global_df.items()}
    rules = [
        (qid, ts, sum(idf[t] for t in ts))
        for qid, ts in qrules
        if all(t in idf for t in ts)
    ]
    if not rules:
        return (
            spark.createDataFrame([], seg_schema)
            .withColumn("rank", F.lit(1).cast("int"))
        )
    b_rules = spark.sparkContext.broadcast(rules)
    k1, b, avgdl, codec = meta.k1, meta.b, meta.avgdl, meta.codec
    ordered_, max_gaps_, kk = ordered, max_gaps, k

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
                occ_doc = np.repeat(d_i, tf_i)
                decoded[term] = (d_i, dl_i, occ_doc, pos[os_:oe])
            parts = intervals_parts(
                decoded, b_rules.value, ordered_, max_gaps_, kk, k1, b, avgdl
            )
            if parts:
                yield _emit_topk_frame(parts)

    seg_hits = cand.repartition("segment").mapInPandas(
        score_wrapper, schema=seg_schema
    )
    return topk_per_group(seg_hits, k=k).select("qid", "doc_id", "score", "rank")
