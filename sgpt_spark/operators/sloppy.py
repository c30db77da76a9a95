"""Sloppy phrase matching (ES ``match_phrase`` with ``slop`` > 0).

Lucene answers a sloppy PhraseQuery with ``SloppyPhraseMatcher``
(lucene/core/.../SloppyPhraseMatcher.java, public source): every term's
positions are ADJUSTED by the term's phrase offset (``pos - j`` for the
term at offset j), kept in a priority queue keyed by adjusted position,
and the matcher repeatedly advances the minimum entry; whenever the
advanced entry overtakes the next-smallest (or its positions exhaust),
the candidate window ``matchLength = end - min`` is tested against the
slop.  Each reported match contributes ``1 / (1 + matchLength)`` to the
document's "sloppy frequency", and BM25 scores the phrase as one
pseudo-term with that (fractional) freq and the summed idf of the
phrase terms — exactly the slop=0 contract in ``operators.positions``,
of which this is the strict generalization: at slop=0 a match needs
``matchLength == 0`` (all adjusted positions equal, i.e. a consecutive
occurrence) and weighs 1, so sloppy_freq == the exact-phrase count.

The reference delegates phrase queries to Elasticsearch wholesale
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10); this module
re-expresses the slop knob Spark-first on the positional sidecar.

Scale shape: candidates per segment are the docs containing ALL phrase
terms (the exact-phrase consecutive-start intersection cannot prune a
sloppy match, so the bound is the rarest term's df — same bound ES
pays); per candidate the match loop is O(total occurrences x log m).
All decode stays in the positional kernel's Arrow batch; only the
per-candidate-doc walk is Python, bounded by the rarest term's df.

Divergence (documented): phrases with REPEATED terms under slop > 0 are
refused loudly — Lucene's repeating-terms machinery (advanceRpts, term
groups) is out of scope; slop=0 handles repeats via the exact
intersection path as before.
"""

from __future__ import annotations

import heapq

import numpy as np

__all__ = ["sloppy_freq", "sloppy_parts", "check_sloppy_phrase"]


def sloppy_freq(adjusted: list[np.ndarray], slop: int) -> float:
    """Sloppy frequency of ONE document for ONE phrase.

    ``adjusted``: one ascending int array per phrase term — the term's
    in-doc occurrence positions minus the term's phrase offset.  Returns
    sum over reported matches of ``1/(1+matchLength)`` (0.0 = no match).

    Faithful port of SloppyPhraseMatcher.nextMatch() for non-repeating
    terms: pq holds (adjusted position, phrase offset, cursor); ``end``
    is the maximum adjusted position seen so far across all advances.
    """
    m = len(adjusted)
    if m == 0 or any(len(a) == 0 for a in adjusted):
        return 0.0
    if m == 1:
        # single-term phrase: every occurrence is a 0-length match
        return float(len(adjusted[0]))
    # (position, phrase offset) heap; cursors index the next unread pos
    cur = [1] * m
    heap = [(int(a[0]), j) for j, a in enumerate(adjusted)]
    heapq.heapify(heap)
    end = max(p for p, _ in heap)
    freq = 0.0
    positioned = True
    while positioned:
        # nextMatch(): pop the min entry, advance it until it overtakes
        # the next-smallest (window fully minimized) or exhausts; test
        # the minimized window against the slop either way
        pos, j = heapq.heappop(heap)
        match_length = end - pos
        nxt = heap[0][0]
        while True:
            if cur[j] >= len(adjusted[j]):  # this term's pps exhausted
                positioned = False
                if match_length <= slop:
                    freq += 1.0 / (1.0 + match_length)
                break
            pos = int(adjusted[j][cur[j]])
            cur[j] += 1
            if pos > end:
                end = pos
            if pos > nxt:  # done minimizing the current window
                heapq.heappush(heap, (pos, j))
                if match_length <= slop:
                    freq += 1.0 / (1.0 + match_length)
                    break  # match reported; next outer pass re-pops
                pos, j = heapq.heappop(heap)
                nxt = heap[0][0]
                match_length = end - pos
            else:
                ml2 = end - pos
                if ml2 < match_length:
                    match_length = ml2
    return freq


def check_sloppy_phrase(terms: tuple, slop: int) -> None:
    """Refuse the undefined combination loudly (documented divergence)."""
    if slop > 0 and len(set(terms)) != len(terms):
        raise ValueError(
            f"sloppy phrase with repeated terms is unsupported: {terms!r} "
            "(Lucene's repeating-terms machinery is out of scope; "
            "slop=0 handles repeats via the exact intersection path)"
        )
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")


def sloppy_parts(
    decoded: dict,
    phrases: list,
    slop: int,
    kk,
    k1: float,
    b: float,
    avgdl: float,
) -> list:
    """Score one segment's decoded positional postings against every
    phrase with slop > 0 -> [(qid, doc_ids, scores)] — the sloppy twin
    of ``positions._phrase_parts`` (same inputs, same output contract:
    top-kk per query rounded, or ALL hits unrounded when kk is None).

    ``decoded``: term -> (docs, dls, occ_doc, occ_pos); ``phrases``:
    [(qid, terms tuple, sum_idf)].
    """
    from sgpt_spark.operators.index_search import deterministic_topk
    from sgpt_spark.operators.topk import SCORE_DECIMALS

    if not decoded:
        return []
    parts = []
    for qid, terms, sum_idf in phrases:
        check_sloppy_phrase(terms, slop)
        if any(t not in decoded for t in terms):
            continue
        # candidate docs: contain ALL phrase terms (rarest-first bound)
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
        # per-term slices: occurrence arrays are doc-major ascending
        slices = []
        for j, t in enumerate(terms):
            _, _, occ_doc, occ_pos = decoded[t]
            lo = np.searchsorted(occ_doc, cand, side="left")
            hi = np.searchsorted(occ_doc, cand, side="right")
            slices.append((occ_pos, lo, hi, j))
        t0 = terms[0]
        tdocs, tdls = decoded[t0][0], decoded[t0][1]
        dls = tdls[np.searchsorted(tdocs, cand)].astype(np.float64)
        hit_docs = []
        hit_freqs = []
        for i, doc in enumerate(cand):
            adjusted = [
                occ_pos[lo[i]:hi[i]].astype(np.int64) - j
                for occ_pos, lo, hi, j in slices
            ]
            f = sloppy_freq(adjusted, slop)
            if f > 0.0:
                hit_docs.append(int(doc))
                hit_freqs.append(f)
        if not hit_docs:
            continue
        docs_arr = np.asarray(hit_docs, dtype=np.int64)
        sf = np.asarray(hit_freqs, dtype=np.float64)
        dl = dls[np.searchsorted(cand, docs_arr)]
        raw = sum_idf * sf / (sf + k1 * (1.0 - b + b * dl / avgdl))
        if kk is None:
            parts.append((qid, docs_arr, raw))
        else:
            scores = np.round(raw, SCORE_DECIMALS)
            sel = deterministic_topk(docs_arr, scores, kk)
            parts.append((qid, docs_arr[sel], scores[sel]))
    return parts
