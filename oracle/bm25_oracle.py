"""Pure-Python brute-force BM25 + IR-metrics oracle.

Independent of Spark: dicts, lists, math — deliberately the same shape as
the reference's in-memory pipeline (corpus dict -> exhaustive scoring ->
sorted top-k, custommodels/exact_search.py:80-132) so it doubles as a
behavioral spec. The Spark engine must be rank-identical and score-equal
(+-1e-6) to this oracle (SURVEY.md §5.2).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Callable, Iterable

K1 = 1.2
B = 0.75
SCORE_DECIMALS = 6


def tokenize_ws(text: str) -> list[str]:
    return [t for t in (text or "").split(" ") if t]


def bm25_index(
    corpus: dict[str, str], tokenize: Callable[[str], list[str]] = tokenize_ws
) -> dict:
    """Build the brute-force index: tf, df, doc lengths, N, avgdl."""
    tfs: dict[str, Counter] = {}
    doc_len: dict[str, int] = {}
    df: Counter = Counter()
    for doc_id, text in corpus.items():
        terms = tokenize(text)
        if not terms:
            continue  # empty-document filter (beir_dense_retriever.py:393-398)
        tfs[doc_id] = Counter(terms)
        doc_len[doc_id] = len(terms)
        for term in tfs[doc_id]:
            df[term] += 1
    n = len(doc_len)
    avgdl = sum(doc_len.values()) / n if n else 0.0
    return {"tfs": tfs, "doc_len": doc_len, "df": df, "n": n, "avgdl": avgdl}


def bm25_score(
    index: dict, query_terms: Iterable[str], doc_id: str, k1: float = K1, b: float = B
) -> float:
    tf = index["tfs"][doc_id]
    dl = index["doc_len"][doc_id]
    n, avgdl = index["n"], index["avgdl"]
    score = 0.0
    for term in query_terms:  # occurrences, not distinct terms
        f = tf.get(term, 0)
        if f == 0:
            continue
        d = index["df"][term]
        idf = math.log(1.0 + (n - d + 0.5) / (d + 0.5))
        score += idf * f / (f + k1 * (1.0 - b + b * dl / avgdl))
    return score


def bm25_topk(
    corpus: dict[str, str],
    queries: dict[str, str],
    k: int = 10,
    tokenize: Callable[[str], list[str]] = tokenize_ws,
    k1: float = K1,
    b: float = B,
) -> dict[str, list[tuple[str, float, int]]]:
    """Exhaustive top-k: qid -> [(doc_id, rounded_score, rank)].

    Deterministic total order: rounded score desc, doc_id asc — the
    engine's tie-break contract (SURVEY.md §7.4(4)).
    """
    index = bm25_index(corpus, tokenize)
    out: dict[str, list[tuple[str, float, int]]] = {}
    for qid, qtext in queries.items():
        qterms = tokenize(qtext)
        if not qterms:
            continue
        hits = []
        for doc_id in index["tfs"]:
            s = bm25_score(index, qterms, doc_id, k1, b)
            if s > 0.0:
                hits.append((doc_id, round(s, SCORE_DECIMALS)))
        hits.sort(key=lambda h: (-h[1], h[0]))
        out[qid] = [(d, s, i + 1) for i, (d, s) in enumerate(hits[:k])]
    return out


def bm25_multifield_topk(
    fields_corpus: dict[str, dict[str, str]],
    queries: dict[str, str],
    k: int = 10,
    tie_breaker: float = 0.5,
    tokenize: Callable[[str], list[str]] = tokenize_ws,
    k1: float = K1,
    b: float = B,
) -> dict[str, list[tuple[str, float, int]]]:
    """ES multi_match best_fields oracle: each field an independent BM25
    index (own N/avgdl/df); combine = max_f + tie_breaker*(sum_f - max_f).
    ``fields_corpus``: field -> {doc_id: field_text}."""
    indexes = {f: bm25_index(c, tokenize) for f, c in fields_corpus.items()}
    out: dict[str, list[tuple[str, float, int]]] = {}
    for qid, qtext in queries.items():
        qterms = tokenize(qtext)
        if not qterms:
            continue
        per_doc: dict[str, list[float]] = {}
        for idx in indexes.values():
            for doc_id in idx["tfs"]:
                s = bm25_score(idx, qterms, doc_id, k1, b)
                if s > 0.0:
                    per_doc.setdefault(doc_id, []).append(s)
        hits = []
        for doc_id, fscores in per_doc.items():
            mx = max(fscores)
            combined = mx + tie_breaker * (sum(fscores) - mx)
            hits.append((doc_id, round(combined, SCORE_DECIMALS)))
        hits.sort(key=lambda h: (-h[1], h[0]))
        out[qid] = [(d, s, i + 1) for i, (d, s) in enumerate(hits[:k])]
    return out


# --- IR metrics per the reference's InformationRetrievalEvaluator --------
# (biencoder/nli_msmarco/sentence-transformers/sentence_transformers/
#  evaluation/InformationRetrievalEvaluator.py:189-271)

def ndcg_at_k(ranked_docs: list[str], relevant: set[str], k: int) -> float:
    """Binary-gain nDCG@k; ideal DCG from len(relevant)
    (InformationRetrievalEvaluator.py:230-236)."""
    dcg = sum(
        1.0 / math.log2(i + 2) for i, d in enumerate(ranked_docs[:k]) if d in relevant
    )
    idcg = sum(1.0 / math.log2(i + 2) for i in range(min(k, len(relevant))))
    return dcg / idcg if idcg > 0 else 0.0


def map_at_k(ranked_docs: list[str], relevant: set[str], k: int) -> float:
    """MAP@k with denominator min(k, |relevant|)
    (InformationRetrievalEvaluator.py:238-249)."""
    hits, precision_sum = 0, 0.0
    for i, d in enumerate(ranked_docs[:k]):
        if d in relevant:
            hits += 1
            precision_sum += hits / (i + 1)
    denom = min(k, len(relevant))
    return precision_sum / denom if denom else 0.0


def mrr_at_k(ranked_docs: list[str], relevant: set[str], k: int) -> float:
    """First-relevant reciprocal rank (InformationRetrievalEvaluator.py:223-228)."""
    for i, d in enumerate(ranked_docs[:k]):
        if d in relevant:
            return 1.0 / (i + 1)
    return 0.0


def precision_at_k(ranked_docs: list[str], relevant: set[str], k: int) -> float:
    return sum(1 for d in ranked_docs[:k] if d in relevant) / k


def recall_at_k(ranked_docs: list[str], relevant: set[str], k: int) -> float:
    if not relevant:
        return 0.0
    return sum(1 for d in ranked_docs[:k] if d in relevant) / len(relevant)
