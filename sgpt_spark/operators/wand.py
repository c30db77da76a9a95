"""Block-max WAND / MaxScore top-k over compressed posting blocks.

The pruning stage the reference lacks entirely (SURVEY.md §4 "Early
termination / candidate pruning — absent"): Elasticsearch gives SGPT
exhaustive-per-shard BM25; this module evaluates each query against a
segment while *skipping* posting blocks that provably cannot place a doc
into the top-k.

Algorithm (MaxScore with block-max refinement, term-at-a-time,
numpy-vectorized):

1. Sort query terms by upper bound UB_t = w_t * max_tfn(t) (w_t = qtf *
   idf). prefix_ub[i] = sum of UB over terms 0..i (ascending order).
2. Process terms from highest UB down, maintaining the current top-k
   threshold θ. A term t_j (and every lower-UB term after it) can stop
   contributing *new* candidate docs once prefix_ub[j] < θ - ε: a doc
   matching only those terms cannot reach the top-k. Its postings are
   then only consulted via targeted block lookups for already-known
   candidates.
3. Within a candidate-generating term, a block is decoded only if
   w_t * block_max + prefix_ub[j-1] >= θ - ε (block-max pruning).
4. Candidate docs get *exact* full scores: for every query term, the
   blocks covering those doc ids are located by binary search over
   block [first_doc, last_doc] fences and only those blocks are decoded.

Exactness: pruning uses ε = 1e-6 (one rounding step of the engine's
deterministic tie-break contract, operators/topk.py) so docs that could
tie after rounding are never skipped. Results are identical to the
exhaustive scorer — only faster (tested).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-6


class TermPostings:
    """Lazily-decoded posting list of one term within one segment."""

    __slots__ = ("blocks", "k1", "b", "avgdl", "first", "last", "bmax", "_cache", "codec")

    def __init__(
        self, blocks: list, k1: float, b: float, avgdl: float, codec: str = "varint"
    ):
        self.blocks = blocks
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.codec = codec
        self.first = np.array([blk["first_doc"] for blk in blocks], dtype=np.int64)
        self.last = np.array([blk["last_doc"] for blk in blocks], dtype=np.int64)
        # Upper bound on the block's tf-norm from the stored
        # avgdl-independent (max_tf, min_dl): tfn is increasing in tf and
        # decreasing in dl, so tfn <= tfn(max_tf, min_dl) for any avgdl
        # (valid even after incremental appends shift corpus stats).
        mtf = np.array([blk["max_tf"] for blk in blocks], dtype=np.float64)
        mdl = np.array([blk["min_dl"] for blk in blocks], dtype=np.float64)
        self.bmax = mtf / (mtf + k1 * (1.0 - b + b * mdl / avgdl))
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    @property
    def max_tfn(self) -> float:
        return float(self.bmax.max()) if len(self.bmax) else 0.0

    def decode_block(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """-> (doc_ids, tfn) of block i, memoized."""
        hit = self._cache.get(i)
        if hit is not None:
            return hit
        from sgpt_spark.functions.compress import decode_column, delta_decode

        blk = self.blocks[i]
        docs = delta_decode(
            blk["first_doc"], bytes(blk["doc_deltas"]), blk["count"], self.codec
        )
        tfs = decode_column(blk["tfs"], blk["count"], self.codec).astype(np.float64)
        dls = decode_column(blk["dls"], blk["count"], self.codec).astype(np.float64)
        tfn = tfs / (tfs + self.k1 * (1.0 - self.b + self.b * dls / self.avgdl))
        self._cache[i] = (docs, tfn)
        return docs, tfn

    def candidate_docs(self, min_block_bound: float, weight: float) -> np.ndarray:
        """Docs from blocks whose weighted block-max can still matter:
        decode only blocks with weight * block_max >= min_block_bound."""
        keep = np.flatnonzero(weight * self.bmax >= min_block_bound)
        if len(keep) == 0:
            return np.empty(0, dtype=np.int64)
        return np.concatenate([self.decode_block(int(i))[0] for i in keep])

    def lookup(self, doc_ids: np.ndarray) -> np.ndarray:
        """tfn for each doc id (0.0 where absent); decodes only the
        blocks whose [first, last] fence covers a requested id."""
        out = np.zeros(len(doc_ids), dtype=np.float64)
        if len(doc_ids) == 0 or len(self.blocks) == 0:
            return out
        blk_idx = np.searchsorted(self.last, doc_ids, side="left")
        in_range = (blk_idx < len(self.blocks)) & (
            doc_ids >= self.first[np.minimum(blk_idx, len(self.blocks) - 1)]
        )
        for bi in np.unique(blk_idx[in_range]):
            sel = np.flatnonzero(in_range & (blk_idx == bi))
            docs, tfn = self.decode_block(int(bi))
            pos = np.searchsorted(docs, doc_ids[sel])
            ok = (pos < len(docs)) & (docs[np.minimum(pos, len(docs) - 1)] == doc_ids[sel])
            out[sel[ok]] = tfn[pos[ok]]
        return out


def maxscore_topk(
    weighted_terms: list[tuple[float, TermPostings]], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_ids, raw_scores) of all docs that can reach the segment
    top-k (callers apply rounding + deterministic tie-break).

    ``weighted_terms``: [(w_t, postings)] with w_t = qtf * idf(t).
    """
    if not weighted_terms:
        z = np.empty(0, dtype=np.int64)
        return z, z.astype(np.float64)
    # ascending by upper bound
    terms = sorted(weighted_terms, key=lambda t: t[0] * t[1].max_tfn)
    ubs = np.array([w * tp.max_tfn for w, tp in terms])
    prefix_ub = np.cumsum(ubs)

    scored_docs = np.empty(0, dtype=np.int64)
    scored_vals = np.empty(0, dtype=np.float64)
    theta = -np.inf

    for j in range(len(terms) - 1, -1, -1):
        if prefix_ub[j] < theta - EPS:
            break  # this term and all lower-UB terms cannot add new docs
        w, tp = terms[j]
        rest_ub = prefix_ub[j - 1] if j > 0 else 0.0
        # block-max: a new doc found via this term is bounded by
        # w * block_max + rest_ub, so only blocks with
        # w * block_max >= theta - EPS - rest_ub can produce candidates.
        cand = tp.candidate_docs(theta - EPS - rest_ub, w)
        new = np.setdiff1d(cand, scored_docs, assume_unique=False)
        if len(new) == 0:
            continue
        new.sort()
        scores = np.zeros(len(new), dtype=np.float64)
        for w2, tp2 in terms:
            scores += w2 * tp2.lookup(new)
        scored_docs = np.concatenate((scored_docs, new))
        scored_vals = np.concatenate((scored_vals, scores))
        if len(scored_vals) >= k:
            theta = -np.partition(-scored_vals, k - 1)[k - 1]
    return scored_docs, scored_vals
