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

    __slots__ = (
        "blocks", "k1", "b", "avgdl", "first", "last", "bmax", "_cache",
        "codec", "_full",
    )

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
        self._full: tuple[np.ndarray, np.ndarray] | None = None

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

    def full_decode(self) -> tuple[np.ndarray, np.ndarray]:
        """(docs, tfn) of the WHOLE posting list, memoized (independent
        of the per-block cache: one batched pass beats stitching)."""
        if self._full is None:
            # len(), not truthiness — blocks arrive as numpy object
            # arrays under applyInPandas (same caveat as
            # merge_runs_streaming)
            if not len(self.blocks):
                self._full = (
                    np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
                )
            else:
                # one batched decode across ALL blocks (compress.
                # decode_many), not a per-block loop — the same whole-
                # column pass the TAAT scorer uses
                from sgpt_spark.functions.compress import decode_many

                _, docs, tfs, dls = decode_many([list(self.blocks)], self.codec)
                tfs = tfs.astype(np.float64)
                dls = dls.astype(np.float64)
                tfn = tfs / (
                    tfs + self.k1 * (1.0 - self.b + self.b * dls / self.avgdl)
                )
                self._full = (docs, tfn)
        return self._full

    def candidate_docs(self, min_block_bound: float, weight: float) -> np.ndarray:
        """Docs from blocks whose weighted block-max can still matter:
        decode only blocks with weight * block_max >= min_block_bound."""
        keep = np.flatnonzero(weight * self.bmax >= min_block_bound)
        if len(keep) == 0:
            return np.empty(0, dtype=np.int64)
        if 2 * len(keep) >= len(self.blocks):
            docs, _ = self.full_decode()
            if len(keep) == len(self.blocks):
                return docs
            # slice the kept blocks out of the memoized full decode via
            # cumulative block counts — no second decode pass
            counts = np.array(
                [blk["count"] for blk in self.blocks], dtype=np.int64
            )
            ends = np.cumsum(counts)
            starts = ends - counts
            return np.concatenate(
                [docs[starts[int(i)]:ends[int(i)]] for i in keep]
            )
        return np.concatenate([self.decode_block(int(i))[0] for i in keep])

    def lookup(self, doc_ids: np.ndarray) -> np.ndarray:
        """tfn for each doc id (0.0 where absent).

        Deep-k regime (the k=1000 reference depth): the top-k threshold
        stays below most block maxima, so a candidate batch touches
        nearly EVERY block and the per-touched-block Python loop is pure
        overhead (profiled at ~85% of segment WAND wall). When a call
        would touch at least half the blocks, decode the whole list once
        (memoized across the segment's queries) and answer with a single
        vectorized searchsorted; otherwise keep the targeted per-block
        path that block-max pruning relies on at shallow k."""
        out = np.zeros(len(doc_ids), dtype=np.float64)
        if len(doc_ids) == 0 or len(self.blocks) == 0:
            return out
        blk_idx = np.searchsorted(self.last, doc_ids, side="left")
        in_range = (blk_idx < len(self.blocks)) & (
            doc_ids >= self.first[np.minimum(blk_idx, len(self.blocks) - 1)]
        )
        touched = np.unique(blk_idx[in_range])
        if self._full is not None or 2 * len(touched) >= len(self.blocks):
            docs, tfn = self.full_decode()
            if len(docs):
                pos = np.searchsorted(docs, doc_ids)
                ok = (pos < len(docs)) & (
                    docs[np.minimum(pos, len(docs) - 1)] == doc_ids
                )
                out[ok] = tfn[pos[ok]]
            return out
        for bi in touched:
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
