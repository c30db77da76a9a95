"""Similarity search over an embedding column (dense path).

Re-expresses the reference's chunked exact search
(custommodels/exact_search.py:80-132: per-chunk score matrix ->
torch.topk -> heap merge) in Spark:

- ``cosine_topk``      brute-force exact top-k: per-partition numpy
  matmul + partial top-k inside a pandas UDF, then the same global
  window merge the BM25 path uses. The scale path — shuffle volume is
  k rows per (query, partition), never |docs| x |queries|.
- ``cosine_topk_exhaustive``  pure-JVM variant (zip_with/aggregate dot
  product) used as the small-scale oracle twin: expressible 1:1 in
  DuckDB (list_cosine_similarity), so the driver gate can value-check it.
- ``lsh_cosine_topk``  random-hyperplane LSH bucketing: candidates share
  a signature bucket in at least one of ``n_tables`` tables; exact
  rescoring of candidates only. Approximate recall, tested against the
  brute force.

Deterministic: scores rounded to 6 dp before ranking, ties broken by id
asc (the engine-wide contract, operators/topk.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group

SEED = 42


def _as_matrix(rows: list[tuple]) -> tuple[list, np.ndarray]:
    ids = [r[0] for r in rows]
    mat = np.asarray([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    qid_col: str = "qid",
    qemb_col: str = "embedding",
    score_function: str = "cos_sim",
) -> DataFrame:
    """Exact dense top-k: (qid, vec_id, score, rank).

    Queries are collected + broadcast (small by contract); the corpus
    streams through a pandas UDF that computes a [batch x Q] similarity
    matrix and keeps per-partition top-k per query.

    ``score_function``: 'cos_sim' or 'dot' — the reference's pluggable
    scorer dict (exact_search.py:27-28: {"cos_sim": cos_sim,
    "dot": dot_score}).
    """
    if score_function not in ("cos_sim", "dot"):
        raise ValueError(f"unknown score_function {score_function!r}: cos_sim|dot")
    normalize = score_function == "cos_sim"
    spark = embeddings.sparkSession
    qrows = [(r[qid_col], r[qemb_col]) for r in queries.collect()]
    if not qrows:
        return spark.createDataFrame([], "qid long, vec_id long, score double, rank int")
    qids, qmat = _as_matrix(qrows)
    if normalize:
        qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    bq = spark.sparkContext.broadcast((qids, qmat))
    kk = k

    from sgpt_spark.operators.index_search import deterministic_topk

    def score_part(batches):
        qids_b, qn = bq.value
        best: dict = {}
        for pdf in batches:
            ids = pdf["_id"].to_numpy()
            mat = np.asarray(pdf["_emb"].tolist(), dtype=np.float64)
            if normalize:
                mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = np.round(mat @ qn.T, SCORE_DECIMALS)  # [batch x Q]
            for qi in range(len(qids_b)):
                col = sims[:, qi]
                keep = deterministic_topk(ids, col, kk)
                cur = best.setdefault(qi, ([], []))
                cur[0].extend(ids[keep].tolist())
                cur[1].extend(col[keep].tolist())
        out_q, out_i, out_s = [], [], []
        for qi, (ids_l, sims_l) in best.items():
            ids_a = np.asarray(ids_l)
            sims_a = np.asarray(sims_l)
            order = deterministic_topk(ids_a, sims_a, kk)
            out_q.extend([bq.value[0][qi]] * len(order))
            out_i.extend(ids_a[order].tolist())
            out_s.extend(sims_a[order].tolist())
        yield pd.DataFrame({"qid": out_q, "vec_id": out_i, "score": out_s})

    src = embeddings.select(F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb"))
    qid_t = queries.schema[qid_col].dataType.simpleString()
    id_t = embeddings.schema[id_col].dataType.simpleString()
    part = src.mapInPandas(score_part, schema=f"qid {qid_t}, vec_id {id_t}, score double")
    return topk_per_group(part, group_col="qid", score_col="score", id_col="vec_id", k=k).select(
        "qid", "vec_id", "score", "rank"
    )


def cosine_topk_exhaustive(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    qid_col: str = "qid",
    qemb_col: str = "embedding",
) -> DataFrame:
    """JVM-only exact variant: broadcast-join every (doc, query) pair and
    compute cosine with zip_with/aggregate — the oracle-checkable twin
    (DuckDB list_cosine_similarity). O(|docs| x |queries|) rows: fine at
    oracle scale, not the scale path."""
    q = queries.select(
        F.col(qid_col).alias("qid"), F.col(qemb_col).cast("array<double>").alias("qemb")
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).cast("array<double>").alias("demb")
    )
    dot = F.aggregate(
        F.zip_with("qemb", "demb", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .withColumn("score", dot / (norm(F.col("qemb")) * norm(F.col("demb"))))
        .select("qid", "vec_id", "score")
    )
    return topk_per_group(scored, group_col="qid", score_col="score", id_col="vec_id", k=k).select(
        "qid", "vec_id", "score", "rank"
    )


def dense_search_join(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_query_chunks: int | None = None,
    n_emb_blocks: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    qid_col: str = "qid",
    qemb_col: str = "embedding",
    score_function: str = "cos_sim",
) -> DataFrame:
    """Join-based exact dense top-k — the dense twin of
    ``index_search.search_index_join``: the query set STAYS IN THE PLAN
    (never ``collect()``-ed to the driver), so it scales to millions of
    queries where ``cosine_topk``'s broadcast contract breaks.

    Distributed block nested-loop: queries are hash-packed into C chunk
    rows and embeddings into B block rows (ids + row-major flattened
    matrix per row — Arrow moves each matrix once, no per-pair
    duplication); their crossJoin is only B x C *rows*, each scored with
    ONE numpy matmul in ``mapInPandas`` that emits at most k rows per
    (query, block). Shuffle volume is C x |E| + B x |Q| packed bytes
    plus k x B rows per query into the final global top-k merge — the
    classic communication-optimal block tradeoff. Same deterministic
    contract as ``cosine_topk`` (round to 6 dp, ties by id asc):
    identical output (tested).

    Sizing: by default the block/chunk counts are DATA-aware, not
    cluster-aware — each packed row targets ~8 MB (row count derived
    from the embedding dimension), so a 10^9-vector corpus gets ~10^5
    blocks of bounded size instead of 32 multi-GB rows, and the pair
    relation is repartitioned so no task materializes more than a few
    packed rows per Arrow batch. Pass ``n_emb_blocks``/``n_query_chunks``
    to override (e.g. fewer, larger blocks when executors have the
    memory — fewer pairs means less replication: data volume is
    C x |E| + B x |Q| packed bytes).
    """
    if score_function not in ("cos_sim", "dot"):
        raise ValueError(f"unknown score_function {score_function!r}: cos_sim|dot")
    normalize = score_function == "cos_sim"
    spark = embeddings.sparkSession
    par = spark.sparkContext.defaultParallelism
    if n_query_chunks is None or n_emb_blocks is None:
        first = embeddings.select(F.size(F.col(emb_col)).alias("d")).limit(1).collect()
        dim = int(first[0]["d"]) if first else 1
        # ~8 MB of float64 per packed row, floor 1024 rows
        rows_per_block = max(8 * 1024 * 1024 // max(dim * 8, 1), 1024)
        if n_emb_blocks is None:
            n_emb_blocks = max(-(-embeddings.count() // rows_per_block), par)
        if n_query_chunks is None:
            n_query_chunks = max(-(-queries.count() // rows_per_block), 1)
    n_c = max(int(n_query_chunks), 1)
    n_b = max(int(n_emb_blocks), 1)
    qid_t = queries.schema[qid_col].dataType.simpleString()
    id_t = embeddings.schema[id_col].dataType.simpleString()

    def packer(id_name: str):
        def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            mat = np.asarray(pdf["_emb"].tolist(), dtype=np.float64)
            if normalize:
                mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            return pd.DataFrame(
                {
                    "grp": [int(key[0])],
                    id_name: [pdf["_id"].tolist()],
                    "flat": [mat.ravel().tolist()],
                    "dim": [int(mat.shape[1]) if len(pdf) else 0],
                }
            )

        return pack

    qpacked = (
        queries.select(F.col(qid_col).alias("_id"), F.col(qemb_col).alias("_emb"))
        .groupBy(F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(n_c)).alias("_g"))
        .applyInPandas(
            packer("ids"), schema=f"grp int, ids array<{qid_t}>, flat array<double>, dim int"
        )
        .select(
            F.col("ids").alias("qids"), F.col("flat").alias("qflat"), F.col("dim").alias("qdim")
        )
    )
    epacked = (
        embeddings.select(F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb"))
        .groupBy(F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(n_b)).alias("_g"))
        .applyInPandas(
            packer("ids"), schema=f"grp int, ids array<{id_t}>, flat array<double>, dim int"
        )
        .select(
            F.col("ids").alias("vids"), F.col("flat").alias("eflat"), F.col("dim").alias("edim")
        )
    )

    from sgpt_spark.operators.index_search import deterministic_topk

    kk = k

    def score_pairs(batches):
        for pdf in batches:
            out_q, out_i, out_s = [], [], []
            for row in pdf.itertuples(index=False):
                qids = np.asarray(row.qids)
                vids = np.asarray(row.vids)
                if not len(qids) or not len(vids):
                    continue
                qm = np.asarray(row.qflat, dtype=np.float64).reshape(len(qids), row.qdim)
                em = np.asarray(row.eflat, dtype=np.float64).reshape(len(vids), row.edim)
                sims = np.round(em @ qm.T, SCORE_DECIMALS)  # [block x chunk]
                for qi in range(len(qids)):
                    keep = deterministic_topk(vids, sims[:, qi], kk)
                    out_q.extend([qids[qi]] * len(keep))
                    out_i.extend(vids[keep].tolist())
                    out_s.extend(sims[keep, qi].tolist())
            yield pd.DataFrame({"qid": out_q, "vec_id": out_i, "score": out_s})

    # spread the B x C pair rows so no task's Arrow batch materializes
    # more than a handful of packed rows at once (each row is ~8-16 MB)
    pairs = qpacked.crossJoin(epacked)
    n_part = min(n_b * n_c, max(par * 4, par))
    part = pairs.repartition(n_part).mapInPandas(
        score_pairs, schema=f"qid {qid_t}, vec_id {id_t}, score double"
    )
    return topk_per_group(part, group_col="qid", score_col="score", id_col="vec_id", k=k).select(
        "qid", "vec_id", "score", "rank"
    )


def paraphrase_mining(
    embeddings: DataFrame,
    max_pairs: int = 100,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    score_function: str = "cos_sim",
) -> DataFrame:
    """Globally-capped most-similar pairs within ONE embedding set —
    the reference's priority-queue pair mining
    (util.py:148-189 paraphrase_mining: chunked score matrices, per-chunk
    topk, global heap capped at max_pairs).

    EXACT, unlike the reference's approximation: a pair in the global
    top-N has at most N-1 better pairs, so each endpoint sees at most
    N-1 better partners — per-item top-(N+1) retrieval (self included)
    provably contains every global top-N pair. So: self-similarity
    top-(max_pairs+1) per item -> drop self -> canonicalize (id_a<id_b)
    -> dedup -> global top-N with deterministic ties.

    Contract: the set must fit a broadcast (the reference holds it in
    one GPU tensor, util.py:197-204 — same envelope); for web-scale
    near-dup mining use dedup.near_dup_pairs instead.
    """
    hits = cosine_topk(
        embeddings,
        embeddings.select(F.col(id_col).alias("qid"), F.col(emb_col).alias("embedding")),
        k=max_pairs + 1,
        id_col=id_col,
        emb_col=emb_col,
        score_function=score_function,
    )
    pairs = (
        hits.filter(F.col("qid") != F.col("vec_id"))
        .select(
            F.least("qid", "vec_id").alias("id_a"),
            F.greatest("qid", "vec_id").alias("id_b"),
            "score",
        )
        .groupBy("id_a", "id_b")
        .agg(F.max("score").alias("score"))
    )
    return (
        pairs.orderBy(F.col("score").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(max_pairs)
    )


def _lloyd_refine(src: DataFrame, cent: np.ndarray, n_iters: int) -> np.ndarray:
    """``n_iters`` spherical-k-means refinement passes over ``src``
    (columns ``_id``, ``_emb``), returning the refined centroid matrix.

    One ``mapInPandas`` per pass does assignment AND per-cluster partial
    sums in the same numpy matmul: each task accumulates a local
    (n_clusters x dim) sum matrix + count vector across its Arrow
    batches and emits ONE row per non-empty cluster per partition —
    (cluster, sum_vec, n). The driver combines at most
    n_partitions x n_clusters tiny rows. This replaces the round-2
    plan's dim-many ``F.sum(element_at(...))`` aggregate columns, which
    at 768-4096-dim real embeddings meant thousands of Catalyst
    expressions per pass; here the plan shape is dimension-independent.
    """
    spark = src.sparkSession
    n_clusters, dim = cent.shape
    for _ in range(max(n_iters, 0)):
        bc = spark.sparkContext.broadcast(cent)

        def partial_sums(batches):
            c = bc.value
            sums = np.zeros((c.shape[0], c.shape[1]), dtype=np.float64)
            counts = np.zeros(c.shape[0], dtype=np.int64)
            for pdf in batches:
                mat = np.asarray(pdf["_emb"].tolist(), dtype=np.float64)
                nrm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                cl = np.argmax(nrm @ c.T, axis=1)
                np.add.at(sums, cl, mat)
                np.add.at(counts, cl, 1)
            live = np.flatnonzero(counts)
            yield pd.DataFrame(
                {
                    "cluster": live.astype(np.int32),
                    "sum_vec": [sums[i].tolist() for i in live],
                    "n": counts[live],
                }
            )

        parts = src.mapInPandas(
            partial_sums, schema="cluster int, sum_vec array<double>, n long"
        ).collect()
        new_cent = cent.copy()
        tot = np.zeros((n_clusters, dim), dtype=np.float64)
        cnt = np.zeros(n_clusters, dtype=np.int64)
        for r in parts:
            tot[r["cluster"]] += np.asarray(r["sum_vec"], dtype=np.float64)
            cnt[r["cluster"]] += r["n"]
        for ci in np.flatnonzero(cnt):
            nrm = np.linalg.norm(tot[ci])
            if nrm > 1e-12:
                new_cent[ci] = tot[ci] / nrm
        cent = new_cent
    return cent


def _ivf_fit(
    embeddings: DataFrame,
    n_centroids: int,
    n_iters: int,
    id_col: str,
    emb_col: str,
) -> tuple[np.ndarray, DataFrame]:
    """IVF build shared by ``ivf_cosine_topk`` and ``ivf_search_join``:
    deterministic hash-sampled seed centroids, ``n_iters`` spherical
    Lloyd passes (``_lloyd_refine``), final inverted lists. Returns the
    (unit-normalized) centroid matrix and the (vec_id, cluster) lists
    DataFrame."""
    spark = embeddings.sparkSession
    # --- seed centroids: hash-sampled vectors, unit-normalized --------
    n_emb = embeddings.count()
    stride = max(n_emb // n_centroids, 1)
    seeds = (
        embeddings.select(F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb"))
        .filter(F.xxhash64(F.col("_id")) % stride == 0)
        .orderBy("_id")
        .limit(n_centroids)
        .collect()
    )
    cent = np.asarray([r["_emb"] for r in seeds], dtype=np.float64)
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)

    src = embeddings.select(F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb"))
    id_t = embeddings.schema[id_col].dataType.simpleString()

    def assigner(centroids: np.ndarray):
        bc = spark.sparkContext.broadcast(centroids)

        def assign(batches):
            c = bc.value
            for pdf in batches:
                mat = np.asarray(pdf["_emb"].tolist(), dtype=np.float64)
                mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                cl = np.argmax(mat @ c.T, axis=1)
                yield pd.DataFrame({"vec_id": pdf["_id"].to_numpy(), "cluster": cl.astype(np.int32)})

        return src.mapInPandas(assign, schema=f"vec_id {id_t}, cluster int")

    # --- Lloyd refinement: assign -> per-cluster mean (spherical) -----
    cent = _lloyd_refine(src, cent, n_iters)
    return cent, assigner(cent)


def ivf_search_join(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    qid_col: str = "qid",
    qemb_col: str = "embedding",
) -> DataFrame:
    """Join-based IVF ANN — ``ivf_cosine_topk`` with probe assignment
    done IN THE PLAN (the IVF member of the join-based family next to
    ``search_index_join`` / ``dense_search_join`` / ``lsh_search_join``).

    The build is identical (shared ``_ivf_fit``, deterministic). Each
    query's ``n_probe`` nearest centroids are computed by a
    ``mapInPandas`` matmul against the broadcast centroid matrix —
    centroid count is small by construction, the query set is not —
    then probes join the inverted lists and candidates get the exact
    JVM cosine. No driver collect of the query set anywhere, so the
    same argsort tie-order as the collect path yields IDENTICAL output
    (tested) while millions of queries scale horizontally.
    """
    spark = embeddings.sparkSession
    cent, lists = _ivf_fit(embeddings, n_centroids, n_iters, id_col, emb_col)
    bc = spark.sparkContext.broadcast(cent)
    npb = min(n_probe, cent.shape[0])
    qid_t = queries.schema[qid_col].dataType.simpleString()

    def probe(batches):
        c = bc.value
        for pdf in batches:
            mat = np.asarray(pdf["_emb"].tolist(), dtype=np.float64)
            qn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = qn @ c.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :npb]
            ids = np.repeat(pdf["_id"].to_numpy(), npb)
            yield pd.DataFrame({"qid": ids, "cluster": top.ravel().astype(np.int32)})

    probes = queries.select(
        F.col(qid_col).alias("_id"), F.col(qemb_col).alias("_emb")
    ).mapInPandas(probe, schema=f"qid {qid_t}, cluster int")

    cand = lists.join(probes, "cluster").select("qid", "vec_id")
    q = queries.select(
        F.col(qid_col).alias("qid"), F.col(qemb_col).cast("array<double>").alias("qemb")
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).cast("array<double>").alias("demb")
    )
    dot = F.aggregate(
        F.zip_with("qemb", "demb", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    scored = (
        cand.join(e, "vec_id")
        .join(q, "qid")
        .withColumn("score", dot / (norm(F.col("qemb")) * norm(F.col("demb"))))
        .select("qid", "vec_id", "score")
    )
    return topk_per_group(scored, group_col="qid", score_col="score", id_col="vec_id", k=k).select(
        "qid", "vec_id", "score", "rank"
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    qid_col: str = "qid",
    qemb_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate cosine top-k — the inverted-file ANN scale
    path next to ``lsh_cosine_topk``.

    Build: deterministic seed centroids (xxhash64-sampled vectors — no
    RNG, reproducible across runs/partitionings), refined by ``n_iters``
    Lloyd iterations (assign + per-cluster partial sums fused in one
    broadcast-centroid mapInPandas matmul per pass — plan shape is
    dimension-independent, see ``_lloyd_refine``); then every vector is
    assigned to its nearest centroid (the inverted lists).

    Query: each query probes its ``n_probe`` nearest centroids
    (driver-side — centroid count is small by construction); candidates
    are the union of those lists, exactly rescored, top-k with the
    engine tie-break. Scan cost per query ~ n_probe/n_centroids of the
    corpus instead of all of it; at 10^9+ vectors this is the standard
    recall/throughput dial (n_probe up = recall up).
    """
    spark = embeddings.sparkSession
    qrows = [(r[qid_col], r[qemb_col]) for r in queries.collect()]
    if not qrows:
        return spark.createDataFrame([], "qid long, vec_id long, score double, rank int")

    cent, lists = _ivf_fit(embeddings, n_centroids, n_iters, id_col, emb_col)

    # --- probe: per query, its n_probe nearest centroids --------------
    qids, qmat = _as_matrix(qrows)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    sims = qn @ cent.T
    probe_rows = []
    for qi, qid in enumerate(qids):
        top = np.argsort(-sims[qi], kind="stable")[:n_probe]
        probe_rows.extend((qid, int(c)) for c in top)
    qid_t = queries.schema[qid_col].dataType.simpleString()
    probes = spark.createDataFrame(probe_rows, f"qid {qid_t}, cluster int")

    cand = lists.join(F.broadcast(probes), "cluster").select("qid", "vec_id")
    q = queries.select(
        F.col(qid_col).alias("qid"), F.col(qemb_col).cast("array<double>").alias("qemb")
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).cast("array<double>").alias("demb")
    )
    dot = F.aggregate(
        F.zip_with("qemb", "demb", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    scored = (
        cand.join(e, "vec_id")
        .join(F.broadcast(q), "qid")
        .withColumn("score", dot / (norm(F.col("qemb")) * norm(F.col("demb"))))
        .select("qid", "vec_id", "score")
    )
    return topk_per_group(scored, group_col="qid", score_col="score", id_col="vec_id", k=k).select(
        "qid", "vec_id", "score", "rank"
    )


def rh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = SEED,
) -> DataFrame:
    """-> (vec_id, table, bucket): random-hyperplane signatures, one row
    per (vector, table). Shared by ``lsh_cosine_topk``,
    ``lsh_candidate_pairs`` and ``embedding_communities``. Deterministic
    (seeded plane matrix, broadcast to every worker); |docs| x n_tables
    narrow rows is the only data this stage materializes."""
    if n_planes > 62:
        raise ValueError("n_planes must fit in an int64 bucket id")
    spark = embeddings.sparkSession
    first = embeddings.select(F.size(F.col(emb_col)).alias("d")).limit(1).collect()
    if not first:
        return spark.createDataFrame(
            [], f"vec_id {embeddings.schema[id_col].dataType.simpleString()}, table int, bucket long"
        )
    dim = int(first[0]["d"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    pow2 = (1 << np.arange(n_planes, dtype=np.int64))
    b_planes = spark.sparkContext.broadcast(planes)

    def bucketize(batches):
        pls = b_planes.value
        for pdf in batches:
            mat = np.asarray(pdf["_emb"].tolist(), dtype=np.float64)
            out_id, out_t, out_b = [], [], []
            for t in range(pls.shape[0]):
                bits = ((mat @ pls[t].T) > 0).astype(np.int64)
                vals = bits @ pow2
                out_id.extend(pdf["_id"].tolist())
                out_t.extend([t] * len(pdf))
                out_b.extend(vals.tolist())
            yield pd.DataFrame({"vec_id": out_id, "table": out_t, "bucket": out_b})

    src = embeddings.select(F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb"))
    id_t = embeddings.schema[id_col].dataType.simpleString()
    return src.mapInPandas(bucketize, schema=f"vec_id {id_t}, table int, bucket long")


def lsh_search_join(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    qid_col: str = "qid",
    qemb_col: str = "embedding",
) -> DataFrame:
    """Join-based LSH ANN — ``lsh_cosine_topk`` with the query set kept
    IN THE PLAN (the ANN member of the join-based family next to
    ``search_index_join`` and ``dense_search_join``).

    Both sides run the SAME seeded ``rh_buckets`` stage (identical plane
    matrix -> identical buckets -> identical candidates and scores as
    ``lsh_cosine_topk``, tested), candidates are the (table, bucket)
    equi-join — a plain shuffle join that AQE broadcasts only if the
    query side really is small — and only candidates get the exact JVM
    cosine. Data volume: |docs| x n_tables + |queries| x n_tables narrow
    bucket rows; no driver collect anywhere, so millions of queries
    scale horizontally.
    """
    db = rh_buckets(embeddings, n_planes, n_tables, id_col=id_col, emb_col=emb_col)
    qb = (
        rh_buckets(queries, n_planes, n_tables, id_col=qid_col, emb_col=qemb_col)
        .withColumnRenamed("vec_id", "qid")
    )
    cand = db.join(qb, ["table", "bucket"]).select("qid", "vec_id").distinct()
    q = queries.select(
        F.col(qid_col).alias("qid"), F.col(qemb_col).cast("array<double>").alias("qemb")
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).cast("array<double>").alias("demb")
    )
    dot = F.aggregate(
        F.zip_with("qemb", "demb", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    scored = (
        cand.join(e, "vec_id")
        .join(q, "qid")
        .withColumn("score", dot / (norm(F.col("qemb")) * norm(F.col("demb"))))
        .select("qid", "vec_id", "score")
    )
    return topk_per_group(scored, group_col="qid", score_col="score", id_col="vec_id", k=k).select(
        "qid", "vec_id", "score", "rank"
    )


def lsh_candidate_pairs(
    embeddings: DataFrame,
    n_planes: int = 6,
    n_tables: int = 12,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = SEED,
) -> DataFrame:
    """-> (id_a, id_b) distinct candidate pairs: vectors sharing a
    random-hyperplane bucket in ANY table. The within-set twin of the
    query-side bucketing in ``lsh_cosine_topk`` — a self-equi-join on
    (table, bucket), so comparisons scale with bucket occupancy, not
    |docs|^2. Similar pairs (cosine >= ~0.8) collide with prob
    1 - (1 - (1 - theta/pi)^n_planes)^n_tables — at the defaults >99.9%
    per pair; raise n_tables for stricter recall."""
    b = rh_buckets(
        embeddings, n_planes=n_planes, n_tables=n_tables,
        id_col=id_col, emb_col=emb_col, seed=seed,
    )
    b2 = b.select(
        F.col("table"), F.col("bucket"), F.col("vec_id").alias("id_b")
    )
    return (
        b.select("table", "bucket", F.col("vec_id").alias("id_a"))
        .join(b2, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def embedding_communities(
    embeddings: DataFrame,
    threshold: float = 0.8,
    min_size: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    candidates: str = "lsh",
    n_planes: int = 6,
    n_tables: int = 12,
) -> DataFrame:
    """-> (vec_id, community_id) for vectors in communities of
    >= min_size mutually-reachable (cosine >= threshold) members — the
    distributed re-expression of the reference's community detection +
    greedy overlap removal (sentence-transformers util.py:299-347,
    432-446). Where the reference greedily drops overlapping
    communities (order-dependent), this computes connected components of
    the threshold graph: deterministic, order-free, and each vector
    belongs to exactly one community by construction.

    Candidate generation (``candidates``):
      - ``"lsh"`` (default, the scale path): random-hyperplane bucket
        self-join (``lsh_candidate_pairs``) + exact rescore of
        bucket-mates only — comparisons scale with bucket occupancy.
        Edges the LSH misses can split a community (tunable via
        n_tables); at the defaults the per-pair miss rate at
        threshold 0.8 is <0.1%.
      - ``"exact"``: all-pairs broadcast crossJoin — exact, the oracle
        twin; O(|docs|^2) comparisons, small sets only.
    The component step is shared with dedup.connected_components.
    """
    if candidates not in ("lsh", "exact"):
        raise ValueError(f"unknown candidates mode {candidates!r}: lsh|exact")
    if candidates == "lsh":
        # Warn when THIS configuration is inadequate for THIS threshold,
        # not merely when the caller typed the defaults (round-4 review):
        # for random hyperplanes, a pair at exactly cosine=threshold
        # collides in one table with p = (1 - theta/pi)^n_planes, so its
        # cross-table miss probability is (1-p)^n_tables — and a missed
        # edge can SPLIT a community. More tables / fewer planes (or
        # candidates="exact") restores recall: the gate query needs 4x24
        # at threshold 0.4. The 5% cutoff keeps the tuned-default regime
        # (threshold ~0.8, miss ~3%) silent.
        import math
        import warnings

        theta = math.acos(max(min(threshold, 1.0), -1.0))
        p_table = (1.0 - theta / math.pi) ** n_planes
        miss = (1.0 - p_table) ** n_tables
        if miss > 0.05:
            warnings.warn(
                f"embedding_communities: LSH candidates with n_planes="
                f"{n_planes}, n_tables={n_tables} miss a boundary pair at "
                f"cosine={threshold} with probability ~{miss:.0%} (missed "
                f"edges can split communities). Raise n_tables / lower "
                f"n_planes, or pass candidates='exact' for exact "
                f"(quadratic) candidates.",
                stacklevel=2,
            )
    from sgpt_spark.operators.dedup import connected_components

    e1 = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(emb_col).cast("array<double>").alias("ea")
    )
    e2 = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(emb_col).cast("array<double>").alias("eb")
    )
    if candidates == "lsh":
        cand = lsh_candidate_pairs(
            embeddings, n_planes=n_planes, n_tables=n_tables,
            id_col=id_col, emb_col=emb_col,
        )
        # exact rescore of candidates only: two shuffle joins on id
        # (embedding sides are NOT broadcast — corpus-sized)
        paired = cand.join(e1, "id_a").join(e2, "id_b")
    else:
        paired = e1.join(F.broadcast(e2), F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    pairs = (
        paired
        .withColumn("score", F.round(dot / (norm(F.col("ea")) * norm(F.col("eb"))), SCORE_DECIMALS))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b")
    )
    nodes = embeddings.select(F.col(id_col).alias("doc_id"))
    comp = connected_components(nodes, pairs)
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    return (
        comp.join(sizes.filter(F.col("sz") >= min_size), "cluster_id")
        .select(F.col("doc_id").alias("vec_id"), F.col("cluster_id").alias("community_id"))
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    qid_col: str = "qid",
    qemb_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each of ``n_tables`` tables hashes a vector to an ``n_planes``-bit
    signature (sign of dot with seeded Gaussian planes). Docs sharing a
    bucket with the query in ANY table are candidates; candidates get
    exact cosine. Shuffle volume: |docs| x n_tables bucket rows — the
    10^12-scale path where the brute-force matmul is too expensive.
    """
    spark = embeddings.sparkSession
    qrows = [(r[qid_col], r[qemb_col]) for r in queries.collect()]
    if not qrows:
        return spark.createDataFrame([], "qid long, vec_id long, score double, rank int")
    if dim is None:
        dim = len(qrows[0][1])
    if n_planes > 62:
        raise ValueError("n_planes must fit in an int64 bucket id")
    rng = np.random.default_rng(SEED)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    pow2 = (1 << np.arange(n_planes, dtype=np.int64))
    qids, qmat = _as_matrix(qrows)
    qsig = {}  # query -> {(table, bucket)}
    for t in range(n_tables):
        bits = ((qmat @ planes[t].T) > 0).astype(np.int64)
        vals = bits @ pow2
        for qi in range(len(qids)):
            qsig.setdefault(qi, set()).add((t, int(vals[qi])))
    b_planes = spark.sparkContext.broadcast(planes)

    def bucketize(batches):
        pls = b_planes.value
        for pdf in batches:
            mat = np.asarray(pdf["_emb"].tolist(), dtype=np.float64)
            out_id, out_t, out_b = [], [], []
            for t in range(pls.shape[0]):
                bits = ((mat @ pls[t].T) > 0).astype(np.int64)
                vals = bits @ pow2
                out_id.extend(pdf["_id"].tolist())
                out_t.extend([t] * len(pdf))
                out_b.extend(vals.tolist())
            yield pd.DataFrame({"vec_id": out_id, "table": out_t, "bucket": out_b})

    src = embeddings.select(F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb"))
    id_t = embeddings.schema[id_col].dataType.simpleString()
    buckets = src.mapInPandas(bucketize, schema=f"vec_id {id_t}, table int, bucket long")

    # query buckets as a tiny broadcast relation
    qb_rows = []
    for qi, sigs in qsig.items():
        for t, bkt in sigs:
            qb_rows.append((qids[qi], int(t), int(bkt) if not isinstance(bkt, tuple) else hash(bkt)))
    qid_t = queries.schema[qid_col].dataType.simpleString()
    qb = spark.createDataFrame(qb_rows, f"qid {qid_t}, table int, bucket long")
    cand = (
        buckets.join(F.broadcast(qb), ["table", "bucket"])
        .select("qid", "vec_id")
        .distinct()
    )
    # exact rescore of candidates only
    q = queries.select(
        F.col(qid_col).alias("qid"), F.col(qemb_col).cast("array<double>").alias("qemb")
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).cast("array<double>").alias("demb")
    )
    dot = F.aggregate(
        F.zip_with("qemb", "demb", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    scored = (
        cand.join(e, "vec_id")
        .join(F.broadcast(q), "qid")
        .withColumn("score", dot / (norm(F.col("qemb")) * norm(F.col("demb"))))
        .select("qid", "vec_id", "score")
    )
    return topk_per_group(scored, group_col="qid", score_col="score", id_col="vec_id", k=k).select(
        "qid", "vec_id", "score", "rank"
    )
