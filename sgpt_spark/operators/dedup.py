"""Deduplication operators for large-scale training-data pipelines.

Four families, each picked for a different scale/accuracy point:

- ``dedup_exact``       exact duplicates via content hash — one groupBy.
- ``ngram_jaccard_pairs``  exact n-gram (shingle) Jaccard similarity
  join — candidate pairs share >=1 shingle, exact similarity computed
  distributed; the small-scale oracle-checkable ground truth for the
  approximate methods.
- ``minhash_lsh_pairs``  MinHash + LSH banding — the scale path: one
  pass to signatures (JVM xxhash64, no Python), band-bucket join,
  candidate pairs, optional exact-Jaccard verification. At 10^12 docs
  the shuffle volume is |docs| x n_bands rows, never |docs|^2.
- ``simhash64``         64-bit SimHash per doc (vectorized pandas UDF)
  + ``simhash_near_pairs`` via 16-bit chunk banding (Hamming<=3 ->
  at least one of 4 chunks equal, pigeonhole).

All pair outputs are canonical (id_a < id_b) and deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sgpt_spark.functions.analyzer import tokenize_ws


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, canonical_id): every doc mapped to the smallest doc_id
    sharing byte-identical text. One groupBy(hash) shuffle; the hash key
    is effectively unique so there is no skew.
    """
    canon = (
        df.select(F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("h"))
        .join(canon, "h")
        .select("doc_id", "canonical_id")
    )


# --------------------------------------------------------------------------
# shingles
# --------------------------------------------------------------------------

def word_shingles(tokens: Column, n: int) -> Column:
    """tokens array -> array of n-gram strings (space-joined), distinct.

    Pure JVM higher-order functions — no UDF.
    """
    idx = F.sequence(F.lit(1), F.size(tokens) - n + 1)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, n), " "))
    # sequence(1, x) DESCENDS for x < 1, so short docs need an explicit
    # empty result rather than relying on an empty sequence.
    return F.when(F.size(tokens) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def doc_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """-> (doc_id, shingle) exploded distinct word n-grams per doc."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            word_shingles(tokenize_ws(F.col(text_col)), n).alias("shingles"),
        )
        .filter(F.size("shingles") > 0)
        .select("doc_id", F.explode("shingles").alias("shingle"))
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard similarity join
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id_a, id_b, jaccard) for pairs with Jaccard(shingles) >= threshold.

    Plan: explode shingles -> self-join on shingle (only co-occurring
    pairs materialize) -> count intersections -> join per-doc shingle
    counts -> |A∩B| / (|A|+|B|-|A∩B|). The shingle join key is
    high-cardinality; stopword-only shingles are the skew risk, which
    ``n``>=3 keeps rare. Exact — used as ground truth for MinHash.
    """
    sh = doc_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 64,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, h0..h{n-1}): MinHash signature per doc.

    One explode + one groupBy(doc_id) with n_hashes min-aggregates of
    seeded xxhash64 — entirely JVM-side (codegen), zero Python. This is
    the scan that runs over all 10^12 docs, so it must be cheap.
    """
    sh = doc_shingles(df, id_col, text_col, n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    n_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float | None = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> candidate near-duplicate pairs (id_a, id_b[, jaccard]).

    signatures -> band hashes (rows/band = n_hashes/bands) -> explode ->
    groupBy band bucket self-join -> distinct pairs. With r rows/band and
    b bands, P(candidate) = 1-(1-s^r)^b — r=4, b=16 puts the S-curve
    cutoff near s≈0.5 with high recall at s>=0.8.

    If ``threshold`` is given, candidates are verified with the exact
    shingle-Jaccard (computed only for candidate pairs — cheap).
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, n_hashes, n, id_col, text_col)
    band_cols = [
        F.xxhash64(
            F.lit(bi), *[F.col(f"h{bi * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"b{bi}")
        for bi in range(bands)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bucket")
    ).withColumn("band", F.lit(None))
    # pair docs sharing any band bucket
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
    )
    if threshold is None:
        return cand
    # Exact verification restricted to candidates: candidate volume is
    # tiny relative to the corpus, so shipping whole shingle sets to the
    # pair rows (two hash joins + array_intersect) is cheap and avoids
    # a per-shingle re-shuffle.
    sets = df.select(
        F.col(id_col).alias("sid"),
        word_shingles(tokenize_ws(F.col(text_col)), n).alias("sh"),
    )
    return (
        cand.join(sets.select(F.col("sid").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sets.select(F.col("sid").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.size("sh_a") + F.size("sh_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# connected components: pairs -> clusters
# --------------------------------------------------------------------------

def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 50,
) -> DataFrame:
    """-> (doc_id, cluster_id): connected components over an undirected
    pair relation; cluster_id = min doc_id in the component (singletons
    map to themselves).

    The reference's community/overlap-removal step works on in-memory
    score matrices (util.py:432-446); the distributed equivalent for
    dedup pipelines is label propagation: every node starts as its own
    label, and each round takes the min of its neighbors' labels —
    converges in O(graph diameter) rounds, which for near-dup graphs
    (dense clusters, no long chains) is 2-4. Each round is one join +
    one groupBy keyed by node id; the frontier is checkpointed via
    localCheckpoint to keep lineage flat (iterative plans otherwise grow
    exponentially). Deterministic: min over labels.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        # materialize ONCE: the pair pipeline upstream (LSH bucketing,
        # candidate join, exact rescore) would otherwise re-execute on
        # every propagation round below
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neigh, labels["node"] == neigh["src"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
                (F.coalesce("nlabel", F.col("label")) < F.col("label")).alias("_chg"),
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("_chg")).limit(1).count()
        labels = updated.drop("_chg")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds max_iters) — returning partial labels "
            "would silently split components; raise max_iters"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame | None = None,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, cluster_id): near-duplicate clusters over the corpus —
    connected components of the near-dup pair graph (by default the
    exact n-gram Jaccard join; pass ``pairs`` to cluster MinHash/SimHash
    output instead). The keep-one-per-cluster filter is then
    ``cluster_id == doc_id``."""
    if pairs is None:
        pairs = ngram_jaccard_pairs(df, threshold=threshold, n=n, id_col=id_col, text_col=text_col)
    return connected_components(df, pairs, id_col=id_col)


# --------------------------------------------------------------------------
# MinHash, md5 variant (oracle-checkable twin of the xxhash64 scale path)
# --------------------------------------------------------------------------

def minhash_lsh_pairs_md5(
    df: DataFrame,
    n_hashes: int = 16,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH with md5-derived hashes — value-identical in Spark
    and ANSI SQL (md5 hex strings compare lexicographically the same
    everywhere), so the full LSH pipeline is oracle-checkable end to
    end. ``minhash_lsh_pairs`` (seeded xxhash64, pure JVM codegen) is
    the production scale path; this twin gates its logic.

    h_i(doc) = min over shingles of md5('{i}:' || shingle);
    band key  = md5(h_{b*r} || '|' || ... || h_{b*r+r-1});
    candidates = docs sharing any band key, verified by exact Jaccard.
    """
    rows_per_band = n_hashes // bands
    sh = doc_shingles(df, id_col, text_col, n)
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"h{bi * rows_per_band + r}") for r in range(rows_per_band)])
        ).alias(f"b{bi}")
        for bi in range(bands)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bucket"))
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
    )
    sets = df.select(
        F.col(id_col).alias("sid"),
        word_shingles(tokenize_ws(F.col(text_col)), n).alias("sh"),
    )
    return (
        cand.join(sets.select(F.col("sid").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sets.select(F.col("sid").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.size("sh_a") + F.size("sh_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# Scale pipeline: exact-dup pre-collapse + LSH over representatives
# --------------------------------------------------------------------------

def near_dup_pairs(
    df: DataFrame,
    method: str = "minhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Near-duplicate pairs with the giant-cluster quadratic hole closed.

    A cluster of N byte-identical docs shares EVERY LSH bucket, so raw
    banding would enumerate N(N-1)/2 pairs inside it. This pipeline:

      1. ``dedup_exact``: collapse identical text to its canonical id;
      2. run MinHash-LSH / SimHash over the (distinct-text)
         representatives only;
      3. emit exact-dup clusters as LINEAR star pairs
         (canonical_id, member_id, score=1.0), never all-pairs.

    Output semantics are union-find style: every doc connects to its
    canonical, canonicals connect across near-dup clusters — the
    connected components equal raw all-pairs LSH's, with O(N) instead
    of O(N^2) rows for exact clusters (the standard trick in web-scale
    dedup pipelines).

    ``method``: 'minhash' (id_a, id_b, jaccard) or 'simhash'
    (id_a, id_b, hamming -> score column named per method).
    """
    canon = dedup_exact(df, id_col, text_col)
    rep_ids = canon.filter(F.col("doc_id") == F.col("canonical_id")).select(
        F.col("doc_id").alias("_rep_id")
    )
    reps = df.join(rep_ids, df[id_col] == F.col("_rep_id"), "left_semi")
    if method == "minhash":
        rep_pairs = minhash_lsh_pairs(reps, id_col=id_col, text_col=text_col, **kwargs)
        exact_score = F.lit(1.0).alias("jaccard")
        score_col = "jaccard"
    elif method == "minhash_md5":
        # engine-portable hashes -> the whole pipeline is oracle-checkable
        rep_pairs = minhash_lsh_pairs_md5(reps, id_col=id_col, text_col=text_col, **kwargs)
        exact_score = F.lit(1.0).alias("jaccard")
        score_col = "jaccard"
    elif method == "simhash":
        rep_pairs = simhash_near_pairs(reps, id_col=id_col, text_col=text_col, **kwargs)
        exact_score = F.lit(0).cast("int").alias("hamming")
        score_col = "hamming"
    else:
        raise ValueError(f"unknown method {method!r}: use minhash|minhash_md5|simhash")
    star = canon.filter(F.col("doc_id") != F.col("canonical_id")).select(
        F.least("canonical_id", "doc_id").alias("id_a"),
        F.greatest("canonical_id", "doc_id").alias("id_b"),
        exact_score,
    )
    return rep_pairs.select("id_a", "id_b", score_col).unionByName(star)


def lsh_bucket_stats(
    df: DataFrame,
    n_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bucket-size telemetry for a MinHash-LSH run: one row with the
    candidate-volume drivers (max/avg bucket size, #buckets, and the
    implied candidate-pair count sum b*(b-1)/2). Log this per run — a
    max bucket of 10^5 means ~5*10^9 pairs from that bucket alone and
    is the signal to pre-collapse (``near_dup_pairs``) or re-band.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, n_hashes, n, id_col, text_col)
    band_cols = [
        F.xxhash64(
            F.lit(bi), *[F.col(f"h{bi * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"b{bi}")
        for bi in range(bands)
    ]
    buckets = (
        sig.select(F.explode(F.array(*band_cols)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("sz"))
    )
    return buckets.agg(
        F.count("*").alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.round(F.avg("sz"), 6).alias("avg_bucket"),
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2).cast("long").alias("candidate_pairs"),
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash64_py(tokens: list[str]) -> int:
    """Python twin of the SimHash UDF (tested for equality)."""
    import hashlib

    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        )
        bits = ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        acc += 2 * bits - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out  # two's-complement int64


def simhash64(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_name: str = "blake2b",
) -> DataFrame:
    """-> (doc_id, simhash long): 64-bit SimHash over whitespace tokens.

    Vectorized pandas UDF (Arrow batches); per-batch the token hashing is
    numpy bit math. ``hash_name``: 'blake2b' (default scale path —
    stable across JVM/Python and Spark versions; xxhash64 is not exposed
    to Python) or 'md5' (first 16 hex chars as uint64 — the
    ANSI-SQL-expressible twin the DuckDB oracle reproduces nibble for
    nibble, see ``simhash_near_pairs_md5``)."""
    if hash_name not in ("blake2b", "md5"):
        raise ValueError(f"unknown hash_name {hash_name!r}: blake2b|md5")
    use_md5 = hash_name == "md5"

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = np.empty(len(texts), dtype=np.int64)
        for i, txt in enumerate(texts):
            toks = [t for t in (txt or "").split(" ") if t]
            if not toks:
                out[i] = 0
                continue
            if use_md5:
                hs = np.array(
                    [int(hashlib.md5(t.encode()).hexdigest()[:16], 16) for t in toks],
                    dtype=np.uint64,
                )
            else:
                hs = np.frombuffer(
                    b"".join(
                        hashlib.blake2b(t.encode(), digest_size=8).digest() for t in toks
                    ),
                    dtype=">u8",
                ).astype(np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            )
            acc = (2 * bits - 1).sum(axis=0)
            v = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
            out[i] = v - (1 << 64) if v >= (1 << 63) else v
        return pd.Series(out)

    return df.select(F.col(id_col).alias("doc_id"), _simhash(F.col(text_col)).alias("simhash"))


def _block_bounds(n_bits: int, n_blocks: int) -> list[tuple[int, int]]:
    """Split ``n_bits`` into ``n_blocks`` contiguous (offset, width)
    blocks, widths as even as possible (e.g. 64/6 -> 11,11,11,11,10,10)."""
    base, extra = divmod(n_bits, n_blocks)
    bounds, off = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < extra else 0)
        bounds.append((off, w))
        off += w
    return bounds


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    n_blocks: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_name: str = "blake2b",
) -> DataFrame:
    """-> (id_a, id_b, hamming<=max_hamming) near-dup pairs by SimHash.

    Manku-style multi-block banding (Detecting Near-Duplicates for Web
    Crawling, WWW'07): split the 64 bits into ``n_blocks`` blocks; at
    Hamming distance <= max_hamming the differing bits touch at most
    ``max_hamming`` blocks, so SOME (n_blocks - max_hamming)-subset of
    blocks is identical between the two docs (pigeonhole). The join key
    is therefore (combo_id, concatenated block values of that subset) —
    C(n_blocks, n_blocks - max_hamming) keys per doc (20 for 6/3), each
    >= ~32 bits wide.

    Why not 16-bit single chunks: a 16-bit key has only 2^16 buckets —
    at web scale every bucket holds ~N/65536 docs and the within-bucket
    self-join is quadratic. 32+-bit multi-block keys keep expected
    bucket sizes O(N/2^32); pathological exact-dup clusters should be
    pre-collapsed with ``near_dup_pairs`` (dedup_exact first).
    """
    # pigeonhole soundness needs more blocks than flippable bits
    n_blocks = max(n_blocks, max_hamming + 1)
    from itertools import combinations

    sig = simhash64(df, id_col, text_col, hash_name=hash_name)
    bounds = _block_bounds(64, n_blocks)

    def block_val(i: int) -> Column:
        off, w = bounds[i]
        return F.shiftrightunsigned("simhash", off).bitwiseAND(F.lit((1 << w) - 1))

    combos = list(combinations(range(n_blocks), n_blocks - max_hamming))
    keys = [
        F.xxhash64(F.lit(ci), *[block_val(i) for i in combo]).alias(f"k{ci}")
        for ci, combo in enumerate(combos)
    ]
    banded = sig.select(
        "doc_id", "simhash", F.explode(F.array(*keys)).alias("bucket")
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.col("l.simhash").alias("sa"),
            F.col("r.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_near_pairs_md5(
    df: DataFrame,
    max_hamming: int = 3,
    n_blocks: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Value-gated twin of ``simhash_near_pairs``: identical pipeline
    (same banding, same join, same Hamming cut) with md5-derived token
    hashes, so a DuckDB oracle can recompute every signature nibble for
    nibble (strpos/pow arithmetic over the md5 hex) and value-check the
    FULL near-dup result — banding completeness included, since the
    banded output provably equals the brute-force Hamming<=h pair set
    (pigeonhole; also pytest-asserted for the blake2b path).

    Docs with no tokens are dropped (an empty doc has no SimHash; the
    SQL twin's unnest drops them implicitly).
    """
    src = df.filter(
        F.size(F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1),
                        lambda t: t != F.lit(""))) > 0
    )
    return simhash_near_pairs(
        src, max_hamming=max_hamming, n_blocks=n_blocks,
        id_col=id_col, text_col=text_col, hash_name="md5",
    )
