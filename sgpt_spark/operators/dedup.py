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
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, simhash long): 64-bit SimHash over whitespace tokens.

    Vectorized pandas UDF (Arrow batches); per-batch the token hashing is
    numpy bit math. blake2b keeps the hash stable across JVM/Python and
    Spark versions (xxhash64 is not exposed to Python).
    """

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = np.empty(len(texts), dtype=np.int64)
        for i, txt in enumerate(texts):
            toks = [t for t in (txt or "").split(" ") if t]
            if not toks:
                out[i] = 0
                continue
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


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id_a, id_b, hamming<=max_hamming) near-dup pairs by SimHash.

    Banding by 16-bit chunks: Hamming distance <= 3 over 64 bits implies
    at least one of the 4 chunks is identical (pigeonhole), so the join
    key is (chunk_idx, chunk_value) — |docs| x 4 rows, never |docs|^2.
    """
    sig = simhash64(df, id_col, text_col)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.ci") == F.col("r.ci"))
            & (F.col("l.cv") == F.col("r.cv"))
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
        cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
