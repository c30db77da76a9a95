"""Codec agreement across the index lifecycle (round-4 advice #8):
appends and compaction must inherit the index's codec — a varint-era
code path writing into a pfor index (or vice versa) would corrupt every
posting silently, since both codecs are just bytes in the same column.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.index_search import search_index
from sgpt_spark.operators.indexer import (
    assign_doc_ids,
    build_index,
    compact_index,
    read_index,
    release_doc_ids,
)
from sgpt_spark.sources.pages import generate_pages, make_page
from sgpt_spark.streaming.incremental import append_to_index


def _queries(spark):
    body = make_page(5)[3].split("\n")[1].split(" ")
    return spark.createDataFrame(
        [(1, " ".join(body[:4])), (2, " ".join(body[4:8]))], "qid long, query string"
    )


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_append_inherits_codec_and_stays_exact(spark, tmp_path, codec):
    """Append into a ``codec`` index: meta keeps the codec, the appended
    segments decode under it (search touches them), and results equal a
    fresh single-shot build of the union corpus under the same codec."""
    idx = str(tmp_path / f"idx_{codec}")
    base = generate_pages(spark, 200, partitions=4).persist()
    assigned = assign_doc_ids(base.select("url", "text"))
    build_index(assigned.select("doc_id", "text"), idx, segment_size=60, codec=codec)
    release_doc_ids(assigned)

    more = generate_pages(spark, 280, partitions=2)
    seen = {r["url"] for r in base.select("url").collect()}
    batch = more.filter(~F.col("url").isin(list(seen)))
    meta = append_to_index(spark, batch, idx)
    assert meta.codec == codec
    with open(f"{idx}/meta.json") as fp:
        assert json.load(fp)["codec"] == codec

    queries = _queries(spark)
    postings, meta2 = read_index(spark, idx)
    got = sorted(
        tuple(r) for r in search_index(spark, postings, meta2, queries, k=15).collect()
    )

    # ground truth: exhaustive search over the union corpus with the ids
    # the index actually assigned (base by url order from 0, appended by
    # url order at the old next id — same reconstruction as
    # test_compaction._index_docs)
    from sgpt_spark.operators.search import bm25_search

    rows = []
    for i, r in enumerate(sorted(base.select("url", "text").collect(),
                                 key=lambda r: r["url"])):
        rows.append((i, r["text"]))
    off = len(rows)
    for j, r in enumerate(sorted(batch.select("url", "text").collect(),
                                 key=lambda r: r["url"])):
        rows.append((off + j, r["text"]))
    union = spark.createDataFrame(rows, "doc_id long, text string")
    want = sorted(tuple(r) for r in bm25_search(union, queries, k=15).collect())
    assert got == want and got

    # compaction after the append keeps the codec and the results
    compact_index(spark, idx, target_segments=2)
    p3, m3 = read_index(spark, idx)
    assert m3.codec == codec
    after = sorted(
        tuple(r) for r in search_index(spark, p3, m3, queries, k=15).collect()
    )
    assert after == got


def test_cross_codec_decode_is_not_silent(spark, tmp_path):
    """The failure the guard rail exists for: decoding pfor blocks as
    varint (what a codec-ignorant append/compact path would do) must NOT
    round-trip — this pins that the codecs are truly incompatible byte
    formats, i.e. inheriting the codec is load-bearing, not stylistic."""
    import numpy as np

    from sgpt_spark.functions.compress import decode_blocks, encode_blocks

    ids = np.sort(np.random.default_rng(3).choice(10_000, 300, replace=False)).astype(
        np.int64
    )
    tfs = (ids % 7 + 1).astype(np.uint64)
    dls = (ids % 40 + 5).astype(np.uint64)
    blocks = encode_blocks(ids, tfs, dls, presorted=True, codec="pfor")
    try:
        d, tf, dl = decode_blocks(blocks, codec="varint")
        roundtrip = (
            len(d) == len(ids) and (d == ids).all() and (tf == tfs).all()
        )
    except Exception:
        roundtrip = False
    assert not roundtrip
