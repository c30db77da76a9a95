"""Explicit StructType schemas for every table the engine touches.

The reference is schema-implicit (Python dicts keyed by convention,
SURVEY.md §1.3 — BEIR JSONL ``{_id,title,text}``, qrels TSV
``query-id\tcorpus-id\tscore``); this engine is schema-on-write.

Reference shapes (file:line into /root/reference):
  corpus   Dict[doc_id -> {title,text}]   biencoder/beir/beir_dense_retriever.py:340-341
  queries  Dict[qid -> str]               beir_dense_retriever.py:390
  qrels    Dict[qid -> Dict[doc, int]]    beir_dense_retriever.py:390,446
  results  Dict[qid -> Dict[doc, float]]  beir_dense_retriever.py:441-445
"""

from __future__ import annotations

from pyspark.sql import types as T

# Common-Crawl-style web pages — the graft input (BASELINE.json input_hint).
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# BEIR-style corpus (reference corpus dict, beir_dense_retriever.py:340).
CORPUS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

QUERIES = T.StructType(
    [
        T.StructField("qid", T.StringType(), False),
        T.StructField("query", T.StringType(), False),
    ]
)

QRELS = T.StructType(
    [
        T.StructField("qid", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("relevance", T.IntegerType(), False),
    ]
)

# Ranked run — "format of results is identical to qrels" plus score
# (beir_dense_retriever.py:441-443); rank added for deterministic order.
RESULTS = T.StructType(
    [
        T.StructField("qid", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)

# Per-document stats side table (what ES keeps as norms — SURVEY.md §1.1 #6).
DOC_STATS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("doc_len", T.LongType(), False),
    ]
)

# Compressed posting-list segment: one row per (term, index partition).
# doc ids are delta+varint encoded per block. Block-max metadata is
#
# SENTINEL CONVENTION (single-pass build_index layouts): one row per
# segment with term = NULL carries the segment's corpus stats, reusing
# the stat columns — df = non-empty doc count, max_tf = total token
# count, min_dl = max doc_id — with blocks = []. ``read_index`` strips
# sentinels; any direct reader of the postings parquet MUST filter
# ``term IS NOT NULL`` before treating rows as posting lists.
#
# stored avgdl-independently as (max_tf, min_dl): the BM25 tf-norm is
# monotone increasing in tf and decreasing in dl, so
# tfn <= max_tf / (max_tf + k1*(1-b+b*min_dl/avgdl)) holds for ANY
# avgdl — the bound stays valid after incremental appends change the
# corpus stats (streaming/incremental.py), which a stored tf-norm would
# not. (This materializes the structure Elasticsearch hides from the
# reference, SURVEY.md §1.1 "Derived index structure".)
POSTINGS = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("segment", T.IntegerType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("max_tf", T.LongType(), False),
        T.StructField("min_dl", T.LongType(), False),
        T.StructField(
            "blocks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("first_doc", T.LongType(), False),
                        T.StructField("last_doc", T.LongType(), False),
                        T.StructField("count", T.IntegerType(), False),
                        T.StructField("max_tf", T.LongType(), False),
                        T.StructField("min_dl", T.LongType(), False),
                        T.StructField("doc_deltas", T.BinaryType(), False),
                        T.StructField("tfs", T.BinaryType(), False),
                        T.StructField("dls", T.BinaryType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

# Embeddings fixture (dense path, beir_dense_retriever.py:306-328).
EMBEDDINGS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("emb", T.ArrayType(T.FloatType()), False),
    ]
)
