"""BEIR-format scans — the reference's loaders as distributed reads.

Reference formats (SURVEY.md §1.3, §2.1):
- corpus.jsonl  {"_id", "title", "text"}   (GenericDataLoader,
  beir_dense_retriever.py:388-390; written at
  crossencoder_bioasq_bm25.ipynb cell 4)
- queries.jsonl {"_id", "text"}
- qrels.tsv     header 'query-id\tcorpus-id\tscore'
  (crossencoder_bioasq_bm25.ipynb cell 5)
- results.json  {qid: {doc_id: score}}     (beir_dense_retriever.py:444)
- raw line-wise JSON too large for json.load — the reference hand-parses
  19 GB with substring finds (crossencoder_bioasq_bm25.ipynb cell 4);
  here it's spark.read.text + get_json_object, natively distributed.

All readers return the engine's canonical schemas (schema.py) with
explicit StructTypes — no schema inference in production paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORPUS_JSON = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

_QUERIES_JSON = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_beir_corpus(spark: SparkSession, path: str) -> DataFrame:
    """corpus.jsonl -> CORPUS (doc_id, title, text)."""
    return (
        spark.read.schema(_CORPUS_JSON)
        .json(path)
        .select(
            F.col("_id").alias("doc_id"),
            F.coalesce("title", F.lit("")).alias("title"),
            F.coalesce("text", F.lit("")).alias("text"),
        )
    )


def read_beir_queries(spark: SparkSession, path: str) -> DataFrame:
    """queries.jsonl -> QUERIES (qid, query)."""
    return (
        spark.read.schema(_QUERIES_JSON)
        .json(path)
        .select(F.col("_id").alias("qid"), F.col("text").alias("query"))
    )


def read_beir_qrels(spark: SparkSession, path: str) -> DataFrame:
    """qrels.tsv (query-id\tcorpus-id\tscore) -> QRELS."""
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .csv(path)
        .select(
            F.col("query-id").alias("qid"),
            F.col("corpus-id").alias("doc_id"),
            F.col("score").cast("int").alias("relevance"),
        )
    )


def read_results_json(spark: SparkSession, path: str) -> DataFrame:
    """BEIR results.json {qid: {doc: score}} -> RESULTS with ranks.

    The nested-map layout is parsed distributed: each top-level key
    becomes a map entry, exploded to rows; rank is recomputed with the
    engine's deterministic tie-break.
    """
    from sgpt_spark.operators.topk import topk_per_group

    raw = spark.read.option("multiLine", "true").json(path)
    # raw has one column per qid (struct of doc->score); normalize via melt
    qids = raw.columns
    stacked = None
    for qid in qids:
        part = raw.select(
            F.lit(qid).alias("qid"),
            F.explode(
                F.from_json(F.to_json(F.col(f"`{qid}`")), "map<string,double>")
            ).alias("doc_id", "score"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    if stacked is None:
        return spark.createDataFrame([], "qid string, doc_id string, score double, rank int")
    return topk_per_group(stacked, k=1_000_000).select("qid", "doc_id", "score", "rank")


def read_jsonl_fields(
    spark: SparkSession, path: str, fields: dict[str, str]
) -> DataFrame:
    """Line-wise JSON field extraction for corpora too large/dirty for a
    JSON parser-per-file — the distributed version of the reference's
    substring-scan ingest (crossencoder_bioasq_bm25.ipynb cell 4).

    ``fields``: output column -> JSON path (e.g. {"doc_id": "$.pmid"}).
    """
    lines = spark.read.text(path)
    cols = [
        F.get_json_object(F.col("value"), json_path).alias(name)
        for name, json_path in fields.items()
    ]
    return lines.select(*cols).filter(
        F.coalesce(*[F.col(n) for n in fields], F.lit(None)).isNotNull()
    )
