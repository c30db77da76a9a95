"""sgpt_spark — a PySpark-native fulltext retrieval + data-pipeline engine.

From-scratch rebuild of the query/data-processing capabilities of the
reference repo (Muennighoff/sgpt — a BM25 + dense-retrieval benchmark
pipeline, SURVEY.md) as an idiomatic Spark engine:

- inverted-index construction with explicit shuffle/skew handling and
  compressed posting lists (``sgpt_spark.operators.indexer``),
- Okapi/Lucene BM25 top-k query execution, exhaustive and block-max WAND
  (``sgpt_spark.operators.search`` / ``sgpt_spark.operators.wand``),
- IR evaluation metrics (nDCG/MAP/MRR/P/R) matching the reference's
  InformationRetrievalEvaluator semantics (``sgpt_spark.operators.metrics``),
- training-data pipeline operators: dedup (exact/minhash/simhash),
  similarity search, text analysis (``sgpt_spark.operators``).

All heavy computation stays in Spark built-in functions (JVM, whole-stage
codegen) or Arrow-vectorized pandas UDFs — no per-row Python.
"""

__version__ = "0.1.0"
