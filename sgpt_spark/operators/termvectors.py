"""ES ``_termvectors`` / ``_mtermvectors`` — per-document term
vectors: for each requested doc, one row per term with its in-doc
frequency and token positions, optionally joined to index-wide term
statistics (doc_freq, ttf).

The reference consumes ES term vectors implicitly (the fetch side of
significant_terms and more_like_this — both already first-class here);
this operator exposes the API itself, batch-shaped: the request is a
RELATION of doc ids, not one id per call, so "mtermvectors for a
million docs" is the same plan as for three.

ES semantics carried:

* terms are the index analyzer's tokens (the re-analyze path ES takes
  when vectors aren't stored; identical vocabulary to the index by
  construction, since ``build_postings`` used the same spelling);
* ``term_freq`` and 0-based ``positions`` per (doc, term), positions
  ascending;
* ``term_statistics=True`` adds ``doc_freq`` (docs containing the
  term) and ``ttf`` (total term frequency across the index) — in ES
  these are shard-local approximations, here they are GLOBAL exact
  counts (the engine's rare_terms stance);
* ``field_statistics`` (doc_count, avgdl) are not duplicated per row —
  they are the gated ``corpus_stats`` operator's output already.

Plan shapes (10^12-doc corpus):

* term rows: the requested-ids relation left-semi prunes the corpus
  scan (ids are the small side), only the hit docs re-analyze
  (posexplode of the JVM analyzer array — no Python), one
  map-side-combinable groupBy(doc_id, term).
* ``doc_freq``: the build-time (term, df) side table when available,
  else one groupBy over the postings' per-segment df sentinels —
  never a posting decode.
* ``ttf``: postings left-semi pruned to the REQUESTED docs' vocabulary
  (the query-path prune: ``PushedFilters In(term, ...)`` at the
  parquet scan), then one decode + sum — cost scales with the request
  vocabulary's posting mass, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgpt_spark.operators.indexer import IndexMeta

__all__ = ["term_vectors"]


def term_vectors(
    corpus: DataFrame,
    doc_ids: DataFrame,
    meta: IndexMeta,
    postings: DataFrame | None = None,
    term_stats: DataFrame | None = None,
    term_statistics: bool = False,
    tokenizer=None,
) -> DataFrame:
    """-> (doc_id, term, term_freq, positions[, doc_freq, ttf]).

    ``corpus``: the (doc_id, text) relation the index was built from.
    ``doc_ids``: the requested ids — a DataFrame with a doc_id column.
    ``term_statistics=True`` needs ``postings`` (for ttf, and for
    doc_freq when no ``term_stats`` side table is passed)."""
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer

    if term_statistics and postings is None:
        raise ValueError("term_statistics=True needs the postings relation")
    tok = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    hits = corpus.join(
        doc_ids.select("doc_id").distinct(), "doc_id", "left_semi"
    )
    toks = hits.select(
        "doc_id", F.posexplode(tok(F.col("text"))).alias("pos", "term")
    )
    tv = toks.groupBy("doc_id", "term").agg(
        F.count("*").alias("term_freq"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    if not term_statistics:
        return tv
    # prune the index relations to the requested docs' vocabulary before
    # any decode — the query-path left-semi idiom
    vocab = tv.select("term").distinct()
    if term_stats is not None:
        dfs = term_stats.join(vocab, "term", "left_semi").select(
            "term", F.col("df").alias("doc_freq")
        )
    else:
        dfs = (
            postings.join(vocab, "term", "left_semi")
            .groupBy("term")
            .agg(F.sum("df").alias("doc_freq"))
        )
    from sgpt_spark.operators.index_search import flatten_postings

    flat = flatten_postings(
        postings.join(vocab, "term", "left_semi"), codec=meta.codec
    )
    ttf = flat.groupBy("term").agg(F.sum("tf").alias("ttf"))
    return tv.join(dfs, "term", "left").join(ttf, "term", "left").select(
        "doc_id", "term", "term_freq", "positions", "doc_freq", "ttf"
    )
