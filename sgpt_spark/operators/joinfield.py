"""ES join-field queries — ``has_child``, ``has_parent``, ``nested``:
relations between documents answered relationally.

ES models these with tricks forced by shard-locality (the join field
routes children to the parent's shard; nested objects are hidden
child docs block-indexed beside the parent). Spark's shuffle makes the
honest spelling available: a (child doc_id -> parent_id) RELATION and
ordinary joins, with the same request semantics.

* ``has_child_search``: parents having >= min_children (<= max)
  matching children; ``score_mode`` none|max|sum|avg|min folds child
  BM25 scores into the parent (none = the ES constant-score form,
  score 0 with doc_id-asc paging — this engine's filter-context
  contract).
* ``has_parent_search``: children whose parent matches; ``score=True``
  propagates the parent's BM25 score to every child (ES's score=true),
  else constant 0.
* ``nested``: ES nested objects ARE child docs (Lucene block join), so
  the engine spells nested queries as ``explode_nested`` (derive the
  child relation + parent map from an array column — deterministic
  child ids parent*2^10+offset) -> index the children -> has_child.
  ``inner_hits`` fall out as the child rows themselves.

Plan shapes (10^12 docs): the child/parent match set comes from the
gated ``match_scores`` plan (term-pruned postings scan, one shuffle);
the parent fold is ONE map-side-combinable groupBy(qid, parent_id);
the fan-out joins shuffle on ids only. min/max children bounds apply
AFTER the fold (counts, not rows). Nothing is ever per-child Python.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sgpt_spark.operators.indexer import IndexMeta
from sgpt_spark.operators.topk import topk_per_group

SCORE_MODES = ("none", "max", "sum", "avg", "min")

# nested child ids are parent_id * 2^10 + offset — deterministic and
# order-free, capped at 1024 objects per parent (guarded)
_NESTED_SLOT_BITS = 10


def has_child_search(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    parent_of: DataFrame,
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
    k: int = 10,
    term_stats: DataFrame | None = None,
    tokenizer=None,
) -> DataFrame:
    """-> (qid, parent_id, score, n_children, rank): parents whose
    children match the query, per the ES ``has_child`` contract.
    ``postings``/``meta`` index the CHILD corpus; ``parent_of`` is the
    (doc_id, parent_id) join-field relation (children missing from it
    never produce a parent — the ES unmapped-child rule)."""
    from sgpt_spark.operators.funcscore import match_scores

    if score_mode not in SCORE_MODES:
        raise ValueError(f"unknown score_mode {score_mode!r}: {SCORE_MODES}")
    if min_children < 1:
        raise ValueError(f"min_children must be >= 1, got {min_children}")
    if max_children is not None and max_children < min_children:
        raise ValueError(
            f"max_children {max_children} < min_children {min_children}"
        )
    scored = match_scores(
        spark, postings, meta, queries, term_stats=term_stats, tokenizer=tokenizer
    )
    joined = scored.join(
        parent_of.select("doc_id", "parent_id"), "doc_id", "inner"
    )
    fold = {
        "none": F.lit(0.0),
        "max": F.max("score"),
        "sum": F.sum("score"),
        "avg": F.sum("score") / F.count(F.lit(1)),
        "min": F.min("score"),
    }[score_mode]
    parents = joined.groupBy("qid", "parent_id").agg(
        fold.alias("score"), F.count(F.lit(1)).alias("n_children")
    )
    parents = parents.filter(F.col("n_children") >= min_children)
    if max_children is not None:
        parents = parents.filter(F.col("n_children") <= max_children)
    return topk_per_group(parents, id_col="parent_id", k=k).select(
        "qid", "parent_id", "score", "n_children", "rank"
    )


def has_parent_search(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    parent_of: DataFrame,
    score: bool = False,
    k: int = 10,
    term_stats: DataFrame | None = None,
    tokenizer=None,
) -> DataFrame:
    """-> (qid, doc_id, parent_id, score, rank): children whose PARENT
    matches the query. ``postings``/``meta`` index the PARENT corpus
    (parent ids are its doc_ids); ``score=True`` gives each child its
    parent's BM25 score (ES score=true), else the constant-score form
    (0.0, doc_id-asc paging)."""
    from sgpt_spark.operators.funcscore import match_scores

    scored = match_scores(
        spark, postings, meta, queries, term_stats=term_stats, tokenizer=tokenizer
    ).select("qid", F.col("doc_id").alias("parent_id"), "score")
    children = scored.join(
        parent_of.select("doc_id", "parent_id"), "parent_id", "inner"
    )
    out = children.select(
        "qid", "doc_id", "parent_id",
        (F.col("score") if score else F.lit(0.0)).alias("score"),
    )
    return topk_per_group(out, k=k).select(
        "qid", "doc_id", "parent_id", "score", "rank"
    )


def explode_nested(
    docs: DataFrame, nested_col: str, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Array-of-strings column -> (children, parent_of): the Lucene
    block-join derivation that makes ES ``nested`` queries a
    ``has_child`` over an index of the nested objects. Child ids are
    ``parent_id * 2^10 + offset`` (deterministic, <= 1024 objects per
    parent — guarded at runtime); NULL/empty arrays yield no children
    (such parents can never match — the ES rule)."""
    if nested_col not in docs.columns:
        raise ValueError(
            f"nested column {nested_col!r} not in {docs.columns}"
        )
    cap = 1 << _NESTED_SLOT_BITS
    exploded = docs.select(
        F.col(id_col).alias("parent_id"),
        F.posexplode(nested_col).alias("pos", "text"),
    )
    guarded = exploded.withColumn(
        "pos",
        F.when(F.col("pos") < cap, F.col("pos")).otherwise(
            F.raise_error(
                F.format_string(
                    "explode_nested: parent %%s has > %d nested objects" % cap,
                    F.col("parent_id").cast("string"),
                )
            ).cast("int")
        ),
    )
    children = guarded.select(
        (F.col("parent_id") * cap + F.col("pos")).alias("doc_id"), "text"
    )
    parent_of = children.select(
        "doc_id", F.floor(F.col("doc_id") / cap).cast("long").alias("parent_id")
    )
    return children, parent_of


def inner_hits(
    scored_children: DataFrame,
    parent_of: DataFrame,
    parents_page: DataFrame,
    size: int = 3,
    broadcast_page: bool = True,
) -> DataFrame:
    """ES ``inner_hits`` for the join-field family: the top-``size``
    matching CHILDREN behind each parent on a ``has_child`` result page
    (and, via ``explode_nested``'s relation, the matched nested objects
    behind a ``nested`` query — the two places ES offers inner_hits).
    -> (qid, parent_id, doc_id, score, child_rank), children ranked
    score desc / doc_id asc within each (query, parent).

    Inputs follow the rescore-family convention: ``scored_children`` is
    the full scored child match set (``funcscore.match_scores`` — the
    same relation ``has_child_search`` folds), ``parents_page`` the
    (qid, parent_id) page to expand (any extra columns ignored). ES
    computes inner_hits at fetch time per returned hit; this is the
    set-oriented spelling — one semi-join against the page, one
    partial/final WindowGroupLimit, <= size rows per (query, parent).
    ``size`` caps at 100 (the ES inner_hits window bound)."""
    if not 1 <= size <= 100:
        raise ValueError(f"inner_hits size must be in [1, 100], got {size}")
    page = parents_page.select("qid", "parent_id").distinct()
    if broadcast_page:
        page = F.broadcast(page)
    joined = scored_children.join(
        parent_of.select("doc_id", "parent_id"), "doc_id", "inner"
    ).join(page, ["qid", "parent_id"], "left_semi")
    w = Window.partitionBy("qid", "parent_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        joined.withColumn("child_rank", F.row_number().over(w))
        .filter(F.col("child_rank") <= size)
        .select("qid", "parent_id", "doc_id", "score", "child_rank")
    )
