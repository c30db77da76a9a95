"""ES field collapsing — ``collapse`` on a search request: the result
list keeps only the BEST hit per (query, collapse-field value), then
ranks the survivors. The Lucene CollapsingTopDocsCollector role,
re-expressed as two window ranks over the scored match set.

The canonical web-corpus use is host/site dedup of a results page:
collapse on the site keyword field so one domain can't fill the top-k.
Semantics carried from ES:

* the collapse key comes from a doc-values field; docs with a NULL key
  are NOT collapsed (each is its own group — the ES behavior).
* group representative = the group's best hit by the engine-wide
  ranking contract (rounded score desc, doc_id asc; ES uses _score
  order the same way).
* the final page ranks representatives by the same contract and cuts
  at k; ranks are dense over the collapsed list (ES pagination
  semantics for collapsed results).

Plan shape: one docvalues join onto the scored relation, a window per
(qid, key) for the representative, a window per qid for the page —
both partition-pruned, no UDF. At 10^12 docs everything after the
retrieval is bounded by the match set, and the (qid, key) window's
input can pre-aggregate map-side via the rank-1 filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_search(
    scored: DataFrame,
    docvalues: DataFrame,
    field: str,
    k: int = 10,
) -> DataFrame:
    """(qid, doc_id, score) scored match set x doc-values ``field`` ->
    (qid, doc_id, <field>, score, rank): top-``k`` per query after
    collapsing to one best hit per field value. See module docstring.
    """
    if field not in docvalues.columns:
        raise ValueError(
            f"collapse field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    vals = scored.join(docvalues.select("doc_id", field), "doc_id", "left").select(
        "qid",
        "doc_id",
        F.col(field),
        F.round("score", 6).alias("score"),
    )
    # NULL keys collapse to themselves: substitute a per-doc unique key
    grp = F.coalesce(
        F.col(field).cast("string"),
        F.concat(F.lit("\x00doc:"), F.col("doc_id").cast("string")),
    )
    # best hit per (qid, group) as a map-side-combinable max over a
    # comparison struct (score asc, -doc_id asc == score desc, doc_id
    # asc — the engine ranking contract on the already-6dp-rounded
    # score): value-identical to the r5 row_number window but shuffles
    # <= |groups| partial rows per map partition instead of sorting the
    # full scored match set by (qid, group)
    reps = (
        vals.groupBy("qid", grp.alias("_g"))
        .agg(
            F.max(
                F.struct(
                    F.col("score").alias("_s"),
                    (-F.col("doc_id")).alias("_nd"),
                    F.col("doc_id").alias("_d"),
                    F.col(field).alias("_f"),
                )
            ).alias("_m")
        )
        .select(
            "qid",
            F.col("_m._d").alias("doc_id"),
            F.col("_m._f").alias(field),
            F.col("_m._s").alias("score"),
        )
    )
    pw = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        reps.withColumn("rank", F.row_number().over(pw))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", field, "score", "rank")
    )
