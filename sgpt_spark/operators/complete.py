"""ES ``completion`` suggester (search-as-you-type autocomplete).

Elasticsearch's completion suggester serves weighted suggestion inputs
from a dedicated ``completion`` field, backed by Lucene's NRTSuggester
over an FST: the typed prefix walks the automaton and the top ``size``
completions return ranked by their indexed WEIGHT (not BM25 — the
field's whole point is constant-time weighted prefix lookup). The
``fuzzy`` variant intersects a Levenshtein automaton over the prefix
with the same FST. Public API surface: the ES search `suggest` section
(`completion`, options `size`, `skip_duplicates`, `fuzzy: {fuzziness,
min_length, prefix_length}`); the reference's ES indexes expose this
API unchanged (its retrieval stack delegates the whole query DSL to ES
— crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10), so this
completes the suggester family next to the term and phrase suggesters
in ``operators.suggest``.

Relational spelling (the engine's FST-role idiom, shared with
``multiterm.expand_prefix``):

  - the "index" is a (text, weight) suggestion relation — built once
    from any corpus projection (``completion_inputs`` derives one from
    a documents table) and usually small enough to sit in memory, but
    nothing here requires that: every step is a plain DataFrame op.
  - EXACT prefix match = one hash equi-join per distinct prefix LENGTH
    on ``substring(text, 1, L) == prefix`` (only the distinct lengths
    touch the driver — a bounded-by-syntax collect, never query-count).
  - FUZZY prefix match = the same equi-join on the first
    ``prefix_length`` chars (the automaton's exact head) + an OR of
    ``levenshtein(substring(text, 1, L'), prefix) <= fuzziness`` over
    the edit-reachable prefix lengths L' in [L-f, L+f] — all JVM
    expressions after a hash join. ``prefix_length=0`` degrades to a
    broadcast nested-loop against the dictionary (the leading-wildcard
    caveat, documented loudly).
  - ranking: weight desc, text asc, one partial/final WindowGroupLimit
    per qid — ES's weight ordering with the engine's deterministic
    tie-break. Lucene's fuzzy prefix-overlap boost (longer exact
    overlap scores higher) is a documented divergence: here fuzzy
    candidates rank by the same (weight, text) key as exact ones.
  - ``skip_duplicates``: per (qid, text) keep the max weight before
    ranking (ES keeps the highest-scored duplicate).

Scale shape: |suggestions| x |distinct lengths| substring evaluations
inside hash joins, broadcast prefix sets (interactive contract; pass
``broadcast_queries=False`` for huge offline batches), <= size rows per
query out of the final window.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["completion_inputs", "complete"]

_MAX_FUZZ = 2  # ES fuzziness cap for the completion suggester


def completion_inputs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens: int = 4,
) -> DataFrame:
    """Derive a (text, weight) suggestion relation from a documents
    table: input = the first ``n_tokens`` whitespace tokens of the
    doc's first line lowercased (a title stand-in), weight = the doc's
    token count (longer docs suggest first — any deterministic integer
    works; real deployments index explicit weights). -> (text, weight,
    doc_id)."""
    first_line = F.element_at(F.split(F.col(text_col), "\n"), 1)
    toks = F.split(F.trim(first_line), r"\s+")
    return (
        docs.select(
            F.lower(
                F.array_join(F.slice(toks, 1, n_tokens), " ")
            ).alias("text"),
            F.size(F.split(F.col(text_col), r"\s+")).cast("long").alias("weight"),
            F.col(id_col).alias("doc_id"),
        )
        .filter(F.length(F.trim("text")) > 0)
    )


def _distinct_lengths(prefixes: DataFrame) -> list[int]:
    return sorted(
        int(r["_l"])
        for r in prefixes.select(F.length("prefix").alias("_l")).distinct().collect()
    )


def complete(
    suggestions: DataFrame,
    prefixes: DataFrame | Iterable[tuple],
    size: int = 5,
    skip_duplicates: bool = False,
    fuzziness: int = 0,
    fuzzy_min_length: int = 3,
    fuzzy_prefix_length: int = 1,
    broadcast_queries: bool = True,
    context_col: str | None = None,
    contexts: DataFrame | Iterable[tuple] | None = None,
) -> DataFrame:
    """(text, weight) suggestions x (qid, prefix) -> the ES completion
    response: (qid, text, weight, rank), top ``size`` per query by
    (weight desc, text asc).

    ``fuzziness`` > 0 admits inputs whose prefix is within that edit
    distance of the typed prefix (classic Levenshtein — Lucene's
    transposition automaton counts a swap as ONE edit, documented
    divergence), but only for prefixes of at least ``fuzzy_min_length``
    chars (ES default 3; shorter prefixes stay exact), and the first
    ``fuzzy_prefix_length`` chars must match exactly (ES default 1 —
    0 is accepted but degrades to a dictionary scan).

    ``contexts``/``context_col``: the ES CATEGORY context (the
    completion field's ``contexts`` mapping). ``context_col`` names a
    suggestion column holding the indexed context value(s) — a plain
    string or an array of strings; ``contexts`` carries the request's
    per-query filters as (qid, context) or (qid, context, boost) rows
    (boost default 1.0 — ES's per-context boost). A suggestion
    qualifies if it carries ANY requested context for that qid (the ES
    OR rule); its option score is weight x the best matching boost, and
    the response gains a ``score`` column and ranks by (score desc,
    text asc). Duplicate texts collapse to their best-scored option
    under contexts (the multi-context fan-in; ES's skip_duplicates
    shape). Geo contexts are a documented boundary (the geo family
    covers the spatial predicates; wiring them here is presentation).
    """
    spark = suggestions.sparkSession
    if not isinstance(prefixes, DataFrame):
        prefixes = spark.createDataFrame(
            list(prefixes), "qid long, prefix string"
        )
    if fuzziness < 0 or fuzziness > _MAX_FUZZ:
        raise ValueError(f"fuzziness must be 0..{_MAX_FUZZ}, got {fuzziness}")
    if fuzzy_prefix_length < 0:
        raise ValueError("fuzzy_prefix_length must be >= 0")
    if (contexts is None) != (context_col is None):
        raise ValueError("contexts and context_col must be given together")
    if context_col is not None and context_col not in suggestions.columns:
        raise ValueError(
            f"context_col {context_col!r} not in suggestion columns "
            f"{suggestions.columns}"
        )
    keep = ["text", "weight"] + ([context_col] if context_col else [])
    sugg = suggestions.select(*keep)
    lengths = _distinct_lengths(prefixes)
    if 0 in lengths:
        raise ValueError(
            "empty prefix matches the whole dictionary; refuse (the "
            "expand_prefix contract)"
        )

    def _maybe_b(df):
        return F.broadcast(df) if broadcast_queries else df

    parts: list[DataFrame] = []
    for L in lengths:
        p = prefixes.filter(F.length("prefix") == L)
        if fuzziness > 0 and L >= fuzzy_min_length:
            lo, hi = max(1, L - fuzziness), L + fuzziness
            cond = None
            for L2 in range(lo, hi + 1):
                c = (
                    F.levenshtein(
                        F.substring(F.col("text"), 1, L2), F.col("prefix")
                    )
                    <= fuzziness
                )
                cond = c if cond is None else (cond | c)
            fpl = fuzzy_prefix_length
            if fpl > 0:
                join_on = (
                    F.substring(F.col("text"), 1, fpl)
                    == F.substring(F.col("prefix"), 1, fpl)
                ) & cond
            else:
                join_on = cond  # documented dictionary scan
            parts.append(
                sugg.join(_maybe_b(p), join_on).select("qid", *keep)
            )
        else:
            parts.append(
                sugg.join(
                    _maybe_b(p),
                    F.substring(F.col("text"), 1, L) == F.col("prefix"),
                ).select("qid", *keep)
            )
    qid_t = prefixes.schema["qid"].dataType.simpleString()
    if not parts:
        return spark.createDataFrame(
            [], f"qid {qid_t}, text string, weight long, "
            + ("score double, " if contexts is not None else "")
            + "rank int"
        )
    cand = parts[0]
    for extra in parts[1:]:
        cand = cand.unionByName(extra)
    if contexts is not None:
        if not isinstance(contexts, DataFrame):
            rows = [
                (r[0], r[1], float(r[2]) if len(r) > 2 else 1.0)
                for r in contexts
            ]
            contexts = spark.createDataFrame(
                rows, f"qid {qid_t}, context string, boost double"
            )
        elif "boost" not in contexts.columns:
            contexts = contexts.withColumn("boost", F.lit(1.0))
        ctype = dict(cand.dtypes)[context_col]
        match = (
            F.array_contains(F.col(context_col), F.col("context"))
            if ctype.startswith("array")
            else F.col(context_col) == F.col("context")
        )
        cand = (
            cand.join(_maybe_b(contexts.withColumnRenamed("qid", "_cq")),
                      (F.col("qid") == F.col("_cq")) & match)
            .select(
                "qid", "text", "weight",
                (F.col("weight") * F.col("boost")).alias("score"),
            )
            .groupBy("qid", "text")
            .agg(
                F.max_by("weight", "score").alias("weight"),
                F.max("score").alias("score"),
            )
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("score").desc(), F.col("text").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= size)
            .select("qid", "text", "weight", "score", "rank")
        )
    if skip_duplicates:
        cand = cand.groupBy("qid", "text").agg(F.max("weight").alias("weight"))
    w = Window.partitionBy("qid").orderBy(
        F.col("weight").desc(), F.col("text").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= size)
        .select("qid", "text", "weight", "rank")
    )
