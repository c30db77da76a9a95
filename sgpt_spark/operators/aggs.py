"""ES search AGGREGATIONS — the ``aggs`` half of a search request,
computed over the full match set (not the top-k page), the way ES runs
a terms or histogram aggregation alongside a query.

The reference rides ES for all retrieval (crossencoder/beir/
crossencoder_beir_bm25.ipynb builds the search bodies); the analytics
surface those requests COULD carry is the Lucene facet/doc-values
aggregation machinery. This module re-expresses it Spark-first,
reusing two existing relations:

  * the MATCH SET: docs matching >= 1 analyzed query term — one
    term-pruned postings scan, ``flatten_postings`` decode, shuffle
    join against the in-plan query vocabulary, distinct. Exactly the
    doc set ES's aggregation phase iterates (its hit bitset), bounded
    by the matched terms' total df, never |corpus|.
  * the DOC-VALUES sidecar (``indexer.build_postings_with_docvalues``)
    joined by doc_id — aggregations don't need segment alignment, only
    the per-doc field values (the Lucene doc-values read path).

Both aggregations are pure DataFrame plans (no UDF, no driver loop):

``terms_agg``      ES ``terms``: top-``size`` buckets per query by
                   (doc_count desc, value asc) — the ES bucket order.
                   NULL field values are excluded (ES ``missing`` is an
                   opt-in parameter, not the default). ``metrics=``
                   nests metric SUB-aggregations (avg/sum/min/max) the
                   way an ES terms agg carries an ``aggs`` body: the
                   bucket groupBy computes them in the same map-side-
                   combinable pass, no second scan.
``histogram_agg``  ES ``histogram``: fixed-interval buckets, keys =
                   floor(value / interval) * interval; empty buckets
                   between each query's min and max key are emitted
                   with doc_count 0 (the ES min_doc_count=0 default),
                   via a per-query ``sequence`` explode — declarative,
                   no driver knowledge of the key range.
``stats_agg``      ES ``stats`` metric aggregation: one row per query
                   with count/min/max/avg/sum over the field's non-null
                   values in the match set.
``range_agg``      ES ``range``: explicit [from, to) buckets, every
                   requested bucket emitted per query even at
                   doc_count 0 (the ES contract), keys spelled
                   "from-to" with "*" for open ends.
``cardinality_agg`` ES ``cardinality``: distinct non-null values per
                   query. ``exact=True`` (default, oracle-gateable) is
                   one count_distinct; ``exact=False`` is
                   approx_count_distinct — Spark's HyperLogLog++, the
                   SAME sketch ES uses, the path a 10^12-doc match set
                   wants (no distinct shuffle, mergeable sketches).

Scale notes (10^12 docs): the postings scan is pruned to the query
vocabulary at the parquet reader; the match set is |matching docs| x
|queries sharing them| rows (the ES agg-phase iteration cost); the
docvalues join shuffles on doc_id and the bucket counting is one
map-side-combinable groupBy. Bucket fan-out is bounded by size (terms)
or the key span / interval (histogram).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sgpt_spark.operators.index_search import flatten_postings, normalize_queries
from sgpt_spark.operators.indexer import IndexMeta
from sgpt_spark.operators.search import query_terms


def match_candidates(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    tokenizer=None,
    materialize: bool = True,
    strategy: str = "cogroup",
) -> DataFrame:
    """-> distinct (qid, doc_id) docs matching >= 1 analyzed query term
    (ES match query, operator=or — the aggregation phase's hit set).

    Fully in-plan under BOTH strategies (queries tokenize with the
    index's analyzer — JVM column twin — and never touch the driver).

    ``strategy='cogroup'`` (default, r6): the query vocabulary cogroups
    with the term-pruned posting blocks per segment and the kernel
    emits each query's UNION of matching doc arrays (one numpy
    unique/concat per query) — the distinct is free because segments
    PARTITION docs, so the hit set leaves the kernel already globally
    distinct with ZERO exchanges on the hit rows. The r5 relational
    spelling (flatten -> probe join -> distinct) shuffled the
    pre-distinct pair relation twice; on the bench shape that is ~80M
    rows per request. ``strategy='relational'`` pins that spelling (the
    verification twin).

    ``materialize=True`` (default) marks the hit set with a LAZY
    ``localCheckpoint``: nothing runs at declaration time, but the
    first action computes the match set ONCE and every further
    aggregation over the same candidates relation reuses it — the way
    ES computes the hit bitset once per request and runs every agg of
    the body against it. Without it, a request carrying several aggs
    re-decodes the postings per agg. On the cogroup path the
    checkpoint stores the kernel's ARRAY emission — one (qid,
    doc_ids array<long>) row per (segment, query), the hit-bitset
    shape — and consumers see it through an in-plan ``explode``:
    checkpointing the exploded pair relation instead costs one
    serialized row per (qid, doc) (measured ~3x the whole kernel);
    the array rows serialize as flat buffers. Still bounded by the
    matched terms' total df — never |corpus| — and stored SERIALIZED
    (PySpark's MEMORY_AND_DISK): the deserialized default costs ~10x
    the heap per row and OOMs a request stream whose checkpoints the
    context cleaner has not yet released.
    """
    from pyspark import StorageLevel
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer

    if strategy not in ("cogroup", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use cogroup|relational"
        )
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tok = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    qt = query_terms(queries, tokenizer=tok)
    if strategy == "cogroup":
        packed = _match_candidates_cogroup(
            spark, postings, meta, qt,
            queries.schema["qid"].dataType.simpleString(),
        )
        if materialize:
            packed = packed.localCheckpoint(
                eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
        return packed.select(
            "qid", F.explode("doc_ids").alias("doc_id")
        )
    cand = postings.join(qt.select("term").distinct(), "term", "left_semi")
    flat = flatten_postings(cand, codec=meta.codec).select("term", "doc_id")
    out = (
        flat.join(qt.select("qid", "term").distinct(), "term")
        .select("qid", "doc_id")
        .distinct()
    )
    if not materialize:
        return out
    return out.localCheckpoint(
        eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
    )


def _match_candidates_cogroup(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    qt: DataFrame,
    qid_type: str,
) -> DataFrame:
    """The cogroup hit-set kernel: (segment blocks) x (segment's query
    terms) -> per query the numpy union of its terms' doc arrays,
    emitted PACKED as one (qid, doc_ids array) row per (segment,
    query) — the hit-bitset shape. Exploding in the JVM keeps the
    Python->JVM boundary at |segments| x |queries| rows (flat int64
    buffers) instead of one object-typed row per (qid, doc) pair; the
    exploded relation is still globally distinct because segments
    partition docs."""
    import numpy as np
    import pandas as pd

    from sgpt_spark.functions.compress import decode_many

    qterms = qt.select("qid", "term").distinct()
    cand = postings.join(
        qterms.select("term").distinct(), "term", "left_semi"
    ).select("segment", "term", "blocks")
    presence = postings.select(
        F.col("segment").cast("int").alias("segment"),
        F.col("term").cast("string").alias("term"),
    ).alias("_mc_presence")
    qt_a = qterms.alias("_mc_qt")
    qseg = qt_a.join(
        presence, F.col("_mc_qt.term") == F.col("_mc_presence.term")
    ).select(
        F.col("_mc_presence.segment").alias("segment"),
        F.col("_mc_qt.qid").alias("qid"),
        F.col("_mc_qt.term").alias("term"),
    )
    codec = meta.codec
    out_schema = f"qid {qid_type}, doc_ids array<long>"

    def hits(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        if len(pleft) == 0 or len(pright) == 0:
            return pd.DataFrame({"qid": [], "doc_ids": []})
        offs, d_all, _, _ = decode_many(list(pleft["blocks"]), codec)
        docs_of = {}
        for i, term in enumerate(pleft["term"]):
            s, e = int(offs[i]), int(offs[i + 1])
            if e > s:
                docs_of[term] = d_all[s:e]
        per_q: dict = {}
        for qid, term in zip(pright["qid"], pright["term"]):
            arr = docs_of.get(term)
            if arr is not None:
                per_q.setdefault(qid, []).append(arr)
        if not per_q:
            return pd.DataFrame({"qid": [], "doc_ids": []})
        qids_out, docs_out = [], []
        for qid, arrs in per_q.items():
            u = arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
            qids_out.append(qid)
            docs_out.append(u.astype(np.int64))
        return pd.DataFrame({"qid": qids_out, "doc_ids": docs_out})

    return (
        cand.groupBy("segment")
        .cogroup(qseg.groupBy("segment"))
        .applyInPandas(hits, schema=out_schema)
    )


_METRIC_FNS = ("avg", "sum", "min", "max")


def _metric_cols(metrics, docvalues_cols) -> list:
    """(metric, field) pairs -> aggregate columns named ``{metric}_{field}``.

    ES metric semantics: missing (NULL) values are ignored — min/max/sum
    skip them natively; avg is spelled sum/count explicitly so both
    engines compute the SAME two exact integer aggregates and ONE
    IEEE division (DuckDB's avg() is reproducible that way, bit for
    bit, which keeps metric sub-aggs value-gateable)."""
    out = []
    for metric, mfield in metrics:
        if metric not in _METRIC_FNS:
            raise ValueError(f"unknown metric {metric!r}: {_METRIC_FNS}")
        if mfield not in docvalues_cols:
            raise ValueError(
                f"metric field {mfield!r} not in docvalues columns {docvalues_cols}"
            )
        name = f"{metric}_{mfield}"
        if metric == "avg":
            out.append(
                (F.sum(mfield).cast("double") / F.count(mfield)).alias(name)
            )
        elif metric == "sum":
            out.append(F.sum(mfield).cast("long").alias(name))
        else:
            out.append(getattr(F, metric)(mfield).alias(name))
    return out


def terms_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    size: int = 10,
    metrics: Iterable[tuple[str, str]] = (),
) -> DataFrame:
    """ES ``terms`` aggregation over the match set -> (qid, value,
    doc_count, *metrics, bucket_rank), top-``size`` buckets per query by
    (doc_count desc, value asc). Values compare as strings (the ES
    keyword-bucket key); NULL field values are excluded.

    ``metrics``: (metric, field) pairs — nested metric sub-aggregations
    (the ES ``aggs`` body inside a terms bucket), computed in the SAME
    groupBy pass as doc_count (columns ``{metric}_{field}``). Docs with
    a NULL metric value count in doc_count but not in the metric (ES
    ignores missing values)."""
    if field not in docvalues.columns:
        raise ValueError(
            f"terms_agg field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    metrics = list(metrics)
    mcols = _metric_cols(metrics, docvalues.columns)  # validates first
    proj = ["doc_id", field] + sorted({m[1] for m in metrics} - {field})
    vals = candidates.join(
        docvalues.select(*proj), "doc_id"
    ).filter(F.col(field).isNotNull())
    counts = vals.groupBy(
        "qid", F.col(field).cast("string").alias("value")
    ).agg(F.count("*").alias("doc_count"), *mcols)
    w = Window.partitionBy("qid").orderBy(
        F.col("doc_count").desc(), F.col("value").asc()
    )
    return counts.withColumn("bucket_rank", F.row_number().over(w)).filter(
        F.col("bucket_rank") <= size
    )


def histogram_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    interval: int,
    min_doc_count: int = 0,
) -> DataFrame:
    """ES ``histogram`` aggregation over the match set -> (qid, bucket,
    doc_count), bucket = floor(value / interval) * interval (bigint
    keys — the engine's numeric doc values are integral; ES's
    double-keyed buckets for float fields are a documented boundary).

    ``min_doc_count=0`` (the ES default) emits EMPTY buckets between
    each query's min and max key: a per-query ``sequence(min, max,
    interval)`` explode left-joins the counts — no driver-side key
    range, no UDF. ``min_doc_count=1`` skips the fill (counts only).
    """
    if field not in docvalues.columns:
        raise ValueError(
            f"histogram_agg field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    if interval <= 0:
        raise ValueError(f"histogram_agg interval must be positive, got {interval}")
    vals = candidates.join(
        docvalues.select("doc_id", field), "doc_id"
    ).filter(F.col(field).isNotNull())
    bucket = (
        F.floor(F.col(field).cast("double") / F.lit(int(interval)))
        * F.lit(int(interval))
    ).cast("long")
    counts = vals.groupBy("qid", bucket.alias("bucket")).agg(
        F.count("*").alias("doc_count")
    )
    if min_doc_count >= 1:
        return counts.select("qid", "bucket", "doc_count")
    # lazy localCheckpoint: the bucket relation is tiny (|qids| x key
    # span / interval) but derives from the full match-set join, and
    # the empty-bucket fill consumes it TWICE (bounds + the left join)
    # — without it the heavy join+groupBy runs twice per action
    counts = counts.localCheckpoint(eager=False)
    bounds = counts.groupBy("qid").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    filled = bounds.select(
        "qid",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(interval)))
        ).alias("bucket"),
    )
    return filled.join(counts, ["qid", "bucket"], "left").select(
        "qid",
        "bucket",
        F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
    )


def stats_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
) -> DataFrame:
    """ES ``stats`` metric aggregation over the match set -> one row per
    query: (qid, value_count, min_value, max_value, avg_value,
    sum_value) over the field's non-NULL values (ES ignores missing
    values; a query whose match set has only NULL values reports
    value_count 0 with NULL min/max/avg — the ES empty-stats shape).
    avg is spelled sum/count so the division is one exact IEEE step in
    any engine (see ``_metric_cols``)."""
    if field not in docvalues.columns:
        raise ValueError(
            f"stats_agg field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    vals = candidates.join(docvalues.select("doc_id", field), "doc_id")
    return vals.groupBy("qid").agg(
        F.count(field).alias("value_count"),
        F.min(field).alias("min_value"),
        F.max(field).alias("max_value"),
        (F.sum(field).cast("double") / F.count(field)).alias("avg_value"),
        F.sum(field).cast("long").alias("sum_value"),
    )


def range_key(lo, hi) -> str:
    """ES range-bucket key spelling: "from-to" with "*" for open ends."""
    return f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"


def range_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    ranges: Iterable[tuple[int | None, int | None]],
) -> DataFrame:
    """ES ``range`` aggregation over the match set -> (qid, range_key,
    doc_count): explicit half-open [from, to) buckets (the ES range
    contract — ``from`` inclusive, ``to`` exclusive; None = open end).
    EVERY requested bucket is emitted for every query with a non-empty
    match set, doc_count 0 when nothing lands in it (ES always returns
    the full requested bucket list). Ranges may overlap (a doc counts
    in each bucket it falls in — ES allows this) but must not be
    unbounded on both ends duplicated; NULL field values fall in no
    bucket.

    Plan (r6): ONE pass — the requested ranges compile to conditional
    count columns in a single groupBy(qid) over the candidates-left-
    joined doc values (map-side combinable, no theta-join row blowup:
    the r5 spelling multiplied the match relation by the overlapping-
    range fan-out and re-scanned the candidates for the empty-bucket
    qid list), then one in-plan arrays_zip/explode unpivots the wide
    counts to (qid, range_key, doc_count). Empty buckets survive
    because every candidate qid reaches the groupBy via the left join.
    No UDF, no driver loop.
    """
    if field not in docvalues.columns:
        raise ValueError(
            f"range_agg field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    rs = list(ranges)
    if not rs:
        raise ValueError("range_agg needs at least one range")
    keys = [range_key(lo, hi) for lo, hi in rs]
    if len(set(keys)) != len(keys):
        raise ValueError(f"duplicate range buckets in {keys}")
    joined = candidates.join(
        docvalues.select("doc_id", field), "doc_id", "left"
    )
    conds = []
    for lo, hi in rs:
        c = F.col(field).isNotNull()
        if lo is not None:
            c = c & (F.col(field) >= F.lit(int(lo)))
        if hi is not None:
            c = c & (F.col(field) < F.lit(int(hi)))
        conds.append(c)
    wide = joined.groupBy("qid").agg(
        *[
            F.coalesce(F.sum(F.when(c, F.lit(1))), F.lit(0))
            .cast("long")
            .alias(f"_b{i}")
            for i, c in enumerate(conds)
        ]
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(k) for k in keys]).alias("range_key"),
        F.array(*[F.col(f"_b{i}") for i in range(len(keys))]).alias(
            "doc_count"
        ),
    )
    return wide.select("qid", F.explode(pairs).alias("_kv")).select(
        "qid",
        F.col("_kv.range_key").alias("range_key"),
        F.col("_kv.doc_count").alias("doc_count"),
    )


def cardinality_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    exact: bool = True,
) -> DataFrame:
    """ES ``cardinality`` metric aggregation over the match set ->
    (qid, value_count): distinct non-NULL values of ``field`` per query.

    ``exact=True`` (default): one count_distinct — deterministic, the
    oracle-gateable form. ``exact=False``: approx_count_distinct —
    Spark's HyperLogLog++, the SAME sketch ES's cardinality agg runs
    (its precision_threshold knob maps to ``rsd``); at a 10^12-doc
    match set this is the path to take: partial sketches merge
    map-side, nothing re-shuffles per distinct value. The two paths are
    pytest-equated on small cardinalities (HLL++ is exact under its
    sparse-register regime) and the exact path carries the gate."""
    if field not in docvalues.columns:
        raise ValueError(
            f"cardinality_agg field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    vals = candidates.join(docvalues.select("doc_id", field), "doc_id")
    agg = (
        F.count_distinct(F.col(field))
        if exact
        else F.approx_count_distinct(field)
    )
    return vals.groupBy("qid").agg(agg.alias("value_count"))


def significant_terms_agg(
    candidates: DataFrame,
    corpus: DataFrame,
    meta: IndexMeta,
    term_stats: DataFrame,
    size: int = 10,
    min_doc_count: int = 3,
    tokenizer=None,
    filter_duplicate_text: bool = False,
) -> DataFrame:
    """ES ``significant_terms`` aggregation over the match set ->
    (qid, term, fg_count, bg_count, score, bucket_rank): the text terms
    UNUSUALLY frequent in each query's match set versus the whole index
    (the "dog breeds in the bite-report match set" ES example), scored
    with JLH — ES's default significance heuristic:

        fgp = fg_count / fg_size      (term's doc share in the match set)
        bgp = bg_count / bg_size      (term's doc share in the index)
        score = (fgp - bgp) * fgp / bgp   iff fgp > bgp, else excluded

    ``min_doc_count`` (ES default 3) prunes terms too rare in the
    foreground to be evidence. Buckets order by (score desc, term asc)
    — ES orders by significance; term asc is the engine's deterministic
    tie-break. Both ratios and the score are plain double arithmetic in
    one fixed association order, so the aggregation is value-gateable.

    Foreground counting follows ES's fetch pattern (doc term vectors of
    the HIT SET, never the whole index): the corpus left-semi prunes to
    the matched docs, ONLY those re-analyze (the index's analyzer — the
    same spelling ``build_postings`` used, so foreground terms live in
    the same vocabulary as ``term_stats``), and distinct (doc, term)
    pairs count per query. Background = the build-time (term, df) side
    table; bg_size = meta.n_docs. At 10^12 docs the re-analyze cost is
    |match set| docs, not |corpus| — the same bound as the ES agg phase.

    ``filter_duplicate_text=True`` is ES ``significant_text``'s
    copied-boilerplate guard: duplicated hit text must not inflate
    significance, so per query the EXACT-duplicate texts collapse to
    one representative (min doc_id) before any counting — fg_count AND
    fg_size both see the deduplicated set. Documented divergence,
    narrower by design: ES also drops near-duplicate 6-token runs (a
    streaming heuristic); exact collapse is the deterministic,
    value-checkable subset, and near-dup collapse composes from the
    engine's MinHash/SimHash operators when a corpus needs it. One
    extra md5 groupBy on the hit set — still |match set|-bounded.
    (With this flag the operator IS ES ``significant_text``: the
    foreground already re-analyzes raw text per the fetch pattern.)
    """
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer

    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if min_doc_count < 1:
        raise ValueError(f"min_doc_count must be >= 1, got {min_doc_count}")
    tok = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    if filter_duplicate_text:
        hit_hash = corpus.join(
            candidates.select("doc_id").distinct(), "doc_id", "left_semi"
        ).select("doc_id", F.md5(F.col("text")).alias("_th"))
        candidates = (
            candidates.join(hit_hash, "doc_id")
            .groupBy("qid", "_th")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("qid", "doc_id")
        )
    hit_docs = candidates.select("doc_id").distinct()
    doc_terms = (
        corpus.join(hit_docs, "doc_id", "left_semi")
        .select("doc_id", F.explode(tok(F.col("text"))).alias("term"))
        .distinct()
    )
    fg = (
        candidates.join(doc_terms, "doc_id")
        .groupBy("qid", "term")
        .agg(F.count("*").alias("fg_count"))
        .filter(F.col("fg_count") >= min_doc_count)
    )
    fgn = candidates.groupBy("qid").agg(F.count("*").alias("_fg_n"))
    fgp = F.col("fg_count") / F.col("_fg_n").cast("double")
    bgp = F.col("bg_count") / F.lit(float(meta.n_docs))
    scored = (
        fg.join(fgn, "qid")
        .join(term_stats.select("term", F.col("df").alias("bg_count")), "term")
        .withColumn("_fgp", fgp)
        .withColumn("_bgp", bgp)
        .filter(F.col("_fgp") > F.col("_bgp"))
        .select(
            "qid",
            "term",
            "fg_count",
            "bg_count",
            (
                (F.col("_fgp") - F.col("_bgp")) * F.col("_fgp") / F.col("_bgp")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.round("score", 6).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("score", F.round("score", 6))
        .withColumn("bucket_rank", F.row_number().over(w))
        .filter(F.col("bucket_rank") <= size)
    )


_CALENDAR_STEPS = {
    "day": "interval 1 day",
    "week": "interval 7 day",
    "month": "interval 1 month",
    "quarter": "interval 3 month",
    "year": "interval 1 year",
}


def date_histogram_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    calendar_interval: str = "month",
    min_doc_count: int = 0,
) -> DataFrame:
    """ES ``date_histogram`` aggregation over the match set -> (qid,
    bucket, doc_count): calendar-interval buckets (day / week / month /
    quarter / year — the ES calendar_interval spellings this engine
    carries), keys = ``date_trunc`` of the doc-values date, emitted as
    DATE (ES emits epoch millis; DATE is the same bucket identity
    without timezone-epoch ambiguity — the session runs UTC either
    way). ``min_doc_count=0`` (the ES default) fills EMPTY buckets
    between each query's min and max key with doc_count 0 via a
    per-query ``sequence`` explode — declarative, no driver knowledge
    of the key range; ``min_doc_count=1`` skips the fill (the other ES
    spelling this engine supports). NULL dates fall in no bucket.

    Calendar boundaries agree across engines by construction: both
    Spark and DuckDB ``date_trunc`` weeks start Monday (ISO) and months
    on the 1st, and the fill steps by the same calendar interval, so
    the bucket key sets are value-gateable.
    """
    if field not in docvalues.columns:
        raise ValueError(
            f"date_histogram field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    if calendar_interval not in _CALENDAR_STEPS:
        raise ValueError(
            f"unknown calendar_interval {calendar_interval!r}: "
            f"{tuple(_CALENDAR_STEPS)}"
        )
    if min_doc_count not in (0, 1):
        raise ValueError(
            f"min_doc_count must be 0 or 1, got {min_doc_count}"
        )
    vals = (
        candidates.join(docvalues.select("doc_id", field), "doc_id")
        .filter(F.col(field).isNotNull())
        .select(
            "qid",
            F.date_trunc(calendar_interval if calendar_interval != "week"
                         else "week", F.col(field))
            .cast("date")
            .alias("bucket"),
        )
    )
    counts = vals.groupBy("qid", "bucket").agg(F.count("*").alias("doc_count"))
    if min_doc_count == 1:
        return counts
    # same double-consumption shape as histogram_agg: checkpoint the
    # tiny bucket relation so the match-set join runs once per action
    counts = counts.localCheckpoint(eager=False)
    step = _CALENDAR_STEPS[calendar_interval]
    spans = counts.groupBy("qid").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    full = spans.select(
        "qid",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(step))
        ).alias("bucket"),
    )
    return full.join(counts, ["qid", "bucket"], "left").select(
        "qid",
        "bucket",
        F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
    )


def top_hits_agg(
    scored: DataFrame,
    docvalues: DataFrame,
    field: str,
    size: int = 10,
    hits: int = 3,
) -> DataFrame:
    """ES ``top_hits`` sub-aggregation inside a ``terms`` bucket ->
    (qid, value, doc_count, doc_id, score, bucket_rank, hit_rank): for
    each query's top-``size`` buckets (the terms-agg order — doc_count
    desc, value asc), the ``hits`` best-scoring matched docs (rounded
    score desc, doc_id asc — the engine-wide ranking contract; ES
    top_hits sorts by _score the same way).

    ``scored``: the match query's FULL scored set (qid, doc_id, score)
    — ``funcscore.match_scores`` produces it off the index; the bucket
    membership and the hit ranking ride ONE docvalues join. NULL bucket
    values are excluded (terms-agg semantics). Two windows, both
    partition-pruned: bucket selection on the (qid, value) counts
    relation (<= |buckets| rows), hit selection on the matched rows of
    the surviving buckets only.
    """
    if field not in docvalues.columns:
        raise ValueError(
            f"top_hits field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    if size < 1 or hits < 1:
        raise ValueError(f"size and hits must be >= 1, got {size}, {hits}")
    # NOTE (r6, measured): vals is consumed twice (bucket counting +
    # hit-selection join) and a lazy serialized checkpoint here was
    # A/B'd SLOWER (writing |match set| post-join rows costs more than
    # recomputing the array-form kernel + broadcast join) — pinned
    # double compute on purpose
    vals = (
        scored.join(docvalues.select("doc_id", field), "doc_id")
        .filter(F.col(field).isNotNull())
        .select(
            "qid",
            F.col(field).cast("string").alias("value"),
            "doc_id",
            F.round("score", 6).alias("score"),
        )
    )
    buckets = (
        vals.groupBy("qid", "value")
        .agg(F.count("*").alias("doc_count"))
        .withColumn(
            "bucket_rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.col("doc_count").desc(), F.col("value").asc()
                )
            ),
        )
        .filter(F.col("bucket_rank") <= size)
    )
    hw = Window.partitionBy("qid", "value").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        vals.join(buckets, ["qid", "value"])
        .withColumn("hit_rank", F.row_number().over(hw))
        .filter(F.col("hit_rank") <= hits)
        .select("qid", "value", "doc_count", "doc_id", "score",
                "bucket_rank", "hit_rank")
    )


def sampler_candidates(
    scored: DataFrame,
    shard_size: int = 100,
) -> DataFrame:
    """ES ``sampler`` aggregation -> the (qid, doc_id) candidates
    relation any bucket/metric agg consumes, limited to each query's
    ``shard_size`` BEST-SCORING matched docs (rounded score desc,
    doc_id asc — the engine-wide ranking contract).

    This is ES's own answer to expensive sub-aggregations (its docs
    pair sampler with significant_terms explicitly): the downstream
    agg's cost drops from |match set| to shard_size per query. ES
    samples the top docs PER SHARD; this engine takes the global
    per-query top — a deterministic, strictly-better sample of the same
    size contract (documented divergence: a global top is what
    shard_size converges to as shards grow), which is what keeps the
    composition value-gateable.

    ``scored``: the full scored match set (funcscore.match_scores).
    """
    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    w = Window.partitionBy("qid").orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= shard_size)
        .select("qid", "doc_id")
        # lazy checkpoint: the sample is tiny (|qids| x shard_size) but
        # its derivation windows the FULL scored match set; downstream
        # aggs (significant_terms consumes its candidates three times)
        # must not re-run that window per consumer
        .localCheckpoint(eager=False)
    )


def percentiles_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    percents: Iterable[float] = (1, 5, 25, 50, 75, 95, 99),
    exact: bool = True,
) -> DataFrame:
    """ES ``percentiles`` metric aggregation over the match set ->
    (qid, percent, value): the ES default percent keys unless
    overridden, values over the field's non-NULL doc values per query.

    ``exact=True`` (default): linear-interpolated exact percentiles —
    Spark ``percentile`` and DuckDB ``quantile_cont`` compute the SAME
    type-7 quantile, which is what makes this form value-gateable.
    ``exact=False``: the SCALE path — since round 6 a distributed
    value-histogram percentile: one map-side-combinable
    groupBy(qid, value) count, a cumulative window over the (tiny,
    distinct-value-bounded) bucket relation, and the type-7
    interpolation between the two straddling elements. It returns the
    SAME values as the exact path at every percentile position (the
    r5 ``percentile_approx`` sketch only agreed on element-aligned
    sets) while never holding per-group state: the heavy relation is
    reduced map-side and the window sorts |distinct values| rows per
    query, spilling gracefully — unlike both Spark percentile
    aggregates, whose per-group buffers (OpenHashMap / QuantileSummaries
    with per-row inserts) are memory-bounded AND codegen-opaque
    (``percentile_approx`` was the single slowest agg in the r5 bench,
    ~6x the groupBy floor). Equality with the exact path is
    pytest-pinned everywhere (test_aggs_opt_r06); the exact path
    carries the gate.
    """
    if field not in docvalues.columns:
        raise ValueError(
            f"percentiles field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    ps = [float(p) for p in percents]
    if not ps:
        raise ValueError("percentiles_agg needs at least one percent")
    if any(not (0 <= p <= 100) for p in ps):
        raise ValueError(f"percents must be in [0, 100], got {ps}")
    if len(set(ps)) != len(ps):
        raise ValueError(f"duplicate percents in {ps}")
    fracs = [p / 100.0 for p in ps]
    vals = candidates.join(docvalues.select("doc_id", field), "doc_id").filter(
        F.col(field).isNotNull()
    )
    if not exact:
        return _percentiles_from_histogram(vals, field, ps)
    agg = vals.groupBy("qid").agg(F.percentile(field, fracs).alias("_vs"))
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in ps]).alias("percent"),
        F.col("_vs").cast("array<double>").alias("value"),
    )
    return (
        agg.select("qid", F.explode(pairs).alias("_pv"))
        .select("qid", F.col("_pv.percent").alias("percent"),
                F.col("_pv.value").alias("value"))
    )


def _percentiles_from_histogram(
    vals: DataFrame, field: str, ps: list[float]
) -> DataFrame:
    """Distributed type-7 percentiles from a (qid, value) histogram.

    The straddling elements at positions floor/ceil of
    p/100 * (n - 1) are located by cumulative counts over the sorted
    distinct-value relation; interpolation uses the exact spelling
    Spark's Percentile aggregate evaluates (``lo*(ceil-pos) +
    hi*(pos-floor)``, element itself when the position is integral) so
    the two paths agree step for step."""
    hist = vals.groupBy("qid", F.col(field).alias("_v")).agg(
        F.count("*").alias("_c")
    )
    wcum = (
        Window.partitionBy("qid")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fan = (
        hist.select(
            "qid",
            "_v",
            "_c",
            F.sum("_c").over(wcum).alias("_cum"),
            F.sum("_c").over(Window.partitionBy("qid")).alias("_n"),
        )
        .select(
            "qid",
            "_v",
            "_cum",
            (F.col("_cum") - F.col("_c")).alias("_prev"),
            F.explode(
                F.array(*[F.lit(float(p)) for p in ps])
            ).alias("percent"),
            (F.col("_n") - 1).cast("double").alias("_nm1"),
        )
        .withColumn("_pos", F.col("_nm1") * F.col("percent") / F.lit(100.0))
        .withColumn("_lo", F.floor("_pos"))
        .withColumn("_hi", F.ceil("_pos"))
    )
    covers_lo = (F.col("_prev") <= F.col("_lo")) & (
        F.col("_lo") < F.col("_cum")
    )
    covers_hi = (F.col("_prev") <= F.col("_hi")) & (
        F.col("_hi") < F.col("_cum")
    )
    picked = (
        fan.filter(covers_lo | covers_hi)
        .groupBy("qid", "percent")
        .agg(
            F.max(F.when(covers_lo, F.col("_v"))).cast("double").alias("_vlo"),
            F.max(F.when(covers_hi, F.col("_v"))).cast("double").alias("_vhi"),
            F.max("_pos").alias("_p"),
        )
    )
    value = F.when(
        (F.col("_p") == F.floor("_p").cast("double"))
        | (F.col("_vlo") == F.col("_vhi")),
        F.col("_vlo"),
    ).otherwise(
        F.col("_vlo") * (F.ceil("_p").cast("double") - F.col("_p"))
        + F.col("_vhi") * (F.col("_p") - F.floor("_p").cast("double"))
    )
    return picked.select("qid", "percent", value.alias("value"))


def composite_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    sources: list[str],
    size: int = 10,
    after: dict | DataFrame | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """ES ``composite`` aggregation: paginate through ALL buckets of a
    multi-source group-by in composite-key order — ES's designed answer
    to "enumerate every bucket" at scales where a terms agg's top-size
    cut loses data. -> (qid, *sources, doc_count, bucket_rank) with
    bucket_rank 1..size WITHIN the page.

    ``sources``: docvalues columns, each an ES terms source in request
    order; buckets order lexicographically ascending by the source
    tuple (the ES default order=asc per source). Docs with a NULL in
    ANY source are excluded (the ES terms-source default — missing
    buckets are opt-in via missing_bucket, not the default).

    ``after``: the keyset cursor — the LAST bucket key of the previous
    page, either {qid: (v1, v2, ...)} (driver-side, bounded by
    |queries| — the search_after contract) or a DataFrame
    (qid, after_<src1>, after_<src2>, ...) to stay fully in-plan for
    unbounded query sets (both forms are tested identical). Queries
    absent from the cursor get page 1.

    Scale shape: each page is ONE rank-filtered window over the bucket
    relation (partial/final WindowGroupLimit — no full per-query bucket
    sort materializes beyond the group-by's own output), and the keyset
    predicate prunes strictly-before buckets BEFORE the window. The
    group-by itself is one map-side-combinable shuffle keyed
    (qid, *sources) — the same cost ES pays building the composite's
    doc-values ordinals, but distributed.
    """
    if not sources:
        raise ValueError("composite_agg needs at least one source column")
    for s in sources:
        if s not in docvalues.columns:
            raise ValueError(
                f"composite source {s!r} not in docvalues columns "
                f"{docvalues.columns}"
            )
    if size < 1:
        raise ValueError(f"composite size must be >= 1, got {size}")
    vals = candidates.join(docvalues.select("doc_id", *sources), "doc_id")
    for s in sources:
        vals = vals.filter(F.col(s).isNotNull())
    counts = vals.groupBy("qid", *sources).agg(F.count("*").alias("doc_count"))

    if isinstance(after, dict) and not after:
        after = None  # empty cursor set == page 1 for every query
    if after is not None:
        acols = [f"_after_{s}" for s in sources]
        if isinstance(after, DataFrame):
            cur = after.toDF("qid", *acols)
        else:
            if spark is None:
                raise ValueError("composite_agg(after=dict) needs spark=")
            rows = [(qid, *tuple(v)) for qid, v in after.items()]
            # schema inferred from the cursor values so each after_*
            # column carries the SOURCE's own type (string or numeric).
            cur = spark.createDataFrame(rows, ["qid"] + acols)
        counts = counts.join(F.broadcast(cur), "qid", "left")
        # lexicographic (s1, s2, ...) > (a1, a2, ...): strictly-after
        # buckets only — the ES after-cursor is exclusive.
        gt = F.lit(False)
        for s, a in reversed(list(zip(sources, acols))):
            gt = (F.col(s) > F.col(a)) | ((F.col(s) == F.col(a)) & gt)
        counts = counts.filter(F.col(acols[0]).isNull() | gt).drop(*acols)

    w = Window.partitionBy("qid").orderBy(*[F.col(s).asc() for s in sources])
    return (
        counts.withColumn("bucket_rank", F.row_number().over(w))
        .filter(F.col("bucket_rank") <= size)
    )


def filters_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    filters: dict[str, str],
    other_bucket_key: str | None = None,
) -> DataFrame:
    """ES ``filters`` aggregation: one NAMED bucket per predicate ->
    (qid, key, doc_count), every named bucket emitted per matching
    query even at doc_count 0 (the bucket set is fixed by the request,
    not the data). ``filters``: name -> Spark SQL predicate over
    docvalues columns (the ES filter-context clause; a NULL predicate
    result counts as no-match, the ES missing-field behavior).
    ``other_bucket_key`` adds ES's other_bucket: docs matching NO named
    filter.

    One docvalues scan evaluates EVERY predicate as a boolean column in
    whole-stage codegen; one map-side-combinable groupBy(qid) sums them;
    a ``stack`` unpivot (rows = |filters|, not |docs|) emits the named
    buckets — no per-filter scan, no UDF, no driver loop. Queries with
    an empty match set emit nothing (consistent with every agg here:
    the agg phase runs over the hit set).
    """
    if not filters:
        raise ValueError("filters_agg needs at least one named filter")
    names = list(filters)
    reserved = set(names) & {"qid", "doc_id"}
    if reserved:
        raise ValueError(f"filter names collide with output columns: {reserved}")
    if other_bucket_key is not None and other_bucket_key in names:
        raise ValueError(
            f"other_bucket_key {other_bucket_key!r} collides with a filter name"
        )
    vals = candidates.join(docvalues, "doc_id")
    bools = {
        n: F.coalesce(F.expr(pred), F.lit(False)) for n, pred in filters.items()
    }
    aggs = [F.sum(b.cast("long")).alias(f"_c_{i}") for i, b in enumerate(bools.values())]
    if other_bucket_key is not None:
        none_match = ~F.greatest(*bools.values()) if len(bools) > 1 else ~next(
            iter(bools.values())
        )
        aggs.append(F.sum(none_match.cast("long")).alias("_c_other"))
    per_qid = vals.groupBy("qid").agg(*aggs)
    keys = names + ([other_bucket_key] if other_bucket_key is not None else [])
    cols = [f"_c_{i}" for i in range(len(names))] + (
        ["_c_other"] if other_bucket_key is not None else []
    )
    stack_args = ", ".join(
        f"'{k}', {c}" for k, c in zip(keys, cols)
    )
    return per_qid.select(
        "qid",
        F.expr(f"stack({len(keys)}, {stack_args}) as (key, doc_count)"),
    ).select("qid", F.col("key"), F.col("doc_count"))
