"""Deterministic BEIR-style query set derived from the documents table.

The reference evaluates against BEIR query sets shipped with each dataset
(beir_dense_retriever.py:390). The driver testdata has no queries table,
so we derive one deterministically from the corpus itself — the standard
known-item trick: every ``every``-th document contributes a query made of
its first ``n_terms`` tokens, qid = doc_id. The source doc is the
known-relevant item (qrels), which also gives the metrics operators a
ground truth. Fully expressible in both Spark and ANSI SQL, so the DuckDB
oracle derives the *identical* query set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgpt_spark.operators.corpus import non_empty_text

EVERY = 10
N_TERMS = 5


def derived_queries(documents: DataFrame, every: int = EVERY, n_terms: int = N_TERMS) -> DataFrame:
    """documents(doc_id, text) -> (qid, query)."""
    return (
        non_empty_text(documents)
        .filter(F.col("doc_id") % every == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.array_join(F.slice(F.split(F.col("text"), " ", -1), 1, n_terms), " ").alias(
                "query"
            ),
        )
    )


PREFIX_LEN = 3


def derived_phrase_prefix_queries(
    documents: DataFrame,
    every: int = EVERY,
    n_terms: int = N_TERMS,
    prefix_len: int = PREFIX_LEN,
) -> DataFrame:
    """The known-item query set reshaped for ``match_phrase_prefix``
    (search-as-you-type): same first ``n_terms`` tokens, but the LAST
    token is truncated to its first ``prefix_len`` characters — the
    user stopped typing mid-word. The SQL twin below applies the
    identical string transformation, so the DuckDB oracle derives the
    same query set character-for-character."""
    q = derived_queries(documents, every=every, n_terms=n_terms)
    arr = F.split(F.col("query"), " ", -1)
    trunc = F.concat(
        F.slice(arr, F.lit(1), F.size(arr) - F.lit(1)),
        F.array(F.substring(F.element_at(arr, -1), 1, prefix_len)),
    )
    return q.select("qid", F.array_join(trunc, " ").alias("query"))


def derived_bool_clauses(documents: DataFrame, every: int = EVERY) -> DataFrame:
    """Deterministic ES ``bool``-query clause set -> long-form
    (qid, occur, query), one row per clause, derived from the same
    known-item base docs as ``derived_queries``:

      must      the doc's first two tokens (always present)
      should    token 3   (docs with >= 3 tokens)
      filter    token 4   (docs with >= 4 tokens)
      must_not  token 6   (docs with >= 6 tokens — note this excludes
                the source doc itself, which contains that token:
                deliberate, it exercises exclusion on every long doc)

    The SQL twin below applies identical list arithmetic, so the DuckDB
    oracle derives the same clause rows character-for-character."""
    base = (
        non_empty_text(documents)
        .filter(F.col("doc_id") % every == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.split(F.col("text"), " ", -1).alias("toks"),
        )
        .withColumn("nt", F.size("toks"))
    )
    must = base.select(
        "qid", F.lit("must").alias("occur"),
        F.array_join(F.slice("toks", 1, 2), " ").alias("query"),
    )
    should = base.filter(F.col("nt") >= 3).select(
        "qid", F.lit("should").alias("occur"), F.element_at("toks", 3).alias("query")
    )
    filt = base.filter(F.col("nt") >= 4).select(
        "qid", F.lit("filter").alias("occur"), F.element_at("toks", 4).alias("query")
    )
    mnot = base.filter(F.col("nt") >= 6).select(
        "qid", F.lit("must_not").alias("occur"), F.element_at("toks", 6).alias("query")
    )
    return must.unionByName(should).unionByName(filt).unionByName(mnot)


def derived_qrels(documents: DataFrame, every: int = EVERY) -> DataFrame:
    """Known-item qrels: the source doc is relevant (relevance=1)."""
    return (
        non_empty_text(documents)
        .filter(F.col("doc_id") % every == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.col("doc_id").alias("doc_id"),
            F.lit(1).alias("relevance"),
        )
    )


# SQL twins (DuckDB dialect) — kept next to the Spark definitions so the
# two can't drift apart.
QUERIES_SQL = f"""
  SELECT doc_id AS qid,
         array_to_string(list_slice(string_split(text, ' '), 1, {N_TERMS}), ' ') AS query
  FROM documents
  WHERE doc_id % {EVERY} = 0 AND text IS NOT NULL AND length(trim(text)) > 0
"""

QRELS_SQL = f"""
  SELECT doc_id AS qid, doc_id, 1 AS relevance
  FROM documents
  WHERE doc_id % {EVERY} = 0 AND text IS NOT NULL AND length(trim(text)) > 0
"""

# match_phrase_prefix queryset: derived_phrase_prefix_queries' twin —
# the same raw-token truncation on the same base query string (DuckDB
# string_split keeps empty tokens like Spark's split, list_slice(_, 1, 0)
# is [] like Spark's slice, so the two stay byte-identical).
PHRASE_PREFIX_QUERIES_SQL = f"""
  SELECT qid,
         array_to_string(
           list_append(
             list_slice(qarr, 1, len(qarr) - 1),
             substr(qarr[len(qarr)], 1, {PREFIX_LEN})
           ), ' ') AS query
  FROM (SELECT qid, string_split(query, ' ') AS qarr FROM ({QUERIES_SQL}))
"""

def derived_bool_filters(documents: DataFrame, every: int = EVERY) -> DataFrame:
    """Deterministic STRUCTURED filter-context clause set -> long-form
    (qid, occur, field, op, value), derived from the same base docs as
    ``derived_bool_clauses``:

      filter   lang term = the base doc's own lang      (every base doc)
      filter   n_chars gte = base doc's n_chars // 2    (every base doc)
      must_not source term = 'src' || ((qid//every)%7)  (every 3rd)
      filter   lang exists                              (every 2nd)

    The known-item doc always passes its own lang/n_chars filters; the
    rotating must_not source sometimes excludes it (deliberate — both
    engines agree). The SQL twin below applies identical arithmetic."""
    base = (
        non_empty_text(documents)
        .filter(F.col("doc_id") % every == 0)
        .select("doc_id", "lang", "source", "n_chars")
    )
    qid = F.col("doc_id").alias("qid")

    def row(occur, field, op, value):
        return base.select(
            qid,
            F.lit(occur).alias("occur"),
            F.lit(field).alias("field"),
            F.lit(op).alias("op"),
            value.alias("value"),
        )

    f_lang = row("filter", "lang", "term", F.col("lang").cast("string"))
    f_len = row(
        "filter", "n_chars", "gte",
        F.floor(F.col("n_chars") / 2).cast("bigint").cast("string"),
    )
    f_not = base.filter(F.col("doc_id") % (3 * every) == 0).select(
        qid,
        F.lit("must_not").alias("occur"),
        F.lit("source").alias("field"),
        F.lit("term").alias("op"),
        F.concat(
            F.lit("src"),
            (F.floor(F.col("doc_id") / every) % 7).cast("bigint").cast("string"),
        ).alias("value"),
    )
    f_exists = base.filter(F.col("doc_id") % (2 * every) == 0).select(
        qid,
        F.lit("filter").alias("occur"),
        F.lit("lang").alias("field"),
        F.lit("exists").alias("op"),
        F.lit("").alias("value"),
    )
    return f_lang.unionByName(f_len).unionByName(f_not).unionByName(f_exists)


# bool-query clause set: derived_bool_clauses' twin — same base docs,
# same 1-based list arithmetic (string_split keeps empty tokens like
# Spark's split; toks[i] and element_at are both 1-based).
BOOL_CLAUSES_SQL = f"""
  WITH bool_base AS (
    SELECT doc_id AS qid, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS nt
    FROM documents
    WHERE doc_id % {EVERY} = 0 AND text IS NOT NULL AND length(trim(text)) > 0
  )
  SELECT qid, 'must' AS occur,
         array_to_string(list_slice(toks, 1, 2), ' ') AS query FROM bool_base
  UNION ALL
  SELECT qid, 'should', toks[3] FROM bool_base WHERE nt >= 3
  UNION ALL
  SELECT qid, 'filter', toks[4] FROM bool_base WHERE nt >= 4
  UNION ALL
  SELECT qid, 'must_not', toks[6] FROM bool_base WHERE nt >= 6
"""

# structured-filter clause set: derived_bool_filters' twin — same base
# docs, same integer arithmetic (// is DuckDB integer division, matching
# Spark's floor(x / n) on bigints).
BOOL_FILTERS_SQL = f"""
  WITH fbase AS (
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE doc_id % {EVERY} = 0 AND text IS NOT NULL AND length(trim(text)) > 0
  )
  SELECT doc_id AS qid, 'filter' AS occur, 'lang' AS field, 'term' AS op,
         CAST(lang AS VARCHAR) AS value FROM fbase
  UNION ALL
  SELECT doc_id, 'filter', 'n_chars', 'gte', CAST(n_chars // 2 AS VARCHAR)
  FROM fbase
  UNION ALL
  SELECT doc_id, 'must_not', 'source', 'term',
         'src' || CAST((doc_id // {EVERY}) % 7 AS VARCHAR)
  FROM fbase WHERE doc_id % {3 * EVERY} = 0
  UNION ALL
  SELECT doc_id, 'filter', 'lang', 'exists', '' FROM fbase
  WHERE doc_id % {2 * EVERY} = 0
"""


def derived_misspelled_phrases(
    documents: DataFrame, every: int = EVERY, n_terms: int = N_TERMS
) -> DataFrame:
    """The known-item query set with ONE deterministic misspelling per
    phrase (the phrase-suggester input shape): the token at 0-based
    position ``qid % n_tokens`` drops its last character when it is
    >= 5 chars (so the misspelling is >= 1 edit from a real dictionary
    term), other tokens stay verbatim. The SQL twin applies the same
    indexed transform, so both engines derive the identical phrase."""
    q = derived_queries(documents, every=every, n_terms=n_terms)
    arr = F.split(F.col("query"), " ", -1)
    mutated = F.transform(
        arr,
        lambda t, i: F.when(
            (i == F.pmod(F.col("qid"), F.size(arr))) & (F.length(t) >= 5),
            t.substr(F.lit(1), F.length(t) - 1),
        ).otherwise(t),
    )
    return q.select("qid", F.array_join(mutated, " ").alias("query"))


# derived_misspelled_phrases' twin: DuckDB list_transform's lambda index
# is 1-based (Spark's is 0-based), hence the i - 1.
MISSPELLED_QUERIES_SQL = f"""
  SELECT qid,
         array_to_string(
           list_transform(qarr, (t, i) ->
             CASE WHEN i - 1 = qid % len(qarr) AND length(t) >= 5
                  THEN substr(t, 1, length(t) - 1) ELSE t END), ' ') AS query
  FROM (SELECT qid, string_split(query, ' ') AS qarr FROM ({QUERIES_SQL}))
"""


def derived_negative_queries(
    documents: DataFrame, every: int = EVERY, n_terms: int = N_TERMS
) -> DataFrame:
    """The boosting query's NEGATIVE clause input: the LAST token of
    each positive query as a one-term match query — every positive hit
    containing that (usually common) term gets demoted, so the gate
    exercises genuine re-ordering. The SQL twin extracts the identical
    token."""
    q = derived_queries(documents, every=every, n_terms=n_terms)
    return q.select(
        "qid", F.element_at(F.split(F.col("query"), " ", -1), -1).alias("query")
    )


NEGATIVE_QUERIES_SQL = f"""
  SELECT qid, qarr[len(qarr)] AS query
  FROM (SELECT qid, string_split(query, ' ') AS qarr FROM ({QUERIES_SQL}))
"""


def derived_query_strings(
    documents: DataFrame, every: int = EVERY, n_terms: int = N_TERMS
) -> DataFrame:
    """The ``simple_query_string`` gate's input: the flagship 5-token
    query reshaped into the mini language — ``+t2 t1 -t5 "t3 t4"``
    (must = token 2, should = token 1, must_not = token 5, phrase
    clause = tokens 3+4, should). Queries with fewer than 5 tokens are
    dropped (both engines identically), so the clause roles are total.
    The SQL twin below builds the SAME string — but the ORACLE never
    parses it: it computes the clause semantics from the same token
    array, which is exactly what makes the parser's output checkable."""
    q = derived_queries(documents, every=every, n_terms=n_terms)
    arr = F.split(F.col("query"), " ", -1)
    qs = F.concat(
        F.lit("+"), F.element_at(arr, 2),
        F.lit(" "), F.element_at(arr, 1),
        F.lit(" -"), F.element_at(arr, 5),
        F.lit(' "'), F.element_at(arr, 3),
        F.lit(" "), F.element_at(arr, 4), F.lit('"'),
    )
    return q.filter(F.size(arr) >= 5).select("qid", qs.alias("query"))


QUERY_STRINGS_SQL = f"""
  SELECT qid,
         '+' || qarr[2] || ' ' || qarr[1] || ' -' || qarr[5]
             || ' "' || qarr[3] || ' ' || qarr[4] || '"' AS query
  FROM (SELECT qid, string_split(query, ' ') AS qarr FROM ({QUERIES_SQL}))
  WHERE len(qarr) >= 5
"""
