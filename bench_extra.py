"""Targeted bench rows for optimization iteration (guide §1.4).

Reuses the SAME fixtures bench.py builds (pages parquet under
$SPARK_GRAFT_BENCH_CACHE, indexes under /dev/shm) and times individual
rows with the SAME call shapes as bench.py, so a row here is comparable
to the official bench row. Run `python bench_extra.py --setup` once to
(re)build the /dev/shm fixtures, then `python bench_extra.py row1 row2`
to time rows. `--explain row` writes .explain("formatted") to stdout.

bench.py stays the frozen measurement harness; this file exists only so
optimization iteration does not pay the full ~25-minute bench per probe.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
N_QUERIES = int(os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "1000"))
CACHE = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/sgpt_bench")
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA_REPEATS", "2"))


class Fixtures:
    """Lazily materialized bench fixtures, same recipes as bench.py."""

    def __init__(self, spark):
        self.spark = spark
        self._cache = {}

    def _memo(self, key, fn):
        if key not in self._cache:
            self._cache[key] = fn()
        return self._cache[key]

    @property
    def docs(self):
        def build():
            from sgpt_spark.operators.indexer import assign_doc_ids_fast

            pages = self.spark.read.parquet(f"{CACHE}/pages_{N_DOCS}.parquet")
            d = assign_doc_ids_fast(pages.select("url", "text"))
            d.persist().count()
            return d

        return self._memo("docs", build)

    @property
    def qdf(self):
        def build():
            docs = self.docs
            n_docs = docs.count()
            q = (
                docs.filter(
                    (F.col("doc_id") % max(n_docs // N_QUERIES, 1) == 0)
                    & (F.length("text") > 0)
                )
                .select(
                    F.col("doc_id").cast("string").alias("qid"),
                    F.array_join(
                        F.slice(
                            F.split(F.element_at(F.split("text", "\n"), 2), " ", -1),
                            1, 5,
                        ),
                        " ",
                    ).alias("query"),
                )
                .limit(N_QUERIES)
            )
            q.persist().count()
            return q

        return self._memo("qdf", build)

    @property
    def mt_q(self):
        def build():
            q = self.qdf.limit(200)
            q.persist().count()
            return q

        return self._memo("mt_q", build)

    @property
    def block_index(self):
        def build():
            from sgpt_spark.operators.indexer import read_index, read_term_stats

            postings, meta = read_index(self.spark, "/dev/shm/sgpt_bench_index")
            tstats = read_term_stats(self.spark, "/dev/shm/sgpt_bench_index")
            return postings, meta, tstats

        return self._memo("block_index", build)

    @property
    def docvalues_index(self):
        def build():
            from sgpt_spark.operators.indexer import (
                build_postings_with_docvalues,
            )

            docs_dv = self.docs.withColumn(
                "lang",
                F.element_at(
                    F.array(*[F.lit(x) for x in ("en", "es", "de", "fr", "zh")]),
                    (F.pmod(F.xxhash64("url"), F.lit(5)) + 1).cast("int"),
                ),
            ).withColumn("n_chars", F.length("text"))
            postings_f, dv_f, meta_f = build_postings_with_docvalues(
                docs_dv, ["lang", "n_chars"],
                segment_size=max(N_DOCS // CPUS, 10_000),
            )
            postings_f.persist().count()
            dv_f.persist().count()
            tstats_f_df = postings_f.groupBy("term").agg(F.sum("df").alias("df"))
            tstats_f_df.persist().count()
            return docs_dv, postings_f, dv_f, meta_f, tstats_f_df

        return self._memo("docvalues_index", build)

    @property
    def ph_q(self):
        def build():
            docs = self.docs
            q = (
                self.qdf.join(
                    docs.select(F.col("doc_id").cast("string").alias("qid"), "text"),
                    "qid",
                )
                .select(
                    "qid",
                    F.array_join(
                        F.slice(
                            F.split(F.element_at(F.split("text", "\n"), 2), " ", -1),
                            2, 4,
                        ),
                        " ",
                    ).alias("query"),
                )
                .limit(200)
            )
            q.persist().count()
            return q

        return self._memo("ph_q", build)

    @property
    def sl_q(self):
        def build():
            q = self.ph_q.filter(
                F.size(F.array_distinct(F.split("query", " ", -1)))
                == F.size(F.split("query", " ", -1))
            )
            q.persist().count()
            return q

        return self._memo("sl_q", build)

    @property
    def pts(self):
        def build():
            from sgpt_spark.operators.indexer import read_term_stats

            return read_term_stats(self.spark, "/dev/shm/sgpt_bench_pos")

        return self._memo("pts", build)

    @property
    def mt_qs(self):
        def build():
            qs_arr = F.split(F.col("query"), " ", -1)
            q = self.mt_q.filter(F.size(qs_arr) >= 5).select(
                "qid",
                F.concat(
                    F.lit("+"), F.element_at(qs_arr, 2),
                    F.lit(" "), F.element_at(qs_arr, 1),
                    F.lit(" -"), F.element_at(qs_arr, 5),
                    F.lit(' "'), F.element_at(qs_arr, 3),
                    F.lit(" "), F.element_at(qs_arr, 4), F.lit('"'),
                ).alias("query"),
            )
            q.persist().count()
            return q

        return self._memo("mt_qs", build)

    @property
    def sp_trees(self):
        def build():
            return [
                (r["qid"], {"span_near": {"clauses": r["query"].split(" "),
                                          "slop": 4, "in_order": False}})
                for r in self.sl_q.collect()
            ]

        return self._memo("sp_trees", build)

    @property
    def spm_trees(self):
        def build():
            out = []
            for qid, tr in self.sp_trees:
                toks = tr["span_near"]["clauses"]
                if len(toks) < 2 or len(toks[0]) < 4:
                    continue
                out.append((qid, {"span_near": {
                    "clauses": [
                        {"span_multi": {"match": {"prefix": toks[0][:4]}}},
                        *toks[1:],
                    ],
                    "slop": 4, "in_order": False}}))
            return out

        return self._memo("spm_trees", build)

    @property
    def mf_docs(self):
        def build():
            d = self.docs.withColumn(
                "title", F.array_join(F.slice(F.split("text", " ", -1), 1, 4), " ")
            ).select("doc_id", "title", "text")
            return d

        return self._memo("mf_docs", build)


def _best_of(fn, n=REPEATS):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


# ---------------------------------------------------------------- rows

def row_match_aggs_200q(fx):
    from sgpt_spark.operators.aggs import (
        histogram_agg,
        match_candidates,
        terms_agg,
    )

    _, postings_f, dv_f, meta_f, _ = fx.docvalues_index

    def run():
        cand_a = match_candidates(fx.spark, postings_f, meta_f, fx.mt_q)
        terms_agg(cand_a, dv_f, "lang", size=5).count()
        histogram_agg(cand_a, dv_f, "n_chars", interval=100).count()

    return _best_of(run)


def row_match_metric_aggs_200q(fx):
    from sgpt_spark.operators.aggs import (
        cardinality_agg,
        match_candidates,
        percentiles_agg,
        range_agg,
        stats_agg,
        terms_agg,
    )

    _, postings_f, dv_f, meta_f, _ = fx.docvalues_index

    def run():
        cand_m = match_candidates(fx.spark, postings_f, meta_f, fx.mt_q)
        terms_agg(cand_m, dv_f, "lang", size=5,
                  metrics=[("avg", "n_chars"), ("max", "n_chars")]).count()
        stats_agg(cand_m, dv_f, "n_chars").count()
        range_agg(cand_m, dv_f, "n_chars",
                  [(None, 100), (100, 300), (300, None)]).count()
        cardinality_agg(cand_m, dv_f, "lang", exact=False).count()
        percentiles_agg(cand_m, dv_f, "n_chars", exact=False).count()

    return _best_of(run)


def row_pipeline_composite_aggs_200q(fx):
    from sgpt_spark.operators.aggs import (
        composite_agg,
        filters_agg,
        histogram_agg,
        match_candidates,
        terms_agg,
    )
    from sgpt_spark.operators.pipeline_aggs import (
        bucket_script,
        bucket_sort,
        cumulative_sum,
        derivative,
        moving_avg,
    )

    _, postings_f, dv_f, meta_f, _ = fx.docvalues_index

    def run():
        cand_p = match_candidates(fx.spark, postings_f, meta_f, fx.mt_q)
        hist = histogram_agg(cand_p, dv_f, "n_chars", interval=100)
        moving_avg(
            cumulative_sum(derivative(hist, "doc_count"), "doc_count"),
            "doc_count", window=3,
        ).count()
        tb = terms_agg(cand_p, dv_f, "lang", size=10,
                       metrics=[("sum", "n_chars")])
        bucket_sort(
            bucket_script(tb, "cpd", "CAST(sum_n_chars AS DOUBLE) / doc_count"),
            sort=[("cpd", "desc")], size=2, key_col="value",
        ).count()
        composite_agg(cand_p, dv_f, ["lang"], size=5).count()
        filters_agg(cand_p, dv_f,
                    {"en": "lang = 'en'", "long": "n_chars >= 300"},
                    other_bucket_key="other").count()

    return _best_of(run)


def row_match_tophits_datehist_200q(fx):
    from sgpt_spark.operators.aggs import (
        date_histogram_agg,
        match_candidates,
        top_hits_agg,
    )
    from sgpt_spark.operators.funcscore import match_scores

    _, postings_f, dv_f, meta_f, tstats_f_df = fx.docvalues_index
    dv_dates = dv_f.withColumn(
        "pub_date",
        F.date_add(F.to_date(F.lit("2024-01-01")),
                   F.pmod(F.col("n_chars"), F.lit(730)).cast("int")),
    )

    def run():
        cand_t = match_candidates(fx.spark, postings_f, meta_f, fx.mt_q)
        date_histogram_agg(cand_t, dv_dates, "pub_date", "month").count()
        scored_t = match_scores(fx.spark, postings_f, meta_f, fx.mt_q,
                                term_stats=tstats_f_df)
        top_hits_agg(scored_t, dv_f, "lang", size=3, hits=2).count()

    return _best_of(run)


def row_match_significant_terms_20q(fx):
    from sgpt_spark.operators.aggs import match_candidates, significant_terms_agg

    docs_dv, postings_f, dv_f, meta_f, tstats_f_df = fx.docvalues_index

    def run():
        cand_s = match_candidates(fx.spark, postings_f, meta_f, fx.mt_q.limit(20))
        significant_terms_agg(cand_s, docs_dv, meta_f, tstats_f_df,
                              size=10).count()

    return _best_of(run)


def row_sampled_significant_terms_200q(fx):
    from sgpt_spark.operators.aggs import sampler_candidates, significant_terms_agg
    from sgpt_spark.operators.funcscore import match_scores

    docs_dv, postings_f, dv_f, meta_f, tstats_f_df = fx.docvalues_index

    def run():
        sc_b = match_scores(fx.spark, postings_f, meta_f, fx.mt_q,
                            term_stats=tstats_f_df)
        samp_b = sampler_candidates(sc_b, shard_size=100)
        significant_terms_agg(samp_b, docs_dv, meta_f, tstats_f_df,
                              size=10).count()

    return _best_of(run)


def row_rare_multi_adjacency_aggs_200q(fx):
    from sgpt_spark.operators.aggs import match_candidates
    from sgpt_spark.operators.aggs_ext import (
        adjacency_matrix_agg,
        multi_terms_agg,
        rare_terms_agg,
    )

    _, postings_f, dv_f, meta_f, _ = fx.docvalues_index

    def run():
        cand_x = match_candidates(fx.spark, postings_f, meta_f, fx.mt_q)
        rare_terms_agg(cand_x, dv_f, "lang", max_doc_count=2).count()
        multi_terms_agg(cand_x, dv_f, ["lang", "n_chars"], size=5).count()
        adjacency_matrix_agg(
            cand_x, dv_f,
            {"en": "lang = 'en'", "es": "lang = 'es'",
             "long": "n_chars >= 200"},
        ).count()

    return _best_of(run)


def row_bm25_collapse_200q(fx):
    from sgpt_spark.operators.collapse import collapse_search
    from sgpt_spark.operators.funcscore import match_scores

    _, postings_f, dv_f, meta_f, tstats_f_df = fx.docvalues_index

    def run():
        sc_c = match_scores(fx.spark, postings_f, meta_f, fx.mt_q,
                            term_stats=tstats_f_df)
        collapse_search(sc_c, dv_f, "lang", k=10).count()

    return _best_of(run)


def row_sort_by_field_200q(fx):
    from sgpt_spark.operators.fieldsort import sort_search_index

    _, postings_f, dv_f, meta_f, _ = fx.docvalues_index

    def run():
        sort_search_index(fx.spark, postings_f, meta_f, fx.mt_q, dv_f,
                          by=[("lang", "asc"), ("n_chars", "desc")],
                          k=10).count()

    return _best_of(run)


def row_function_score_200q(fx):
    from sgpt_spark.operators.funcscore import function_score_index

    _, postings_f, dv_f, meta_f, _ = fx.docvalues_index

    def run():
        function_score_index(fx.spark, postings_f, meta_f, fx.mt_q, dv_f,
                             field="n_chars", modifier="log1p",
                             boost_mode="multiply", k=10).count()

    return _best_of(run)


def row_function_score_multi_200q(fx):
    from __spark_entry__ import _FS_MULTI_FUNCTIONS
    from sgpt_spark.operators.funcscore import function_score_multi

    _, postings_f, dv_f, meta_f, _ = fx.docvalues_index

    def run():
        function_score_multi(fx.spark, postings_f, meta_f, fx.mt_q, dv_f,
                             _FS_MULTI_FUNCTIONS, score_mode="sum",
                             boost_mode="multiply", max_boost=3.0,
                             k=10).count()

    return _best_of(run)


def row_boosting_200q(fx):
    from sgpt_spark.operators.boosting import boosting_search_index

    _, postings_f, dv_f, meta_f, _ = fx.docvalues_index
    neg_q = fx.mt_q.select(
        "qid", F.element_at(F.split("query", " ", -1), -1).alias("query")
    )

    def run():
        boosting_search_index(fx.spark, postings_f, meta_f, fx.mt_q, neg_q,
                              k=10, negative_boost=0.5).count()

    return _best_of(run)


def row_dis_max_200q(fx):
    from sgpt_spark.operators.compound import dis_max_match_index

    _, postings_f, dv_f, meta_f, tstats_f_df = fx.docvalues_index
    dm_q2 = fx.mt_q.select(
        "qid", F.element_at(F.split("query", " ", -1), 1).alias("query")
    )

    def run():
        dis_max_match_index(fx.spark, postings_f, meta_f, [fx.mt_q, dm_q2],
                            tie_breaker=0.5, k=10,
                            term_stats=tstats_f_df).count()

    return _best_of(run)


def row_terms_set_200q(fx):
    from sgpt_spark.operators.termset import terms_set_search_index

    _, postings_f, dv_f, meta_f, tstats_f_df = fx.docvalues_index
    ts_sets = fx.mt_q.select(
        "qid", F.slice(F.split("query", " ", -1), 1, 3).alias("terms")
    )

    def run():
        terms_set_search_index(fx.spark, postings_f, meta_f, ts_sets, k=10,
                               msm_min=2, term_stats=tstats_f_df).count()

    return _best_of(run)


def row_geo_distance_200q(fx):
    from sgpt_spark.operators.geo import (
        derive_geo_docvalues,
        geo_distance_search_index,
    )

    _, postings_f, dv_f, meta_f, tstats_f_df = fx.docvalues_index
    geo_dv = derive_geo_docvalues(fx.docs)

    def run():
        geo_distance_search_index(fx.spark, postings_f, meta_f, fx.mt_q, geo_dv,
                                  (0.0, 0.0), 8_000_000.0, k=10,
                                  term_stats=tstats_f_df).count()

    return _best_of(run)


def row_match_bool_prefix_200q(fx):
    from sgpt_spark.operators.boolprefix import match_bool_prefix_search_index

    _, postings_f, dv_f, meta_f, tstats_f_df = fx.docvalues_index
    mbp_arr = F.split(F.col("query"), " ", -1)
    mbp_q = fx.mt_q.select(
        "qid",
        F.trim(
            F.concat(
                F.array_join(F.slice(mbp_arr, 1, F.size(mbp_arr) - 1), " "),
                F.lit(" "),
                F.substring(F.element_at(mbp_arr, -1), 1, 8),
            )
        ).alias("query"),
    )

    def run():
        match_bool_prefix_search_index(
            fx.spark, postings_f, meta_f, mbp_q, k=10,
            term_stats=tstats_f_df, max_expansions=1024,
        ).count()

    return _best_of(run)


def row_more_like_this_200seed(fx):
    from sgpt_spark.operators.mlt import more_like_this_index

    postings, meta, _ = fx.block_index
    docs = fx.docs
    mlt_seeds = (
        docs.select((F.col("doc_id")).alias("qid"), "doc_id")
        .filter(F.pmod(F.col("doc_id"), F.lit(max(N_DOCS // 200, 1))) == 0)
        .limit(200)
    )
    mlt_seeds.persist().count()
    tstats_df = postings.groupBy("term").agg(F.sum("df").alias("df"))
    tstats_df.persist().count()

    def run():
        more_like_this_index(fx.spark, postings, meta, docs, mlt_seeds,
                             k=10, term_stats=tstats_df).count()

    return _best_of(run)


def row_span_near_200q(fx):
    from sgpt_spark.operators.spans import span_search_index

    def run():
        span_search_index(fx.spark, "/dev/shm/sgpt_bench_pos", fx.sp_trees,
                          k=10, term_stats=fx.pts).count()

    return _best_of(run)


def row_span_multi_200q(fx):
    from sgpt_spark.operators.spanmulti import span_multi_search_index

    def run():
        span_multi_search_index(fx.spark, "/dev/shm/sgpt_bench_pos",
                                fx.spm_trees, k=10, term_stats=fx.pts).count()

    return _best_of(run)


def row_simple_query_string_200q(fx):
    from sgpt_spark.operators.querystring import simple_query_string_index

    def run():
        simple_query_string_index(fx.spark, "/dev/shm/sgpt_bench_pos",
                                  fx.mt_qs, k=10, term_stats=fx.pts).count()

    return _best_of(run)


def row_simple_query_string_cogroup_200q(fx):
    from sgpt_spark.operators.querystring import simple_query_string_cogroup

    def run():
        simple_query_string_cogroup(fx.spark, "/dev/shm/sgpt_bench_pos",
                                    fx.mt_qs, k=10, term_stats=fx.pts).count()

    return _best_of(run)


def row_query_string_200q(fx):
    from sgpt_spark.operators.luceneqs import query_string_search_index

    lq_q = fx.mt_qs.filter(F.col("query").rlike('^[A-Za-z0-9+\\- "]+$'))

    def run():
        query_string_search_index(fx.spark, "/dev/shm/sgpt_bench_pos", lq_q,
                                  k=10, term_stats=fx.pts).count()

    return _best_of(run)


def row_bm25_prefix_taat_200q(fx):
    return _row_prefix(fx, "taat")


def row_bm25_prefix_join_200q(fx):
    return _row_prefix(fx, "join")


def _row_prefix(fx, strat):
    from sgpt_spark.operators.multiterm import prefix_search_index

    postings, meta, tstats = fx.block_index
    mt_prefixes = fx.mt_q.select(
        "qid",
        F.substring(F.element_at(F.split("query", " ", -1), 1), 1, 8).alias("prefix"),
    ).filter(F.length("prefix") > 0)
    mt_prefixes.persist().count()

    def run():
        prefix_search_index(fx.spark, postings, meta, mt_prefixes, k=10,
                            rewrite="scoring_boolean", term_stats=tstats,
                            max_expansions=1024, strategy=strat).count()

    return _best_of(run)


def row_bm25_fuzzy_taat_200q(fx):
    return _row_fuzzy(fx, "taat")


def row_bm25_fuzzy_join_200q(fx):
    return _row_fuzzy(fx, "join")


def _row_fuzzy(fx, strat):
    from sgpt_spark.operators.multiterm import fuzzy_search_index

    postings, meta, tstats = fx.block_index
    mt_terms = fx.mt_q.select(
        "qid", F.element_at(F.split("query", " ", -1), 1).alias("qterm")
    ).filter(F.length("qterm") > 0)
    mt_terms.persist().count()

    def run():
        fuzzy_search_index(fx.spark, postings, meta, mt_terms, k=10,
                           max_edits=1, prefix_length=4,
                           term_stats=tstats, strategy=strat).count()

    return _best_of(run)


def row_bm25_regexp_taat_200q(fx):
    from sgpt_spark.operators.multiterm import regexp_search_index

    postings, meta, tstats = fx.block_index
    mt_regex = fx.mt_q.select(
        "qid",
        F.concat(
            F.substring(F.element_at(F.split("query", " ", -1), 1), 1, 6),
            F.lit(".*"),
        ).alias("pattern"),
    )

    def run():
        regexp_search_index(fx.spark, postings, meta, mt_regex, k=10,
                            rewrite="scoring_boolean", term_stats=tstats,
                            max_expansions=1024, strategy="taat").count()

    return _best_of(run)


def row_combined_fields_200q(fx):
    from sgpt_spark.operators.crossfields import combined_fields_search

    def run():
        combined_fields_search(
            fx.mf_docs,
            fx.mt_q.select(F.col("qid").cast("long").alias("qid"), "query"),
            k=10, boosts={"title": 2.0},
        ).count()

    return _best_of(run)


def row_bm25_multifield_join_200q(fx):
    from sgpt_spark.operators.index_search import search_multifield_index_join

    def run():
        search_multifield_index_join(
            fx.spark, "/dev/shm/sgpt_bench_mf", fx.mt_q, k=10
        ).count()

    return _best_of(run)


def row_bm25_index_queries_join_200q(fx):
    from sgpt_spark.operators.index_search import search_index_join

    postings, meta, tstats = fx.block_index

    def run():
        search_index_join(fx.spark, postings, meta, fx.mt_q, k=10,
                          term_stats=tstats).count()

    return _best_of(run)


def row_bm25_bool_filtered_200q(fx):
    from sgpt_spark.operators.boolquery import bool_search_index

    _, postings_f, dv_f, meta_f, _ = fx.docvalues_index
    tstats_f = {
        r["term"]: int(r["df"])
        for r in postings_f.groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
    bq_arr = F.split(F.col("query"), " ", -1)
    mt_q = fx.mt_q
    bool_cl = (
        mt_q.select("qid", F.lit("must").alias("occur"),
                    F.array_join(F.slice(bq_arr, 1, 2), " ").alias("query"))
        .unionByName(
            mt_q.filter(F.size(bq_arr) >= 3).select(
                "qid", F.lit("should").alias("occur"),
                F.element_at(bq_arr, 3).alias("query"))
        )
        .unionByName(
            mt_q.filter(F.size(bq_arr) >= 4).select(
                "qid", F.lit("filter").alias("occur"),
                F.element_at(bq_arr, 4).alias("query"))
        )
        .unionByName(
            mt_q.filter(F.size(bq_arr) >= 5).select(
                "qid", F.lit("must_not").alias("occur"),
                F.element_at(bq_arr, 5).alias("query"))
        )
    )
    bool_cl.persist().count()
    bool_fl = (
        mt_q.select(
            "qid", F.lit("filter").alias("occur"), F.lit("lang").alias("field"),
            F.lit("term").alias("op"),
            F.element_at(
                F.array(*[F.lit(x) for x in ("en", "es", "de", "fr", "zh")]),
                (F.pmod(F.xxhash64(F.col("qid").cast("string")), F.lit(5)) + 1)
                .cast("int"),
            ).alias("value"),
        )
        .unionByName(
            mt_q.select(
                "qid", F.lit("filter").alias("occur"),
                F.lit("n_chars").alias("field"), F.lit("gte").alias("op"),
                F.lit("50").alias("value"),
            )
        )
    )
    bool_fl.persist().count()

    def run():
        bool_search_index(fx.spark, postings_f, meta_f, bool_cl, k=10,
                          term_stats=tstats_f, filters=bool_fl,
                          docvalues=dv_f).count()

    return _best_of(run)


ROWS = {
    name[len("row_"):]: fn
    for name, fn in sorted(globals().items())
    if name.startswith("row_")
}


def setup(spark):
    """Rebuild the /dev/shm fixtures the same way bench.py does."""
    from sgpt_spark.operators.indexer import build_index
    from sgpt_spark.operators.positions import build_positional_index
    from sgpt_spark.operators.indexer import build_multifield_index
    from sgpt_spark.sources.pages import generate_pages

    pages_file = f"{CACHE}/pages_{N_DOCS}.parquet"
    if not Path(pages_file).exists():
        generate_pages(spark, N_DOCS, partitions=max(CPUS * 2, 8)).write.mode(
            "overwrite"
        ).parquet(pages_file)
    fx = Fixtures(spark)
    docs = fx.docs
    build_index(docs, "/dev/shm/sgpt_bench_index",
                segment_size=max(N_DOCS // CPUS, 10_000))
    build_positional_index(docs, "/dev/shm/sgpt_bench_pos",
                           segment_size=max(N_DOCS // CPUS, 10_000))
    build_multifield_index(fx.mf_docs, "/dev/shm/sgpt_bench_mf",
                           segment_size=max(N_DOCS // CPUS, 10_000))
    print("fixtures rebuilt")


def main():
    from sgpt_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="sgpt_bench_extra",
                      shuffle_partitions=CPUS,
                      extra_conf={"spark.sql.files.maxPartitionBytes":
                                  str(8 * 1024 * 1024)})
    args = [a for a in sys.argv[1:] if a != "--setup"]
    if "--setup" in sys.argv[1:]:
        setup(spark)
    fx = Fixtures(spark)
    out = {}
    for name in args:
        if name not in ROWS:
            print(f"unknown row {name}; known: {sorted(ROWS)}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        out[name] = ROWS[name](fx)
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
