"""Bench harness — prints ONE JSON line with the headline numbers.

Measures the BASELINE.json metric locally:
- index-build throughput (docs/sec) over the deterministic synthetic
  Common-Crawl-style pages corpus (FIXTURES.md §1),
- BM25 query throughput (queries/sec, top-10) through the compressed
  index,
- BM25 top-10 rank-identity rate: compressed-index path vs the
  independent exhaustive DataFrame path on a query sample,
- timings for the driver-table headline queries.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_DOCS (default 200000),
SPARK_GRAFT_BENCH_QUERIES (default 1000).

Scaling-efficiency evidence (north_rule, N vs 4N executors) is produced
by tools/scaling_bench.py, which runs this same workload at local[8] and
local[32] and writes BENCH/BASELINE.md.
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

from sgpt_spark.operators.index_search import search_index  # noqa: E402
from sgpt_spark.operators.indexer import (  # noqa: E402
    assign_doc_ids_fast,
    build_index,
    read_index,
)
from sgpt_spark.operators.search import bm25_search  # noqa: E402
from sgpt_spark.session import get_spark  # noqa: E402
from sgpt_spark.sources.pages import generate_pages  # noqa: E402
from sgpt_spark.sources.queryset import derived_queries  # noqa: E402
from sgpt_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
N_QUERIES = int(os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "1000"))
CACHE = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/sgpt_bench")


def pages_path(spark) -> str:
    """Materialize the pages fixture once (generation cost is fixture
    cost, not index-build cost)."""
    path = f"{CACHE}/pages_{N_DOCS}.parquet"
    if not Path(path).exists():
        generate_pages(spark, N_DOCS, partitions=max(CPUS * 2, 8)).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def main() -> None:
    # small maxPartitionBytes => one scan partition (= index segment) per
    # core even at bench corpus sizes; the natural regime on a real
    # cluster where the corpus is far larger than cores x 128MB
    spark = get_spark(master=f"local[{CPUS}]", app_name="sgpt_bench",
                      shuffle_partitions=CPUS,
                      extra_conf={"spark.sql.files.maxPartitionBytes":
                                  str(8 * 1024 * 1024)})
    timings: dict[str, float] = {}

    src = pages_path(spark)
    pages = spark.read.parquet(src)

    # Warm-up: spawn python workers / JIT the hot paths on a small slice
    # so the timed section measures engine throughput, not JVM+worker
    # cold start (which a long-running cluster pays once).
    warm = assign_doc_ids_fast(
        pages.filter(F.xxhash64("url") % 10 == 0).select("url", "text")
    )
    build_index(warm, f"{CACHE}/warmup_index", segment_size=5000)

    # --- index build throughput -----------------------------------------
    # snapshot-deterministic ids (no corpus shuffle) + single-pass build
    # (corpus read once, stats from sentinel rows). Best of 2 timed runs:
    # this shared VM's host scheduler injects +-40% wall-clock noise, and
    # the minimum of repeated warmed runs is the standard way to measure
    # the engine rather than the neighbor.
    docs = assign_doc_ids_fast(pages.select("url", "text"))
    meta = None
    build_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        # tmpfs target: measure the engine, not single-VM disk contention
        meta = build_index(docs, "/dev/shm/sgpt_bench_index",
                           segment_size=max(N_DOCS // CPUS, 10_000))
        build_s = min(build_s, time.time() - t0)
    timings["index_build"] = round(build_s, 3)
    docs_per_sec = meta.n_docs / build_s

    # --- standard-analyzer build (the ES-parity analysis chain) ----------
    from sgpt_spark.functions.analyzer import analyze_py

    std_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        build_index(docs, "/dev/shm/sgpt_bench_index_std",
                    segment_size=max(N_DOCS // CPUS, 10_000),
                    py_tokenizer=analyze_py)
        std_s = min(std_s, time.time() - t0)
    timings["index_build_standard"] = round(std_s, 3)
    std_docs_per_sec = meta.n_docs / std_s

    # --- query throughput through the compressed index ------------------
    from sgpt_spark.operators.indexer import read_term_stats

    postings, _ = read_index(spark, "/dev/shm/sgpt_bench_index")
    tstats = read_term_stats(spark, "/dev/shm/sgpt_bench_index")
    docs.persist()
    qdf = (
        docs.filter((F.col("doc_id") % max(meta.n_docs // N_QUERIES, 1) == 0)
                    & (F.length("text") > 0))
        .select(
            F.col("doc_id").cast("string").alias("qid"),
            F.array_join(
                F.slice(F.split(F.element_at(F.split("text", "\n"), 2), " ", -1), 1, 5),
                " ",
            ).alias("query"),
        )
        .limit(N_QUERIES)
    )
    qdf.persist()
    n_q = qdf.count()
    query_s = float("inf")
    n_hits = 0
    for _ in range(2):  # best-of-2, same noise rationale as the build
        t0 = time.time()
        run = search_index(spark, postings, meta, qdf, k=10, term_stats=tstats)
        n_hits = run.count()
        query_s = min(query_s, time.time() - t0)
    timings["bm25_index_queries"] = round(query_s, 3)
    qps = n_q / query_s if query_s else 0.0

    # join-based path (no driver collect — the millions-of-queries
    # scale-out shape; per-query it is relational and ~10x slower than
    # the vectorized TAAT scan, measured on a 200-query subsample)
    from sgpt_spark.operators.index_search import search_index_join

    sub = qdf.limit(200)
    join_s = float("inf")
    for _ in range(2):  # best-of-2, same noise rationale
        t0 = time.time()
        search_index_join(spark, postings, meta, sub, k=10, term_stats=tstats).count()
        join_s = min(join_s, time.time() - t0)
    timings["bm25_index_queries_join_200q"] = round(join_s, 3)

    # cogroup path: in-plan queries + collect-path numpy scoring — the
    # preferred scale-out shape (round 5); measured at parity with the
    # broadcast path and ~6x under the relational join
    from sgpt_spark.operators.index_search import search_index_cogroup

    cg_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        search_index_cogroup(spark, postings, meta, sub, k=10, term_stats=tstats).count()
        cg_s = min(cg_s, time.time() - t0)
    timings["bm25_index_queries_cogroup_200q"] = round(cg_s, 3)

    # --- retrieval-depth evidence: TAAT vs block-max WAND at k=1000 ------
    # The reference retrieves at depth 1000 (beir_dense_retriever.py:442
    # k_values up to 1000); pruning only pays when the heap threshold
    # can rise above block maxima, so the k=10 headline says nothing
    # about deep-k. Measure both strategies at the real depth on a
    # 100-query sample (best-of-2 each).
    deep = qdf.limit(100)
    for strat in ("taat", "wand"):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            search_index(spark, postings, meta, deep, k=1000,
                         term_stats=tstats, strategy=strat).count()
            best = min(best, time.time() - t0)
        timings[f"bm25_index_{strat}_k1000_100q"] = round(best, 3)

    # interactive point (few queries, shallow k) — where block skipping
    # can win because the top-10 threshold rises fast
    tiny = qdf.limit(10)
    for strat in ("taat", "wand"):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            search_index(spark, postings, meta, tiny, k=10,
                         term_stats=tstats, strategy=strat).count()
            best = min(best, time.time() - t0)
        timings[f"bm25_index_{strat}_k10_10q"] = round(best, 3)

    # --- multi-field BM25 through the co-segmented per-field indexes -----
    # (ES multi_match best_fields — the query shape the reference ran).
    # Title derived from the first text line, same recipe as the gate.
    from sgpt_spark.operators.index_search import search_multifield_index
    from sgpt_spark.operators.indexer import build_multifield_index

    mf_docs = docs.withColumn(
        "title", F.array_join(F.slice(F.split("text", " ", -1), 1, 4), " ")
    ).select("doc_id", "title", "text")
    mf_build = float("inf")
    for _ in range(2):
        t0 = time.time()
        build_multifield_index(mf_docs, "/dev/shm/sgpt_bench_mf",
                               segment_size=max(N_DOCS // CPUS, 10_000))
        mf_build = min(mf_build, time.time() - t0)
    timings["multifield_index_build"] = round(mf_build, 3)
    mf_q = qdf.limit(200)
    mf_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        search_multifield_index(spark, "/dev/shm/sgpt_bench_mf", mf_q, k=10).count()
        mf_s = min(mf_s, time.time() - t0)
    timings["bm25_multifield_index_200q"] = round(mf_s, 3)

    # cross_fields (term-centric blended-df multi_match) off the SAME
    # per-field indexes — the delta vs bm25_multifield_index_200q is the
    # per-term cross-field combine vs the per-field dis-max
    from sgpt_spark.operators.crossfields import search_crossfields_index

    cf_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        search_crossfields_index(
            spark, "/dev/shm/sgpt_bench_mf", mf_q, k=10
        ).count()
        cf_s = min(cf_s, time.time() - t0)
    timings["bm25_crossfields_index_200q"] = round(cf_s, 3)

    # combined_fields (ES 7.13+ merged-field BM25) — exhaustive by
    # contract (the norms note in crossfields.py): one corpus scan,
    # same shuffle count as the exhaustive best_fields operator
    from sgpt_spark.operators.crossfields import combined_fields_search

    cbf_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        combined_fields_search(
            mf_docs, mf_q.select(F.col("qid").cast("long").alias("qid"), "query"),
            k=10, boosts={"title": 2.0},
        ).count()
        cbf_s = min(cbf_s, time.time() - t0)
    timings["combined_fields_200q"] = round(cbf_s, 3)

    # join-based multifield twin (queries stay in the plan — the
    # millions-of-queries shape) + the deep-k multifield point at the
    # reference's retrieval depth
    from sgpt_spark.operators.index_search import search_multifield_index_join

    mfj_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        search_multifield_index_join(spark, "/dev/shm/sgpt_bench_mf", mf_q, k=10).count()
        mfj_s = min(mfj_s, time.time() - t0)
    timings["bm25_multifield_join_200q"] = round(mfj_s, 3)

    from sgpt_spark.operators.index_search import search_multifield_index_cogroup

    mfc_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        search_multifield_index_cogroup(
            spark, "/dev/shm/sgpt_bench_mf", mf_q, k=10
        ).count()
        mfc_s = min(mfc_s, time.time() - t0)
    timings["bm25_multifield_cogroup_200q"] = round(mfc_s, 3)
    mf_deep = qdf.limit(100)
    mfd_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        search_multifield_index(spark, "/dev/shm/sgpt_bench_mf", mf_deep, k=1000).count()
        mfd_s = min(mfd_s, time.time() - t0)
    timings["bm25_multifield_index_k1000_100q"] = round(mfd_s, 3)

    # --- WAND crossover point: ONE query, k=10, ONE deep segment ---------
    # BENCH_r03 showed TAAT winning every batch shape; WAND's claimed
    # regime is few queries x deep postings where the top-10 threshold
    # rises fast enough to skip blocks. Merge the whole bench index into
    # a single segment (streaming compaction) and measure the
    # single-(query,segment) task wall for each strategy.
    import shutil

    from sgpt_spark.operators.indexer import compact_index

    shutil.rmtree("/dev/shm/sgpt_bench_1seg", ignore_errors=True)
    shutil.copytree("/dev/shm/sgpt_bench_index", "/dev/shm/sgpt_bench_1seg")
    t0 = time.time()
    compact_index(spark, "/dev/shm/sgpt_bench_1seg", 1)
    timings["compact_to_1seg"] = round(time.time() - t0, 3)
    postings1, meta1 = read_index(spark, "/dev/shm/sgpt_bench_1seg")
    tstats1 = read_term_stats(spark, "/dev/shm/sgpt_bench_1seg")
    one_q = qdf.limit(1)
    for strat in ("taat", "wand", "exhaustive"):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            search_index(spark, postings1, meta1, one_q, k=10,
                         term_stats=tstats1, strategy=strat).count()
            best = min(best, time.time() - t0)
        timings[f"wand_crossover_{strat}_1q_k10_1seg"] = round(best, 3)

    # the UB-SKEW shape (one rare + two head terms) — the measured
    # regime where block-max pruning actually wins (the rare term's idf
    # dwarfs the head terms' upper bounds, so their posting lists are
    # skipped after the threshold rises; BENCH/WAND_CROSSOVER.md)
    ts_rows = tstats1.orderBy(F.col("df").desc()).limit(2).collect()
    rare = (
        tstats1.filter((F.col("df") > 100) & (F.col("df") < 600))
        .orderBy("term").limit(1).collect()
    )
    if rare:
        skew_q = [(0, f"{rare[0]['term']} {ts_rows[0]['term']} {ts_rows[1]['term']}")]
        for strat in ("taat", "wand"):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                search_index(spark, postings1, meta1, skew_q, k=10,
                             term_stats=tstats1, strategy=strat).count()
                best = min(best, time.time() - t0)
            timings[f"wand_ubskew_{strat}_1q_k10_1seg"] = round(best, 3)

    # also a mid-size compaction on the real Zipf corpus (head terms
    # merge across every segment — the term-keyed stage skew evidence;
    # see tests/test_skew.py for the bounded-peak adversarial check)
    shutil.rmtree("/dev/shm/sgpt_bench_c8", ignore_errors=True)
    shutil.copytree("/dev/shm/sgpt_bench_index", "/dev/shm/sgpt_bench_c8")
    t0 = time.time()
    compact_index(spark, "/dev/shm/sgpt_bench_c8", 8)
    timings["compact_to_8seg"] = round(time.time() - t0, 3)

    # --- codec table: varint vs PForDelta (north_star names both) --------
    # Same 10%-slice corpus under each codec: build wall, raw codec
    # bytes/posting (octet_length over the block buffers — parquet's own
    # compression excluded), and a 200-query search through each.
    codec_bytes = {}
    for codec in ("varint", "pfor"):
        cpath = f"/dev/shm/sgpt_codec_{codec}"
        t0 = time.time()
        cmeta = build_index(warm, cpath, segment_size=5000, codec=codec)
        timings[f"codec_{codec}_build_{cmeta.n_docs // 1000}k"] = round(
            time.time() - t0, 3
        )
        cpost, _ = read_index(spark, cpath)
        row = (
            cpost.select(F.explode("blocks").alias("blk"))
            .agg(
                F.sum(
                    F.octet_length("blk.doc_deltas")
                    + F.octet_length("blk.tfs")
                    + F.octet_length("blk.dls")
                ).alias("bytes"),
                F.sum("blk.count").alias("n"),
            )
            .collect()[0]
        )
        codec_bytes[codec] = round(int(row["bytes"]) / max(int(row["n"]), 1), 3)
        cts = read_term_stats(spark, cpath)
        cmeta_r = read_index(spark, cpath)[1]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            search_index(spark, cpost, cmeta_r, qdf.limit(200), k=10,
                         term_stats=cts).count()
            best = min(best, time.time() - t0)
        timings[f"codec_{codec}_200q"] = round(best, 3)

    # --- multi-term queries (Lucene MultiTermQuery family) ---------------
    # prefix: 8-char prefixes of the query's first token expand to ~100
    # dictionary terms each (scoring_boolean rewrite — every expanded
    # term scored with its own idf). fuzzy: Levenshtein<=1 with
    # prefix_length=4 (the ES-recommended prune at scale — candidates
    # are the shared-prefix + length-band dictionary slice, so the
    # distance filter runs over ~10k vocab terms, not the 200k
    # doc-token tail).
    from sgpt_spark.operators.multiterm import (
        fuzzy_search_index,
        prefix_search_index,
    )

    mt_q = qdf.limit(200)
    mt_prefixes = mt_q.select(
        "qid",
        F.substring(F.element_at(F.split("query", " ", -1), 1), 1, 8).alias("prefix"),
    ).filter(F.length("prefix") > 0)
    mt_prefixes.persist().count()
    # taat = collected bounded expansion + the search_index TAAT kernels
    # (interactive path); join = fully in-plan relational scoring (the
    # unbounded-query-set contract). Same max_expansions both rows.
    for strat in ("taat", "join"):
        pfx_s = float("inf")
        for _ in range(2):
            t0 = time.time()
            prefix_search_index(spark, postings, meta, mt_prefixes, k=10,
                                rewrite="scoring_boolean", term_stats=tstats,
                                max_expansions=1024, strategy=strat).count()
            pfx_s = min(pfx_s, time.time() - t0)
        timings[f"bm25_prefix_{strat}_200q"] = round(pfx_s, 3)
    mt_terms = mt_q.select(
        "qid", F.element_at(F.split("query", " ", -1), 1).alias("qterm")
    ).filter(F.length("qterm") > 0)
    mt_terms.persist().count()
    for strat in ("taat", "join"):
        fz_s = float("inf")
        for _ in range(2):
            t0 = time.time()
            fuzzy_search_index(spark, postings, meta, mt_terms, k=10,
                               max_edits=1, prefix_length=4,
                               term_stats=tstats, strategy=strat).count()
            fz_s = min(fz_s, time.time() - t0)
        timings[f"bm25_fuzzy_{strat}_200q"] = round(fz_s, 3)

    # regexp (the last MultiTermQuery member): each query's first token
    # as "tok.*" — prefix-pruned dictionary expansion + anchored RLIKE
    from sgpt_spark.operators.multiterm import regexp_search_index

    mt_regex = mt_terms.select(
        "qid", F.concat(F.substring("qterm", 1, 6), F.lit(".*")).alias("pattern")
    )
    rx_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        regexp_search_index(spark, postings, meta, mt_regex, k=10,
                            rewrite="scoring_boolean", term_stats=tstats,
                            max_expansions=1024, strategy="taat").count()
        rx_s = min(rx_s, time.time() - t0)
    timings["bm25_regexp_taat_200q"] = round(rx_s, 3)

    # ES bool compound query (must/should/must_not/filter) in ONE
    # bitmap-TAAT pass over the same match index: per base query, must =
    # tokens 1-2, should = token 3, filter = token 4, must_not = token 5
    from sgpt_spark.operators.boolquery import bool_search_index

    bq_arr = F.split(F.col("query"), " ", -1)
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
    bool_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        bool_search_index(spark, postings, meta, bool_cl, k=10,
                          term_stats=tstats).count()
        bool_s = min(bool_s, time.time() - t0)
    timings["bm25_bool_200q"] = round(bool_s, 3)

    # in-plan twin: clause compilation in whole-stage codegen + cogroup
    from sgpt_spark.operators.boolquery import bool_search_index_cogroup

    boolc_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        bool_search_index_cogroup(spark, postings, meta, bool_cl, k=10,
                                  term_stats=tstats).count()
        boolc_s = min(boolc_s, time.time() - t0)
    timings["bm25_bool_cogroup_200q"] = round(boolc_s, 3)

    # structured filter clauses (ES filter context over doc values):
    # the sidecar build measures the localCheckpoint-staging premium vs
    # the plain single-pass build; the query row adds a lang-term +
    # n_chars-range filter pair to every bool query (one docvalues scan
    # + segment cogroup on top of the same bitmap-TAAT decode)
    from sgpt_spark.operators.indexer import build_postings_with_docvalues

    docs_dv = docs.withColumn(
        "lang",
        F.element_at(
            F.array(*[F.lit(x) for x in ("en", "es", "de", "fr", "zh")]),
            (F.pmod(F.xxhash64("url"), F.lit(5)) + 1).cast("int"),
        ),
    ).withColumn("n_chars", F.length("text"))
    t0 = time.time()
    postings_f, dv_f, meta_f = build_postings_with_docvalues(
        docs_dv, ["lang", "n_chars"],
        segment_size=max(N_DOCS // CPUS, 10_000),
    )
    postings_f.persist().count()
    dv_f.persist().count()
    timings["docvalues_index_build"] = round(time.time() - t0, 3)
    tstats_f = {
        r["term"]: int(r["df"])
        for r in postings_f.groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
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
    boolf_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        bool_search_index(spark, postings_f, meta_f, bool_cl, k=10,
                          term_stats=tstats_f, filters=bool_fl,
                          docvalues=dv_f).count()
        boolf_s = min(boolf_s, time.time() - t0)
    timings["bm25_bool_filtered_200q"] = round(boolf_s, 3)

    # ES aggregations over the 200-query match set (terms + histogram,
    # fully declarative off the same index + sidecar)
    from sgpt_spark.operators.aggs import (
        histogram_agg,
        match_candidates,
        terms_agg,
    )

    agg_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        cand_a = match_candidates(spark, postings_f, meta_f, mt_q)
        terms_agg(cand_a, dv_f, "lang", size=5).count()
        histogram_agg(cand_a, dv_f, "n_chars", interval=100).count()
        agg_s = min(agg_s, time.time() - t0)
    timings["match_aggs_200q"] = round(agg_s, 3)

    # metric sub-agg family over the same match set (stats + range +
    # cardinality ride one candidates relation; the terms agg carries
    # avg/max sub-aggs like an ES aggs body with nested metrics)
    from sgpt_spark.operators.aggs import (
        cardinality_agg,
        percentiles_agg,
        range_agg,
        stats_agg,
    )

    magg_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        cand_m = match_candidates(spark, postings_f, meta_f, mt_q)
        terms_agg(cand_m, dv_f, "lang", size=5,
                  metrics=[("avg", "n_chars"), ("max", "n_chars")]).count()
        stats_agg(cand_m, dv_f, "n_chars").count()
        range_agg(cand_m, dv_f, "n_chars",
                  [(None, 100), (100, 300), (300, None)]).count()
        cardinality_agg(cand_m, dv_f, "lang", exact=False).count()
        percentiles_agg(cand_m, dv_f, "n_chars", exact=False).count()
        magg_s = min(magg_s, time.time() - t0)
    timings["match_metric_aggs_200q"] = round(magg_s, 3)

    # pipeline + composite aggs over the same match set: histogram ->
    # cumulative_sum + derivative + moving avg (window functions over
    # the bucket relation — no second match-set scan), bucket_script +
    # bucket_sort over the terms parent, one composite page, and the
    # filters agg's one-scan named buckets
    from sgpt_spark.operators.aggs import composite_agg, filters_agg
    from sgpt_spark.operators.pipeline_aggs import (
        bucket_script,
        bucket_sort,
        cumulative_sum,
        derivative,
        moving_avg,
    )

    pipe_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        cand_p = match_candidates(spark, postings_f, meta_f, mt_q)
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
        pipe_s = min(pipe_s, time.time() - t0)
    timings["pipeline_composite_aggs_200q"] = round(pipe_s, 3)

    # top_hits (per-bucket best-scoring docs off the full scored match
    # set) + date_histogram (calendar month buckets over a derived
    # pub_date doc-value, empty-bucket fill)
    from sgpt_spark.operators.aggs import date_histogram_agg, top_hits_agg
    from sgpt_spark.operators.funcscore import match_scores

    dv_dates = dv_f.withColumn(
        "pub_date",
        F.date_add(F.to_date(F.lit("2024-01-01")),
                   F.pmod(F.col("n_chars"), F.lit(730)).cast("int")),
    )
    tstats_f_df = postings_f.groupBy("term").agg(F.sum("df").alias("df"))
    th_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        cand_t = match_candidates(spark, postings_f, meta_f, mt_q)
        date_histogram_agg(cand_t, dv_dates, "pub_date", "month").count()
        scored_t = match_scores(spark, postings_f, meta_f, mt_q,
                                term_stats=tstats_f_df)
        top_hits_agg(scored_t, dv_f, "lang", size=3, hits=2).count()
        th_s = min(th_s, time.time() - t0)
    timings["match_tophits_datehist_200q"] = round(th_s, 3)

    # significant_terms: JLH-scored unusually-frequent terms per match
    # set — the heavy agg (the foreground join is |match set| x |terms
    # per matched doc|, the same cost ES pays iterating its hit bitset;
    # ES treats it as a per-search interactive agg and recommends
    # sampler composition for batches, so this row runs a 20-query
    # batch, not the 200-query match batch the cheap doc-values aggs
    # take)
    from sgpt_spark.operators.aggs import significant_terms_agg

    sig_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        cand_s = match_candidates(spark, postings_f, meta_f, mt_q.limit(20))
        significant_terms_agg(cand_s, docs_dv, meta_f, tstats_f_df,
                              size=10).count()
        sig_s = min(sig_s, time.time() - t0)
    timings["match_significant_terms_20q"] = round(sig_s, 3)

    # sampler -> significant_terms takes the FULL 200-query batch: the
    # foreground is shard_size docs per query instead of the match set
    # (the ES-recommended composition for this agg)
    from sgpt_spark.operators.aggs import sampler_candidates
    from sgpt_spark.operators.funcscore import match_scores as _ms_bench

    ssig_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        sc_b = _ms_bench(spark, postings_f, meta_f, mt_q,
                         term_stats=tstats_f_df)
        samp_b = sampler_candidates(sc_b, shard_size=100)
        significant_terms_agg(samp_b, docs_dv, meta_f, tstats_f_df,
                              size=10).count()
        ssig_s = min(ssig_s, time.time() - t0)
    timings["sampled_significant_terms_200q"] = round(ssig_s, 3)

    # field collapsing: one best hit per (query, lang) over the full
    # scored match set, then the collapsed page
    from sgpt_spark.operators.collapse import collapse_search

    col_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        sc_c = _ms_bench(spark, postings_f, meta_f, mt_q,
                         term_stats=tstats_f_df)
        collapse_search(sc_c, dv_f, "lang", k=10).count()
        col_s = min(col_s, time.time() - t0)
    timings["bm25_collapse_200q"] = round(col_s, 3)

    # ES sort-by-field (match set ordered by doc values, not BM25) and
    # function_score field_value_factor (BM25 x log1p(n_chars)) — both
    # one docvalues join on top of the shared match/score plans
    from sgpt_spark.operators.fieldsort import sort_search_index
    from sgpt_spark.operators.funcscore import function_score_index

    srt_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        sort_search_index(spark, postings_f, meta_f, mt_q, dv_f,
                          by=[("lang", "asc"), ("n_chars", "desc")],
                          k=10).count()
        srt_s = min(srt_s, time.time() - t0)
    timings["sort_by_field_200q"] = round(srt_s, 3)

    fsc_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        function_score_index(spark, postings_f, meta_f, mt_q, dv_f,
                             field="n_chars", modifier="log1p",
                             boost_mode="multiply", k=10).count()
        fsc_s = min(fsc_s, time.time() - t0)
    timings["function_score_200q"] = round(fsc_s, 3)

    # the FULL function_score request (gauss decay + filtered weighted
    # fvf + md5 random_score, score_mode=sum, max_boost) — the delta vs
    # function_score_200q IS the multi-function combine cost (three
    # more codegen projections on the same docvalues join)
    from __spark_entry__ import _FS_MULTI_FUNCTIONS
    from sgpt_spark.operators.funcscore import function_score_multi

    fsm_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        function_score_multi(spark, postings_f, meta_f, mt_q, dv_f,
                             _FS_MULTI_FUNCTIONS, score_mode="sum",
                             boost_mode="multiply", max_boost=3.0,
                             k=10).count()
        fsm_s = min(fsm_s, time.time() - t0)
    timings["function_score_multi_200q"] = round(fsm_s, 3)

    # ES boosting query: positive = the 200-query match batch's FULL
    # scored set, negative = each query's last token, one demote join
    from sgpt_spark.operators.boosting import boosting_search_index

    neg_q = mt_q.select(
        "qid", F.element_at(F.split("query", " ", -1), -1).alias("query")
    )
    bst_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        boosting_search_index(spark, postings_f, meta_f, mt_q, neg_q,
                              k=10, negative_boost=0.5).count()
        bst_s = min(bst_s, time.time() - t0)
    timings["boosting_200q"] = round(bst_s, 3)

    # ES dis_max: two match clauses per query (the 200-query batch +
    # its first-token reformulation) — ONE composite-uid match_scores
    # call scores both clauses, one groupBy combine
    from sgpt_spark.operators.compound import dis_max_match_index

    dm_q2 = mt_q.select(
        "qid", F.element_at(F.split("query", " ", -1), 1).alias("query")
    )
    dm_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        dis_max_match_index(spark, postings_f, meta_f, [mt_q, dm_q2],
                            tie_breaker=0.5, k=10,
                            term_stats=tstats_f_df).count()
        dm_s = min(dm_s, time.time() - t0)
    timings["dis_max_200q"] = round(dm_s, 3)

    # ES geo_distance filter on the same 200-query match batch: the
    # md5-derived geo sidecar (pure codegen), one doc_id-keyed semi
    # join, haversine entirely in whole-stage codegen — the row prices
    # the geo filter against the plain match page
    from sgpt_spark.operators.geo import (
        derive_geo_docvalues,
        geo_distance_search_index,
    )

    geo_dv = derive_geo_docvalues(docs)
    geo_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        geo_distance_search_index(spark, postings_f, meta_f, mt_q, geo_dv,
                                  (0.0, 0.0), 8_000_000.0, k=10,
                                  term_stats=tstats_f_df).count()
        geo_s = min(geo_s, time.time() - t0)
    timings["geo_distance_200q"] = round(geo_s, 3)

    # ES terms_set: each query's first 3 tokens as an exact term set,
    # minimum = min(2, num_terms) (the min-script idiom) — matched-count
    # + BM25-sum fold in one groupBy over the vocabulary-pruned decode
    from sgpt_spark.operators.termset import terms_set_search_index

    ts_sets = mt_q.select(
        "qid", F.slice(F.split("query", " ", -1), 1, 3).alias("terms")
    )
    ts_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        terms_set_search_index(spark, postings_f, meta_f, ts_sets, k=10,
                               msm_min=2, term_stats=tstats_f_df).count()
        ts_s = min(ts_s, time.time() - t0)
    timings["terms_set_200q"] = round(ts_s, 3)

    # ES match_bool_prefix: the query with its last token cut to 8 chars
    # — BM25 term clauses + ONE expanded constant-score prefix clause,
    # single pruned postings decode. 8 chars matches the bm25_prefix
    # rows' convention: on this synthetic termNNNNNN vocabulary a
    # shorter cut degenerates to "term" = the ENTIRE dictionary (a
    # worst case, not a type-ahead shape; max_expansions would bound
    # the scoring but the expansion join still touches every term)
    from sgpt_spark.operators.boolprefix import match_bool_prefix_search_index

    mbp_arr = F.split(F.col("query"), " ", -1)
    mbp_q = mt_q.select(
        "qid",
        F.trim(
            F.concat(
                F.array_join(
                    F.slice(mbp_arr, 1, F.size(mbp_arr) - 1), " "
                ),
                F.lit(" "),
                F.substring(F.element_at(mbp_arr, -1), 1, 8),
            )
        ).alias("query"),
    )
    mbp_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        match_bool_prefix_search_index(
            spark, postings_f, meta_f, mbp_q, k=10,
            term_stats=tstats_f_df, max_expansions=1024,
        ).count()
        mbp_s = min(mbp_s, time.time() - t0)
    timings["match_bool_prefix_200q"] = round(mbp_s, 3)

    # rare_terms / multi_terms / adjacency_matrix over the same match
    # set + sidecar (one candidates derivation, three agg plans)
    from sgpt_spark.operators.aggs_ext import (
        adjacency_matrix_agg,
        multi_terms_agg,
        rare_terms_agg,
    )

    ax_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        cand_x = match_candidates(spark, postings_f, meta_f, mt_q)
        rare_terms_agg(cand_x, dv_f, "lang", max_doc_count=2).count()
        multi_terms_agg(cand_x, dv_f, ["lang", "n_chars"], size=5).count()
        adjacency_matrix_agg(
            cand_x, dv_f,
            {"en": "lang = 'en'", "es": "lang = 'es'",
             "long": "n_chars >= 200"},
        ).count()
        ax_s = min(ax_s, time.time() - t0)
    timings["rare_multi_adjacency_aggs_200q"] = round(ax_s, 3)
    postings_f.unpersist()
    dv_f.unpersist()

    # ES more_like_this: 200 seed docs -> top-25 tf*idf interesting
    # terms each (one corpus-tokenize pass pruned to the seed docs) ->
    # a ~25-term BM25 should-query with minimum_should_match 30%
    from sgpt_spark.operators.mlt import more_like_this_index

    mlt_seeds = (
        docs.select((F.col("doc_id")).alias("qid"), "doc_id")
        .filter(F.pmod(F.col("doc_id"), F.lit(max(N_DOCS // 200, 1))) == 0)
        .limit(200)
    )
    mlt_seeds.persist().count()
    tstats_df = postings.groupBy("term").agg(F.sum("df").alias("df"))
    tstats_df.persist().count()
    mlt_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        more_like_this_index(spark, postings, meta, docs, mlt_seeds,
                             k=10, term_stats=tstats_df).count()
        mlt_s = min(mlt_s, time.time() - t0)
    timings["more_like_this_200seed"] = round(mlt_s, 3)
    mlt_seeds.unpersist()

    # ES term suggester: 1k misspelled tokens (last char dropped from
    # dictionary terms) corrected against the full index vocabulary —
    # length-band + shared-prefix equi-join, JVM levenshtein
    from sgpt_spark.operators.suggest import term_suggest

    sug_toks = (
        tstats_df.filter(F.length("term") >= 6)
        .orderBy(F.col("df").desc(), F.col("term"))
        .limit(1000)
        .select(F.expr("substring(term, 1, length(term) - 1)").alias("token"))
    )
    sug_toks.persist().count()
    sug_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        term_suggest(tstats_df, sug_toks, size=3).count()
        sug_s = min(sug_s, time.time() - t0)
    timings["term_suggest_1k"] = round(sug_s, 3)
    sug_toks.unpersist()

    # ES phrase suggester: 200 one-misspelling phrases corrected by the
    # bigram Stupid-Backoff LM; the LM-count build (unigram + adjacent-
    # bigram groupBys over the corpus) is timed separately from the
    # per-batch suggest
    from sgpt_spark.operators.suggest import lm_counts, phrase_suggest

    t0 = time.time()
    uni_lm, big_lm, tot_lm, v_lm = lm_counts(docs)
    uni_lm.persist().count()
    big_lm.persist().count()
    timings["lm_counts_build"] = round(time.time() - t0, 3)
    mis_q = mt_q.select(
        "qid",
        F.array_join(
            F.transform(
                F.split("query", " ", -1),
                lambda t, i: F.when(
                    (i == 0) & (F.length(t) >= 5),
                    t.substr(F.lit(1), F.length(t) - 1),
                ).otherwise(t),
            ),
            " ",
        ).alias("query"),
    )
    mis_q.persist().count()
    ps_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        phrase_suggest(tstats_df, uni_lm, big_lm, tot_lm, v_lm, mis_q,
                       size=3).count()
        ps_s = min(ps_s, time.time() - t0)
    timings["phrase_suggest_200q"] = round(ps_s, 3)
    mis_q.unpersist()
    uni_lm.unpersist()
    big_lm.unpersist()
    tstats_df.unpersist()

    # ES completion suggester: weighted prefix autocomplete over
    # suggestion inputs derived from the corpus, 1k typed prefixes —
    # per-length hash joins + one weight-ordered window
    from sgpt_spark.operators.complete import complete, completion_inputs

    comp_sugg = completion_inputs(docs)
    comp_sugg.persist().count()
    comp_prefixes = (
        comp_sugg.select(F.substring("text", 1, 4).alias("prefix"))
        .filter(F.length("prefix") >= 2)
        .distinct()
        .limit(1000)
        .select(F.monotonically_increasing_id().alias("qid"), "prefix")
    )
    comp_prefixes.persist().count()
    cp_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        complete(comp_sugg, comp_prefixes, size=5,
                 skip_duplicates=True).count()
        cp_s = min(cp_s, time.time() - t0)
    timings["completion_suggest_1k"] = round(cp_s, 3)
    comp_sugg.unpersist()
    comp_prefixes.unpersist()

    # hybrid RRF: the ws-analyzer and standard-analyzer BM25 runs (two
    # analysis chains over the same corpus — the ES multi-analyzer
    # fusion practice) fused in rank space at depth 100 -> top-10. The
    # fusion itself is one query-bounded groupBy on top of the two
    # retrievals (operators/fusion.py).
    from sgpt_spark.operators.fusion import rrf_fusion

    postings_std, meta_std = read_index(spark, "/dev/shm/sgpt_bench_index_std")
    tstats_std = read_term_stats(spark, "/dev/shm/sgpt_bench_index_std")
    rrf_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        run_ws = search_index(spark, postings, meta, mt_q, k=100,
                              term_stats=tstats)
        run_std = search_index(spark, postings_std, meta_std, mt_q, k=100,
                               term_stats=tstats_std, tokenize=analyze_py)
        rrf_fusion([run_ws, run_std], k=10).count()
        rrf_s = min(rrf_s, time.time() - t0)
    timings["hybrid_rrf_200q"] = round(rrf_s, 3)

    # --- positional index + phrase search (ES match_phrase; Lucene .pos) --
    # Build = ONE corpus tokenize (positions written, postings DERIVED
    # from the compressed positional relation); query = term-pruned
    # positions scan + per-segment numpy start-alignment. The exhaustive
    # phrase twin re-tokenizes the corpus per batch — the gap is what
    # the persisted .pos structure buys.
    from sgpt_spark.operators.phrase import phrase_search
    from sgpt_spark.operators.positions import (
        build_positional_index,
        phrase_search_index,
        spark_read_positions,
    )

    pos_build = float("inf")
    for _ in range(2):
        t0 = time.time()
        build_positional_index(docs, "/dev/shm/sgpt_bench_pos",
                               segment_size=max(N_DOCS // CPUS, 10_000))
        pos_build = min(pos_build, time.time() - t0)
    timings["positional_index_build"] = round(pos_build, 3)
    prow = (
        spark_read_positions(spark, "/dev/shm/sgpt_bench_pos")
        .filter(F.col("term").isNotNull())
        .select(F.explode("runs").alias("r"))
        .agg(
            F.sum(
                F.octet_length("r.docs") + F.octet_length("r.tfs")
                + F.octet_length("r.dls") + F.octet_length("r.pos")
            ).alias("bytes"),
            F.sum("r.count").alias("n"),
        )
        .collect()[0]
    )
    pos_bytes_per_posting = round(int(prow["bytes"]) / max(int(prow["n"]), 1), 3)
    # phrase-shaped queries with a GUARANTEED known-item hit: interior
    # tokens 2..5 of the source doc's second line (the ws analyzer glues
    # line-boundary tokens to their neighbors, so tokens at a line edge
    # can never phrase-match)
    ph_q = (
        qdf.join(docs.select(F.col("doc_id").cast("string").alias("qid"), "text"), "qid")
        .select(
            "qid",
            F.array_join(
                F.slice(F.split(F.element_at(F.split("text", "\n"), 2), " ", -1), 2, 4),
                " ",
            ).alias("query"),
        )
        .limit(200)
    )
    ph_q.persist().count()
    pts = read_term_stats(spark, "/dev/shm/sgpt_bench_pos")
    ph_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        phrase_search_index(spark, "/dev/shm/sgpt_bench_pos", ph_q, k=10,
                            term_stats=pts).count()
        ph_s = min(ph_s, time.time() - t0)
    timings["bm25_phrase_index_200q"] = round(ph_s, 3)
    from sgpt_spark.operators.positions import phrase_search_index_cogroup

    phc_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        phrase_search_index_cogroup(spark, "/dev/shm/sgpt_bench_pos", ph_q, k=10,
                                    term_stats=pts).count()
        phc_s = min(phc_s, time.time() - t0)
    timings["bm25_phrase_cogroup_200q"] = round(phc_s, 3)

    # sloppy phrase (match_phrase slop=2): the same phrase batch
    # restricted to distinct-token queries (slop>0 refuses repeats),
    # through the SloppyPhraseMatcher port over the same positional
    # index — candidates are all-terms docs, per-candidate PQ walk
    sl_q = ph_q.filter(
        F.size(F.array_distinct(F.split("query", " ", -1)))
        == F.size(F.split("query", " ", -1))
    )
    sl_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        phrase_search_index(spark, "/dev/shm/sgpt_bench_pos", sl_q, k=10,
                            term_stats=pts, slop=2).count()
        sl_s = min(sl_s, time.time() - t0)
    timings["bm25_phrase_slop2_200q"] = round(sl_s, 3)

    # ES intervals query (minimal-interval algebra) on the same batch:
    # unordered with max_gaps=4 — the shape the exact/sloppy paths
    # can't express (any-order minimal windows)
    from sgpt_spark.operators.intervals import intervals_search_index

    iv_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        intervals_search_index(spark, "/dev/shm/sgpt_bench_pos", sl_q,
                               ordered=False, max_gaps=4, k=10,
                               term_stats=pts).count()
        iv_s = min(iv_s, time.time() - t0)
    timings["intervals_unordered_200q"] = round(iv_s, 3)

    # ES span queries (the composable positional family): the same
    # distinct-token batch as span_near(in_order=False, slop=4) trees —
    # structurally the intervals shape plus the non-overlap selection
    # walk, so the delta between the two rows IS the span-algebra cost
    from sgpt_spark.operators.spans import span_search_index

    sp_trees = [
        (r["qid"], {"span_near": {"clauses": r["query"].split(" "),
                                  "slop": 4, "in_order": False}})
        for r in sl_q.collect()
    ]
    sp_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        span_search_index(spark, "/dev/shm/sgpt_bench_pos", sp_trees, k=10,
                          term_stats=pts).count()
        sp_s = min(sp_s, time.time() - t0)
    timings["span_near_200q"] = round(sp_s, 3)

    # span_multi: the same trees with the FIRST clause replaced by a
    # 4-char prefix span_multi — adds the dictionary expansion joins +
    # span_or rewrite on top of the span walk, so the delta vs
    # span_near_200q IS the multi-term wrapper cost
    from sgpt_spark.operators.spanmulti import span_multi_search_index

    spm_trees = []
    for qid, tr in sp_trees:
        toks = tr["span_near"]["clauses"]
        if len(toks) < 2 or len(toks[0]) < 4:
            continue
        spm_trees.append((qid, {"span_near": {
            "clauses": [{"span_multi": {"match": {"prefix": toks[0][:4]}}},
                        *toks[1:]],
            "slop": 4, "in_order": False}}))
    spm_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        span_multi_search_index(spark, "/dev/shm/sgpt_bench_pos", spm_trees,
                                k=10, term_stats=pts).count()
        spm_s = min(spm_s, time.time() - t0)
    timings["span_multi_200q"] = round(spm_s, 3)
    # exhaustive twin: ONE timed run — it re-tokenizes the corpus per
    # batch and lands ~100x above the index path (218.6s vs 2.2s at
    # r5), far outside the host noise band; best-of-2 would buy nothing
    # at ~4 minutes of bench wall
    t0 = time.time()
    phrase_search(docs, ph_q, k=10).count()
    timings["bm25_phrase_exhaustive_200q"] = round(time.time() - t0, 3)

    # highlight: top-10 match run + per-occurrence positions for every
    # hit, off the same positional index (the ES response shape)
    from sgpt_spark.operators.highlight import highlight_search

    hl_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        highlight_search(spark, "/dev/shm/sgpt_bench_pos", ph_q, k=10,
                         term_stats=pts).count()
        hl_s = min(hl_s, time.time() - t0)
    timings["bm25_highlight_200q"] = round(hl_s, 3)

    # ES rescore (the query rescorer): match top-50 window per query off
    # the derived block postings + match_phrase second pass off the
    # positional sidecar, combined 'total' — the two gated plans plus
    # one query-bounded left join
    from sgpt_spark.operators.rescore import rescore_index

    rsc_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        rescore_index(spark, "/dev/shm/sgpt_bench_pos", ph_q, k=10,
                      window_size=50, term_stats=pts).count()
        rsc_s = min(rsc_s, time.time() - t0)
    timings["bm25_rescore_200q"] = round(rsc_s, 3)

    # simple_query_string: the 200-query batch reshaped into the mini
    # language (+t2 t1 -t5 "t3 t4") — in-plan parse, per-clause score
    # relations (match + phrase off the same positional sidecar), one
    # groupBy fold under must/must_not constraints
    from sgpt_spark.operators.querystring import simple_query_string_index

    qs_arr = F.split(F.col("query"), " ", -1)
    mt_qs = mt_q.filter(F.size(qs_arr) >= 5).select(
        "qid",
        F.concat(
            F.lit("+"), F.element_at(qs_arr, 2),
            F.lit(" "), F.element_at(qs_arr, 1),
            F.lit(" -"), F.element_at(qs_arr, 5),
            F.lit(' "'), F.element_at(qs_arr, 3),
            F.lit(" "), F.element_at(qs_arr, 4), F.lit('"'),
        ).alias("query"),
    )
    qs_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        simple_query_string_index(spark, "/dev/shm/sgpt_bench_pos", mt_qs,
                                  k=10, term_stats=pts).count()
        qs_s = min(qs_s, time.time() - t0)
    timings["simple_query_string_200q"] = round(qs_s, 3)

    # simple_query_string FAST path: term clauses through the bool
    # bitmap kernel (one-pass TAAT, <= k rows per (query, segment) out),
    # phrase clauses as scored doc-bit rows off the positional kernel —
    # same results (tested identical), kernel-bounded shuffle
    from sgpt_spark.operators.querystring import simple_query_string_cogroup

    qsc_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        simple_query_string_cogroup(spark, "/dev/shm/sgpt_bench_pos", mt_qs,
                                    k=10, term_stats=pts).count()
        qsc_s = min(qsc_s, time.time() - t0)
    timings["simple_query_string_cogroup_200q"] = round(qsc_s, 3)

    # classic query_string (the full Lucene grammar, operators/
    # luceneqs.py) on the same derived strings restricted to
    # lexer-clean tokens — driver-side parse, batched leaf relations
    # (ONE match_scores for all term clauses, ONE phrase call), one
    # by-depth bool fold
    from sgpt_spark.operators.luceneqs import query_string_search_index

    lq_q = mt_qs.filter(F.col("query").rlike('^[A-Za-z0-9+\\- "]+$'))
    lq_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        query_string_search_index(spark, "/dev/shm/sgpt_bench_pos", lq_q,
                                  k=10, term_stats=pts).count()
        lq_s = min(lq_s, time.time() - t0)
    timings["query_string_200q"] = round(lq_s, 3)

    # match_phrase_prefix (search-as-you-type): the same phrase queries
    # with the last token truncated to a 3-char prefix, expanded against
    # the termstats dictionary (max_expansions=50), off the same
    # positional index
    from sgpt_spark.operators.phrase_prefix import phrase_prefix_search_index

    pparr = F.split(F.col("query"), " ", -1)
    pp_q = ph_q.select(
        "qid",
        F.array_join(
            F.concat(
                F.slice(pparr, F.lit(1), F.size(pparr) - F.lit(1)),
                F.array(F.substring(F.element_at(pparr, -1), 1, 3)),
            ),
            " ",
        ).alias("query"),
    )
    pp_q.persist().count()
    pp_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        phrase_prefix_search_index(spark, "/dev/shm/sgpt_bench_pos", pp_q, k=10,
                                   term_stats=pts).count()
        pp_s = min(pp_s, time.time() - t0)
    timings["bm25_phrase_prefix_200q"] = round(pp_s, 3)

    # multifield phrase through co-segmented per-field positional
    # indexes (multi_match type=phrase)
    from sgpt_spark.operators.phrase_multifield import (
        build_multifield_positional_index,
        phrase_search_multifield_index,
    )

    t0 = time.time()
    build_multifield_positional_index(
        mf_docs, "/dev/shm/sgpt_bench_mfpos",
        segment_size=max(N_DOCS // CPUS, 10_000),
    )
    timings["multifield_positional_build"] = round(time.time() - t0, 3)
    mfp_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        phrase_search_multifield_index(
            spark, "/dev/shm/sgpt_bench_mfpos", ph_q, k=10, tie_breaker=0.5
        ).count()
        mfp_s = min(mfp_s, time.time() - t0)
    timings["bm25_multifield_phrase_200q"] = round(mfp_s, 3)

    # --- rank-identity: index path vs independent exhaustive path -------
    sample = qdf.limit(100)
    got = {}
    for r in search_index(spark, postings, meta, sample, k=10).collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    want = {}
    docs_str = docs.select(F.col("doc_id"), F.col("text"))
    for r in bm25_search(docs_str, sample.select(F.col("qid").cast("long").alias("qid"),
                                                 "query"), k=10).collect():
        want.setdefault(str(r["qid"]), []).append((r["rank"], r["doc_id"], r["score"]))
    identical = sum(
        1 for q in want if sorted(got.get(q, [])) == sorted(want[q])
    )
    identity_rate = identical / len(want) if want else 0.0

    # --- driver-table headline queries -----------------------------------
    dtab = load_table(spark, SF_DIR, "documents")
    ex_s = float("inf")
    for _ in range(2):  # best-of-2, same noise rationale
        t0 = time.time()
        bm25_search(dtab, derived_queries(dtab), k=10).count()
        ex_s = min(ex_s, time.time() - t0)
    timings["bm25_testdata_exhaustive"] = round(ex_s, 3)

    out = {
        "metric": "index_docs_per_sec",
        "value": round(docs_per_sec, 1),
        "unit": "docs/sec",
        "queries": timings,
        "sf": SF_DIR,
        "bench_docs": meta.n_docs,
        "bench_queries": n_q,
        "query_qps": round(qps, 1),
        "std_index_docs_per_sec": round(std_docs_per_sec, 1),
        "codec_bytes_per_posting": codec_bytes,
        "positional_bytes_per_posting": pos_bytes_per_posting,
        "rank_identity_rate": identity_rate,
        "result_rows": n_hits,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
