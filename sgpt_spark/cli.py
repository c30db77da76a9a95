"""spark-submit entry points (north rule: launched via
``spark-submit --py-files sgpt_spark.zip``).

Subcommands:
  build-index  --pages <parquet> --out <index_dir> [--segment-size N]
               [--analyzer whitespace|standard]
  append       --pages <parquet> --index <index_dir>
  query        --index <index_dir> --queries <queries.jsonl|parquet>
               --out <run_dir> [--k K] [--exclude-self]
  evaluate     --run <results parquet> --qrels <qrels.tsv|parquet> [--k K]
               [--k-values 1,3,5,10,100,1000]
  compact      --index <index_dir> (--target-segments N | --auto
               [--max-segments M] [--min-postings P])   (segment merge;
               --auto lets the tiered size policy pick, or decline)
  dedup        --docs <parquet> --out <dir> [--method exact|minhash|
               simhash|clusters] [--threshold J]
  profile      --docs <parquet> --out <dir>   (per-doc text profile)
  ann          --embeddings <parquet> --queries <parquet> --out <dir>
               [--method brute|lsh|ivf] [--k K] [--n-probe P]
               (join-based dense retrieval; query set stays in the plan)
  sessionize   --events <parquet> --out <dir> [--gap-seconds N]
  beir         --corpus corpus.jsonl --queries queries.jsonl
               --qrels qrels.tsv --out <dir> [--k-values ...]
               [--analyzer standard|whitespace] [--rerank-top-k N]
               [--exclude-self]   (the reference's whole run_bm25 flow)
  bench        (see bench.py at the repo root)

Example cluster launch:
  zip -r sgpt_spark.zip sgpt_spark
  spark-submit --py-files sgpt_spark.zip -m sgpt_spark.cli build-index \
      --pages s3://corpus/pages --out s3://indexes/v1
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def _spark(app: str) -> SparkSession:
    from sgpt_spark.session import get_spark

    # under spark-submit the master comes from the launcher; fall back to
    # local for direct runs
    builder_master = None
    return get_spark(master=builder_master, app_name=app)


def cmd_build_index(args) -> None:
    from sgpt_spark.plans.pipeline import build_index_pipeline

    spark = _spark("sgpt-build-index")
    postings, meta = build_index_pipeline(
        spark, args.pages, args.out, segment_size=args.segment_size,
        analyzer=args.analyzer, codec=args.codec, positions=args.positions,
    )
    kind = "positional index" if args.positions else "index"
    print(f"built {kind} at {args.out}: n_docs={meta.n_docs} avgdl={meta.avgdl:.2f}")


def cmd_append(args) -> None:
    from sgpt_spark.streaming.incremental import append_to_index

    spark = _spark("sgpt-append")
    pages = spark.read.parquet(args.pages)
    meta = append_to_index(spark, pages, args.index)
    print(f"appended: n_docs={meta.n_docs} avgdl={meta.avgdl:.2f}")


def cmd_query(args) -> None:
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import read_index
    from sgpt_spark.sources.readers import read_beir_queries

    spark = _spark("sgpt-query")
    if args.queries.endswith(".jsonl") or args.queries.endswith(".json"):
        queries = read_beir_queries(spark, args.queries)
    else:
        queries = spark.read.parquet(args.queries)
    from sgpt_spark.operators.indexer import read_term_stats

    modes = [m for m in ("phrase", "query_string", "lucene", "explain",
                         "intervals", "bool_prefix")
             if getattr(args, m, False)]
    if len(modes) > 1:
        raise SystemExit(f"pick one query mode, got {modes}")
    if getattr(args, "lucene", False):
        if args.exclude_self:
            raise SystemExit("--lucene does not support --exclude-self")
        from sgpt_spark.operators.luceneqs import query_string_search_index

        run = query_string_search_index(
            spark, args.index, queries, k=args.k,
            default_operator=args.default_operator,
            term_stats=read_term_stats(spark, args.index),
        )
    elif getattr(args, "intervals", False):
        if args.exclude_self:
            raise SystemExit("--intervals does not support --exclude-self")
        from sgpt_spark.operators.intervals import intervals_search_index

        run = intervals_search_index(
            spark, args.index, queries, k=args.k,
            ordered=args.ordered, max_gaps=args.max_gaps,
            term_stats=read_term_stats(spark, args.index),
        )
    elif getattr(args, "bool_prefix", False):
        if args.exclude_self:
            raise SystemExit("--bool-prefix does not support --exclude-self")
        from sgpt_spark.operators.boolprefix import match_bool_prefix_search_index
        from sgpt_spark.operators.indexer import read_index

        postings, meta = read_index(spark, args.index)
        run = match_bool_prefix_search_index(
            spark, postings, meta, queries, k=args.k,
            term_stats=read_term_stats(spark, args.index),
        )
    elif args.phrase:
        if args.exclude_self:
            raise SystemExit("--phrase does not support --exclude-self")
        from sgpt_spark.operators.positions import phrase_search_index

        run = phrase_search_index(
            spark, f"{args.index}", queries, k=args.k,
            term_stats=read_term_stats(spark, args.index),
        )
    elif getattr(args, "query_string", False):
        if args.exclude_self:
            raise SystemExit("--query-string does not support --exclude-self")
        from sgpt_spark.operators.querystring import simple_query_string_index

        run = simple_query_string_index(
            spark, args.index, queries, k=args.k,
            default_operator=args.default_operator,
            term_stats=read_term_stats(spark, args.index),
        )
    elif getattr(args, "explain", False):
        from sgpt_spark.operators.explain import explain_search_index
        from sgpt_spark.operators.indexer import read_index

        if args.exclude_self:
            raise SystemExit("--explain does not support --exclude-self")
        postings, meta = read_index(spark, args.index)
        run = explain_search_index(
            spark, postings, meta, queries, k=args.k,
            term_stats=read_term_stats(spark, args.index),
        )
    else:
        postings, meta = read_index(spark, args.index)
        run = search_index(
            spark, postings, meta, queries, k=args.k,
            exclude_self=args.exclude_self,
            term_stats=read_term_stats(spark, args.index),
        )
    run.write.mode("overwrite").parquet(args.out)
    print(f"wrote run to {args.out}")


def cmd_evaluate(args) -> None:
    from sgpt_spark.operators.metrics import mean_metrics, mean_metrics_at
    from sgpt_spark.sources.readers import read_beir_qrels

    spark = _spark("sgpt-evaluate")
    run = spark.read.parquet(args.run)
    if args.qrels.endswith(".tsv") or args.qrels.endswith(".csv"):
        qrels = read_beir_qrels(spark, args.qrels)
    else:
        qrels = spark.read.parquet(args.qrels)
    if args.k_values:
        ks = [int(x) for x in args.k_values.split(",")]
        for row in mean_metrics_at(run, qrels, ks).orderBy("k").collect():
            k = row["k"]
            print(
                f"nDCG@{k}={row['ndcg']} MAP@{k}={row['map']} MRR@{k}={row['mrr']} "
                f"P@{k}={row['precision']} R@{k}={row['recall']}"
            )
        return
    row = mean_metrics(run, qrels, k=args.k).collect()[0]
    print(
        f"nDCG@{args.k}={row['ndcg']} MAP@{args.k}={row['map']} "
        f"MRR@{args.k}={row['mrr']} P@{args.k}={row['precision']} "
        f"R@{args.k}={row['recall']}"
    )


def cmd_compact(args) -> None:
    import os

    if (args.target_segments is None) == (not args.auto):
        raise SystemExit("compact: pass exactly one of --target-segments or --auto")
    spark = _spark("sgpt-compact")
    multifield = os.path.exists(os.path.join(args.index, "fields.json"))
    if args.auto:
        # policy-driven (Lucene TieredMergePolicy role): merge only when
        # the index is oversharded or has underfull append segments
        from sgpt_spark.operators.compaction_policy import (
            auto_compact_index,
            auto_compact_multifield_index,
        )

        fn = auto_compact_multifield_index if multifield else auto_compact_index
        n = fn(spark, args.index, max_segments=args.max_segments,
               min_postings=args.min_postings)
        if n is None:
            print(f"{args.index}: healthy (policy: no merge needed)")
            return
    elif multifield:
        # multifield layout: one shared bucket mapping across all field
        # indexes (independent per-field compaction would break the
        # co-segmentation invariant and is refused by compact_index)
        from sgpt_spark.operators.indexer import compact_multifield_index

        n = compact_multifield_index(spark, args.index, args.target_segments)
    else:
        from sgpt_spark.operators.indexer import compact_index

        n = compact_index(spark, args.index, args.target_segments)
    print(f"compacted {args.index} to {n} segments")


def cmd_beir(args) -> None:
    from sgpt_spark.plans.beir import run_beir_bm25

    spark = _spark("sgpt-beir")
    ks = tuple(int(x) for x in args.k_values.split(","))
    metrics = run_beir_bm25(
        spark, args.corpus, args.queries, args.qrels, args.out,
        k_values=ks, analyzer=args.analyzer,
        rerank_top_k=args.rerank_top_k, exclude_self=args.exclude_self,
    )
    for row in metrics.orderBy("k").collect():
        k = row["k"]
        print(
            f"nDCG@{k}={row['ndcg']} MAP@{k}={row['map']} MRR@{k}={row['mrr']} "
            f"P@{k}={row['precision']} R@{k}={row['recall']}"
        )


def cmd_dedup(args) -> None:
    spark = _spark("sgpt-dedup")
    docs = spark.read.parquet(args.docs)
    if args.method == "exact":
        from sgpt_spark.operators.dedup import dedup_exact

        out = dedup_exact(docs)
    elif args.method == "minhash":
        from sgpt_spark.operators.dedup import near_dup_pairs

        out = near_dup_pairs(docs, method="minhash", threshold=args.threshold)
    elif args.method == "simhash":
        from sgpt_spark.operators.dedup import near_dup_pairs

        out = near_dup_pairs(docs, method="simhash")
    elif args.method == "clusters":
        from sgpt_spark.operators.dedup import dedup_clusters

        out = dedup_clusters(docs, threshold=args.threshold)
    else:
        raise SystemExit(f"unknown --method {args.method}")
    out.write.mode("overwrite").parquet(args.out)
    print(f"wrote {args.method} dedup output to {args.out}")


def cmd_ann(args) -> None:
    """Dense/ANN retrieval over a parquet embeddings table
    (vec_id, embedding) with a parquet query table (qid, embedding).
    All methods use the join-based paths — the query set never leaves
    the plan, so the same command handles millions of queries."""
    spark = _spark("sgpt-ann")
    emb = spark.read.parquet(args.embeddings)
    queries = spark.read.parquet(args.queries)
    if args.method == "brute":
        from sgpt_spark.operators.similarity import dense_search_join

        out = dense_search_join(emb, queries, k=args.k)
    elif args.method == "lsh":
        from sgpt_spark.operators.similarity import lsh_search_join

        out = lsh_search_join(emb, queries, k=args.k)
    elif args.method == "ivf":
        from sgpt_spark.operators.similarity import ivf_search_join

        out = ivf_search_join(emb, queries, k=args.k, n_probe=args.n_probe)
    else:
        raise SystemExit(f"unknown --method {args.method}")
    out.write.mode("overwrite").parquet(args.out)
    print(f"wrote {args.method} ann top-{args.k} run to {args.out}")


def cmd_percolate(args) -> None:
    """Reverse search: stored match queries (parquet/JSONL (qid, query)
    rows) fire against a parquet documents table -> fired
    (doc_id, qid, matched) pairs — the alerting primitive."""
    from sgpt_spark.operators.percolate import percolate
    from sgpt_spark.sources.readers import read_beir_queries

    spark = _spark("sgpt-percolate")
    if args.rules.endswith(".jsonl") or args.rules.endswith(".json"):
        rules = read_beir_queries(spark, args.rules)
    else:
        rules = spark.read.parquet(args.rules)
    fired = percolate(
        rules,
        spark.read.parquet(args.docs),
        minimum_should_match=args.min_match,
        operator=args.operator,
        id_col=args.id_col,
        text_col=args.text_col,
    )
    fired.write.mode("overwrite").parquet(args.out)
    print(f"wrote fired (doc, rule) pairs to {args.out}")


def cmd_search(args) -> None:
    """ES _search body executor: --body is the request dict as JSON
    (or @file.json); hits (and each named aggregation) write under
    --out as parquet. The body surface and guards are
    operators/request.search_request's."""
    import json as _json

    from sgpt_spark.operators.indexer import read_docvalues
    from sgpt_spark.operators.request import search_request

    spark = _spark("sgpt-search")
    raw = args.body
    if raw.startswith("@"):
        with open(raw[1:]) as fp:
            raw = fp.read()
    body = _json.loads(raw)
    dv = None
    if args.docvalues:
        dv = read_docvalues(spark, args.docvalues)
    resp = search_request(spark, args.index, body, docvalues=dv)
    resp["hits"].write.mode("overwrite").parquet(f"{args.out}/hits")
    wrote = ["hits"]
    for name, df in resp.get("aggregations", {}).items():
        df.write.mode("overwrite").parquet(f"{args.out}/agg_{name}")
        wrote.append(f"agg_{name}")
    if "highlight" in resp:
        resp["highlight"].write.mode("overwrite").parquet(f"{args.out}/highlight")
        wrote.append("highlight")
    print(f"wrote {', '.join(wrote)} under {args.out}")


def cmd_profile(args) -> None:
    from sgpt_spark.operators.textstats import text_profile

    spark = _spark("sgpt-profile")
    text_profile(spark.read.parquet(args.docs)).write.mode("overwrite").parquet(args.out)
    print(f"wrote text profile to {args.out}")


def cmd_sessionize(args) -> None:
    from sgpt_spark.operators.sessions import sessionize

    spark = _spark("sgpt-sessionize")
    sessionize(spark.read.parquet(args.events), gap_seconds=args.gap_seconds).write.mode(
        "overwrite"
    ).parquet(args.out)
    print(f"wrote sessions to {args.out}")


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="sgpt_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-index")
    b.add_argument("--pages", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--segment-size", type=int, default=100_000)
    b.add_argument("--analyzer", choices=["whitespace", "standard"], default="whitespace")
    from sgpt_spark.functions.compress import CODECS

    b.add_argument("--codec", choices=list(CODECS), default="varint")
    b.add_argument("--positions", action="store_true",
                   help="write the positional sidecar (Lucene .pos role): "
                        "one tokenize pass, postings derived from it; "
                        "enables `query --phrase` (ES match_phrase)")
    b.set_defaults(fn=cmd_build_index)

    a = sub.add_parser("append")
    a.add_argument("--pages", required=True)
    a.add_argument("--index", required=True)
    a.set_defaults(fn=cmd_append)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True)
    q.add_argument("--out", required=True)
    q.add_argument("--k", type=int, default=1000)
    q.add_argument("--exclude-self", action="store_true")
    q.add_argument("--phrase", action="store_true",
                   help="ES match_phrase (slop=0) through the positional "
                        "sidecar — needs an index built with --positions")
    q.add_argument("--query-string", dest="query_string", action="store_true",
                   help="ES simple_query_string (+must -not \"phrase\") — "
                        "needs an index built with --positions")
    q.add_argument("--lucene", action="store_true",
                   help="ES query_string: the full classic Lucene grammar "
                        "(AND/OR/NOT, parens, fields, ranges, wildcards, "
                        "fuzzy, boosts) — needs an index built with "
                        "--positions")
    q.add_argument("--default-operator", choices=["or", "and"], default="or")
    q.add_argument("--explain", action="store_true",
                   help="ES explain: per-term BM25 breakdown of the top-k page")
    q.add_argument("--intervals", action="store_true",
                   help="ES intervals match rule (minimal-interval algebra) "
                        "— needs an index built with --positions")
    q.add_argument("--ordered", action="store_true",
                   help="intervals: terms must appear in query order")
    q.add_argument("--max-gaps", dest="max_gaps", type=int, default=-1,
                   help="intervals: max interior gaps per window (-1 = any)")
    q.add_argument("--bool-prefix", dest="bool_prefix", action="store_true",
                   help="ES match_bool_prefix: last token as a prefix clause")
    q.set_defaults(fn=cmd_query)

    e = sub.add_parser("evaluate")
    e.add_argument("--run", required=True)
    e.add_argument("--qrels", required=True)
    e.add_argument("--k", type=int, default=10)
    e.add_argument("--k-values", default=None, help="comma list, e.g. 1,3,5,10,100,1000")
    e.set_defaults(fn=cmd_evaluate)

    cp = sub.add_parser("compact")
    cp.add_argument("--index", required=True)
    cp.add_argument("--target-segments", type=int, default=None)
    cp.add_argument("--auto", action="store_true",
                    help="size-based policy picks the merge (or declines)")
    cp.add_argument("--max-segments", type=int, default=32)
    cp.add_argument("--min-postings", type=int, default=10_000)
    cp.set_defaults(fn=cmd_compact)

    br = sub.add_parser("beir")
    br.add_argument("--corpus", required=True)
    br.add_argument("--queries", required=True)
    br.add_argument("--qrels", required=True)
    br.add_argument("--out", required=True)
    br.add_argument("--k-values", default="1,3,5,10,100,1000")
    br.add_argument("--analyzer", choices=["whitespace", "standard"], default="standard")
    br.add_argument("--rerank-top-k", type=int, default=None)
    br.add_argument("--exclude-self", action="store_true")
    br.set_defaults(fn=cmd_beir)

    d = sub.add_parser("dedup")
    d.add_argument("--docs", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--method", choices=["exact", "minhash", "simhash", "clusters"],
                   default="minhash")
    d.add_argument("--threshold", type=float, default=0.8)
    d.set_defaults(fn=cmd_dedup)

    an = sub.add_parser("ann")
    an.add_argument("--embeddings", required=True)
    an.add_argument("--queries", required=True)
    an.add_argument("--out", required=True)
    an.add_argument("--method", default="brute", choices=["brute", "lsh", "ivf"])
    an.add_argument("--k", type=int, default=10)
    an.add_argument("--n-probe", type=int, default=4)
    an.set_defaults(fn=cmd_ann)

    pc = sub.add_parser("percolate")
    pc.add_argument("--rules", required=True,
                    help="stored match queries: parquet or BEIR JSONL")
    pc.add_argument("--docs", required=True)
    pc.add_argument("--out", required=True)
    pc.add_argument("--min-match", dest="min_match", type=int, default=0)
    pc.add_argument("--operator", choices=["or", "and"], default="or")
    pc.add_argument("--id-col", dest="id_col", default="doc_id",
                    help="doc id column (e.g. url for a pages table)")
    pc.add_argument("--text-col", dest="text_col", default="text")
    pc.set_defaults(fn=cmd_percolate)

    sr = sub.add_parser("search", help="execute one ES _search body dict")
    sr.add_argument("--index", required=True)
    sr.add_argument("--body", required=True,
                    help="request JSON, or @path/to/body.json")
    sr.add_argument("--out", required=True)
    sr.add_argument("--docvalues", default=None,
                    help="path of a build with a doc-values sidecar "
                         "(needed by aggs/sort/collapse/ids/match_all/"
                         "structured bool filters)")
    sr.set_defaults(fn=cmd_search)

    pr = sub.add_parser("profile")
    pr.add_argument("--docs", required=True)
    pr.add_argument("--out", required=True)
    pr.set_defaults(fn=cmd_profile)

    se = sub.add_parser("sessionize")
    se.add_argument("--events", required=True)
    se.add_argument("--out", required=True)
    se.add_argument("--gap-seconds", type=int, default=28_800)
    se.set_defaults(fn=cmd_sessionize)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
