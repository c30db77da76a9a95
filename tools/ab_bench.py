"""Pinned A/B of individual bench shapes across git refs.

The per-round BENCH numbers ride on a shared VM whose host scheduler
injects large wall-clock noise (see BENCH/BASELINE.md noise floor), so
a round-over-round delta on one row is not evidence by itself. This
tool measures a NAMED shape for two or more code versions under the
same conditions: fresh subprocess/JVM per (variant, round), variants
interleaved A,B,A,B,... so slow host drift hits both, taskset-pinned
to one fixed CPU set when available, best-of-N per variant reported.

Shapes mirror bench.py exactly (same prereq builds, same calls):
  bm25_index_queries        1000-query TAAT through the compressed index
  taat_k1000                100 queries at k=1000, strategy=taat
  wand_k1000                100 queries at k=1000, strategy=wand
  multifield_index_build    co-segmented 2-field index build
  multifield_join_200q      join-based multifield search, 200 queries
  multifield_index_200q     collect-path multifield search, 200 queries
  index_build               single-field index build

Usage:
  python tools/ab_bench.py --refs WORKTREE,862309a --shapes multifield_join_200q \
      [--n-docs 200000] [--cpus 32] [--rounds 3]

WORKTREE = the current checkout. Git refs are materialized as read-only
worktrees under /tmp/ab_worktrees/.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import json, os, shutil, sys, time
repo, shape, n_docs, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
sys.path.insert(0, repo)
from pyspark.sql import functions as F
from sgpt_spark.session import get_spark
spark = get_spark(master=f"local[{cpus}]", app_name=f"ab_{shape}",
                  shuffle_partitions=cpus,
                  extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)})
from sgpt_spark.operators.indexer import assign_doc_ids_fast, build_index
from sgpt_spark.sources.pages import generate_pages

src = f"/tmp/sgpt_bench/pages_{n_docs}.parquet"
if not os.path.exists(src):
    generate_pages(spark, n_docs, partitions=max(cpus * 2, 8)).write.mode(
        "overwrite").parquet(src)
pages = spark.read.parquet(src)
docs = assign_doc_ids_fast(pages.select("url", "text"))
docs.persist().count()
qdf = (docs.filter((F.col("doc_id") % max(n_docs // 1000, 1) == 0)
                   & (F.length("text") > 0))
       .select(F.col("doc_id").cast("string").alias("qid"),
               F.array_join(F.slice(F.split(F.element_at(F.split("text", "\n"), 2),
                                            " ", -1), 1, 5), " ").alias("query"))
       .limit(1000))
qdf.persist().count()
seg = max(n_docs // cpus, 10_000)

# warm-up: python workers + JIT (same as bench.py)
build_index(docs.filter(F.xxhash64("url") % 10 == 0), "/dev/shm/ab_warm",
            segment_size=5000)

def best_of(fn, n=2):
    b = float("inf")
    for _ in range(n):
        t0 = time.time(); fn(); b = min(b, time.time() - t0)
    return b

out = {}
if shape == "index_build":
    def run():
        shutil.rmtree("/dev/shm/ab_idx", ignore_errors=True)
        build_index(docs, "/dev/shm/ab_idx", segment_size=seg)
    out["sec"] = best_of(run)
elif shape in ("bm25_index_queries", "taat_k1000", "wand_k1000"):
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import read_index, read_term_stats
    shutil.rmtree("/dev/shm/ab_idx", ignore_errors=True)
    build_index(docs, "/dev/shm/ab_idx", segment_size=seg)
    postings, meta = read_index(spark, "/dev/shm/ab_idx")
    tstats = read_term_stats(spark, "/dev/shm/ab_idx")
    if shape == "bm25_index_queries":
        out["sec"] = best_of(lambda: search_index(
            spark, postings, meta, qdf, k=10, term_stats=tstats).count())
    else:
        strat = "taat" if shape == "taat_k1000" else "wand"
        deep = qdf.limit(100)
        out["sec"] = best_of(lambda: search_index(
            spark, postings, meta, deep, k=1000, term_stats=tstats,
            strategy=strat).count())
elif shape in ("pfor_build", "varint_build"):
    # bench.py's codec_{codec}_build_19k: the 10%% slice at segment 5000
    warm = docs.filter(F.xxhash64(F.col("doc_id").cast("string")) % 10 == 0)
    warm.persist().count()
    codec = "pfor" if shape == "pfor_build" else "varint"
    def run():
        shutil.rmtree("/dev/shm/ab_codec", ignore_errors=True)
        build_index(warm, "/dev/shm/ab_codec", segment_size=5000, codec=codec)
    out["sec"] = best_of(run)
elif shape == "compact_8seg":
    from sgpt_spark.operators.indexer import compact_index
    shutil.rmtree("/dev/shm/ab_idx", ignore_errors=True)
    build_index(docs, "/dev/shm/ab_idx", segment_size=seg)
    def run():
        shutil.rmtree("/dev/shm/ab_c8", ignore_errors=True)
        shutil.copytree("/dev/shm/ab_idx", "/dev/shm/ab_c8")
        t0 = time.time()
        compact_index(spark, "/dev/shm/ab_c8", 8)
        return time.time() - t0
    best = float("inf")
    for _ in range(2):
        best = min(best, run())
    out["sec"] = round(best, 3)
else:
    from sgpt_spark.operators.indexer import build_multifield_index
    mf_docs = docs.withColumn(
        "title", F.array_join(F.slice(F.split("text", " ", -1), 1, 4), " ")
    ).select("doc_id", "title", "text")
    if shape == "multifield_index_build":
        def run():
            shutil.rmtree("/dev/shm/ab_mf", ignore_errors=True)
            build_multifield_index(mf_docs, "/dev/shm/ab_mf", segment_size=seg)
        out["sec"] = best_of(run)
    elif shape in ("multifield_join_200q", "multifield_index_200q"):
        shutil.rmtree("/dev/shm/ab_mf", ignore_errors=True)
        build_multifield_index(mf_docs, "/dev/shm/ab_mf", segment_size=seg)
        mf_q = qdf.limit(200)
        if shape == "multifield_join_200q":
            from sgpt_spark.operators.index_search import search_multifield_index_join
            out["sec"] = best_of(lambda: search_multifield_index_join(
                spark, "/dev/shm/ab_mf", mf_q, k=10).count())
        else:
            from sgpt_spark.operators.index_search import search_multifield_index
            out["sec"] = best_of(lambda: search_multifield_index(
                spark, "/dev/shm/ab_mf", mf_q, k=10).count())
    else:
        raise SystemExit(f"unknown shape {shape}")
print("ABRESULT " + json.dumps(out))
"""


def _taskset_prefix(cpus: int) -> list[str]:
    if shutil.which("taskset"):
        return ["taskset", "-c", f"0-{cpus - 1}"]
    return []


def _materialize(ref: str) -> str:
    if ref == "WORKTREE":
        return str(REPO)
    wt = Path(f"/tmp/ab_worktrees/{ref}")
    if not wt.exists():
        wt.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["git", "-C", str(REPO), "worktree", "add", "--detach", str(wt), ref],
            check=True, capture_output=True,
        )
    return str(wt)


def run_one(repo: str, shape: str, n_docs: int, cpus: int) -> float:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    cmd = _taskset_prefix(cpus) + [sys.executable, "-c", CHILD, repo, shape,
                                   str(n_docs), str(cpus)]
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return float(json.loads(line[len("ABRESULT "):])["sec"])
    sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:] + "\n")
    raise RuntimeError(f"child failed: {shape} in {repo} (rc={p.returncode})")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--refs", required=True, help="comma list; WORKTREE = current tree")
    ap.add_argument("--shapes", required=True)
    ap.add_argument("--n-docs", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    refs = args.refs.split(",")
    repos = {r: _materialize(r) for r in refs}
    results: dict[str, dict[str, list[float]]] = {}
    for shape in args.shapes.split(","):
        results[shape] = {r: [] for r in refs}
        for rnd in range(args.rounds):
            for r in refs:  # interleaved so host drift hits every variant
                sec = run_one(repos[r], shape, args.n_docs, args.cpus)
                results[shape][r].append(sec)
                print(f"[{shape}] round {rnd + 1} {r}: {sec:.3f}s", flush=True)
        best = {r: min(v) for r, v in results[shape].items()}
        print(f"[{shape}] BEST {json.dumps(best)}", flush=True)
    print("AB_SUMMARY " + json.dumps(
        {s: {r: {"best": min(v), "all": v} for r, v in by.items()}
         for s, by in results.items()}))


if __name__ == "__main__":
    main()
