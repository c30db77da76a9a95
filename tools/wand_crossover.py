"""One-off WAND-crossover experiment at deep-segment scale (round-3
verdict item 3).

BENCH_r03 showed TAAT beating block-max WAND at every measured batch
shape; WAND's claimed regime is FEW queries over DEEP posting lists at
small k, where the top-k threshold rises fast enough to skip whole
blocks. bench.py carries the per-round point (1 query, k=10, one
~200k-doc segment); this tool pushes the same experiment to a
multi-million-doc single segment — the reference's "one ES shard"
shape — to locate (or bound) the crossover.

Method: build the N-doc Zipf pages corpus (the scaling fixture),
parallel index build, streaming-compact to ONE segment, then for
query-term-count q in {2, 5} and k in {10, 1000} measure
TAAT vs WAND vs exhaustive, best-of-3 warmed runs, single query.

Usage: python tools/wand_crossover.py [n_docs]   (default 1_600_000)
Appends a JSON line + markdown row to BENCH/WAND_CROSSOVER.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from sgpt_spark.operators.index_search import search_index  # noqa: E402
from sgpt_spark.operators.indexer import (  # noqa: E402
    assign_doc_ids_fast,
    build_index,
    compact_index,
    read_index,
    read_term_stats,
)
from sgpt_spark.session import get_spark  # noqa: E402
from sgpt_spark.sources.pages import generate_pages  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    spark = get_spark(
        master="local[32]",
        app_name="wand_crossover",
        shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    src = f"/tmp/sgpt_bench/pages_{n_docs}.parquet"
    if not Path(src).exists():
        generate_pages(spark, n_docs, partitions=64).write.mode("overwrite").parquet(src)
    pages = spark.read.parquet(src)
    docs = assign_doc_ids_fast(pages.select("url", "text"))

    idx = "/dev/shm/sgpt_wand_xover"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    build_index(docs, idx, segment_size=max(n_docs // 64, 10_000))
    build_s = time.time() - t0
    t0 = time.time()
    compact_index(spark, idx, 1)
    compact_s = time.time() - t0
    postings, meta = read_index(spark, idx)
    tstats = read_term_stats(spark, idx)
    print(f"# built {meta.n_docs} docs, 1 segment: build {build_s:.1f}s "
          f"+ compact {compact_s:.1f}s", flush=True)

    # one query per shape, terms drawn from a real doc (Zipf mix of head
    # and tail terms — the honest query recipe the bench uses)
    row = docs.filter(F.col("doc_id") == 12345).select("text").collect()[0]
    toks = [t for t in row["text"].split("\n")[-1].split(" ") if t]
    results = {}
    for q_terms in (2, 5):
        q = [(0, " ".join(toks[:q_terms]))]
        for k in (10, 1000):
            for strat in ("taat", "wand", "exhaustive"):
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    search_index(
                        spark, postings, meta, q, k=k,
                        term_stats=tstats, strategy=strat,
                    ).count()
                    best = min(best, time.time() - t0)
                results[f"{strat}_q{q_terms}_k{k}"] = round(best, 3)
                print(f"{strat} q_terms={q_terms} k={k}: {best:.3f}s", flush=True)

    out = {
        "n_docs": meta.n_docs,
        "segments": 1,
        "build_s": round(build_s, 1),
        "compact_s": round(compact_s, 1),
        "timings": results,
    }
    line = json.dumps(out)
    print(line)
    md = REPO / "BENCH" / "WAND_CROSSOVER.md"
    md.parent.mkdir(exist_ok=True)
    with open(md, "a") as fp:
        fp.write(f"\n```json\n{line}\n```\n")
    spark.stop()


if __name__ == "__main__":
    main()
