"""Second-scale BEIR lifecycle vs an independent DuckDB metric oracle.

Boundary (documented per round-4 advice #5): no real BEIR dataset can
enter this sandbox (no network), so end-to-end *quality* parity with
the reference's nDCG@10 0.423 average (other/sgpt_utils.ipynb cell 32)
cannot be measured here — the CLI (`cli beir`) and `run_beir_bm25` are
dataset-ready. What CAN be proven offline is the whole lifecycle's
*metric math* at a second, larger scale than the 40-doc pytest fixture:
this test generates a 1200-doc / 60-query BEIR-format dataset with
known qrels, runs the full pipeline (JSONL/TSV in -> standard analyzer
-> compressed index -> deep retrieval -> run parquet -> multi-k
metrics), then recomputes every metric at every cutoff in DuckDB from
the persisted run + qrels files alone and demands agreement to 6 dp.
"""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

import duckdb
import pytest

from sgpt_spark.plans.beir import run_beir_bm25
from sgpt_spark.sources.pages import _VOCAB, _doc_terms

N_DOCS = 1200
QUERY_EVERY = 20  # 60 queries


@pytest.fixture(scope="module")
def beir_scale_dir():
    base = Path(tempfile.mkdtemp(prefix="sgpt_beir_scale_"))
    with (base / "corpus.jsonl").open("w") as fp:
        for i in range(N_DOCS):
            body = " ".join(_VOCAB[_doc_terms(i)][:80])
            fp.write(
                json.dumps(
                    {"_id": f"d{i}", "title": f"Title {i % 97}.", "text": body}
                )
                + "\n"
            )
    with (base / "queries.jsonl").open("w") as fp, (base / "qrels.tsv").open(
        "w"
    ) as qf:
        qf.write("query-id\tcorpus-id\tscore\n")
        for i in range(0, N_DOCS, QUERY_EVERY):
            body = " ".join(_VOCAB[_doc_terms(i)][:80])
            q = " ".join(body.split(" ")[3:8])
            fp.write(json.dumps({"_id": f"q{i}", "text": q.upper() + "?"}) + "\n")
            # known-item qrels plus a second relevant doc when it exists
            qf.write(f"q{i}\td{i}\t1\n")
            if i + 1 < N_DOCS:
                qf.write(f"q{i}\td{i + 1}\t1\n")
    return base


def _duckdb_metrics(run_parquet: str, qrels_tsv: str, ks: list[int]):
    """Independent recomputation of (ndcg, map, mrr, precision, recall)
    per cutoff from the run parquet + qrels TSV (same definitions as
    the driver-gate oracle _metrics_multi_sql in __spark_entry__.py)."""
    klist = ", ".join(str(k) for k in ks)
    sql = f"""
WITH run AS (SELECT qid, doc_id, rank FROM read_parquet('{run_parquet}/*.parquet')),
  qrels AS (
    SELECT "query-id" AS qid, "corpus-id" AS doc_id
    FROM read_csv('{qrels_tsv}', delim='\t', header=true)
    WHERE score > 0
  ),
  ks AS (SELECT CAST(unnest([{klist}]) AS INTEGER) AS k),
  nrel AS (SELECT qid, count(*) AS n_rel FROM qrels GROUP BY qid),
  lab AS (
    SELECT r.qid, r.rank, CASE WHEN q.qid IS NOT NULL THEN 1 ELSE 0 END AS rel
    FROM run r LEFT JOIN qrels q ON r.qid = q.qid AND r.doc_id = q.doc_id
  ),
  runn AS (
    SELECT qid, rank, rel,
           sum(rel) OVER (PARTITION BY qid ORDER BY rank) AS cum_hits
    FROM lab
  ),
  ex AS (SELECT runn.*, ks.k FROM runn CROSS JOIN ks WHERE rank <= k),
  perq0 AS (
    SELECT qid, k,
           sum(rel / log2(rank + 1)) AS dcg,
           sum(CASE WHEN rel = 1 THEN cum_hits * 1.0 / rank ELSE 0 END) AS psum,
           max(CASE WHEN rel = 1 THEN 1.0 / rank ELSE 0 END) AS mrr,
           sum(rel) AS hits
    FROM ex GROUP BY qid, k
  ),
  grid AS (SELECT n.qid, n.n_rel, ks.k FROM nrel n CROSS JOIN ks),
  perq AS (
    SELECT g.qid, g.k, g.n_rel,
           coalesce(p.dcg, 0) AS dcg, coalesce(p.psum, 0) AS psum,
           coalesce(p.mrr, 0) AS mrr, coalesce(p.hits, 0) AS hits,
           list_sum([1.0 / log2(i + 1)
                     for i in generate_series(1, least(g.k, g.n_rel))]) AS idcg
    FROM grid g LEFT JOIN perq0 p ON g.qid = p.qid AND g.k = p.k
  )
SELECT k,
       avg(dcg / idcg) AS ndcg,
       avg(psum / least(k, n_rel)) AS map,
       avg(mrr) AS mrr,
       avg(hits * 1.0 / k) AS precision,
       avg(hits * 1.0 / n_rel) AS recall
FROM perq GROUP BY k ORDER BY k
"""
    return {
        int(r[0]): tuple(float(v) for v in r[1:])
        for r in duckdb.connect().execute(sql).fetchall()
    }


def test_beir_lifecycle_metrics_match_duckdb_oracle(spark, beir_scale_dir):
    out = Path(tempfile.mkdtemp(prefix="sgpt_beir_scale_out_"))
    ks = (1, 5, 10, 100)
    metrics = run_beir_bm25(
        spark,
        str(beir_scale_dir / "corpus.jsonl"),
        str(beir_scale_dir / "queries.jsonl"),
        str(beir_scale_dir / "qrels.tsv"),
        str(out),
        k_values=ks,
        analyzer="standard",
    )
    got = {
        int(r["k"]): (
            r["ndcg"], r["map"], r["mrr"], r["precision"], r["recall"]
        )
        for r in metrics.collect()
    }
    assert set(got) == set(ks)
    want = _duckdb_metrics(str(out / "run"), str(beir_scale_dir / "qrels.tsv"), list(ks))
    for k in ks:
        for g, w, name in zip(
            got[k], want[k], ("ndcg", "map", "mrr", "precision", "recall")
        ):
            assert abs(g - w) <= 1.5e-6, (k, name, g, w)
    # sanity: retrieval actually finds the known items at this scale
    # (each query has 2 relevant docs; the second shares little
    # vocabulary, so recall tops out near 0.5 + a tail)
    assert got[10][2] > 0.5  # MRR@10
    assert got[100][4] > 0.45  # recall@100


def test_beir_scale_known_item_head(spark, beir_scale_dir):
    """The derived queries are doc excerpts — the known item should top
    the ranking for most queries (a weak quality bar that a broken
    analyzer/scoring chain fails immediately)."""
    out = Path(tempfile.mkdtemp(prefix="sgpt_beir_scale_out2_"))
    run_beir_bm25(
        spark,
        str(beir_scale_dir / "corpus.jsonl"),
        str(beir_scale_dir / "queries.jsonl"),
        str(beir_scale_dir / "qrels.tsv"),
        str(out),
        k_values=(1, 10),
        analyzer="standard",
    )
    rows = duckdb.connect().execute(
        f"""
        SELECT avg(CASE WHEN 'd' || substr(qid, 2) = doc_id THEN 1.0 ELSE 0.0 END)
        FROM read_parquet('{out}/run/*.parquet') WHERE rank = 1
        """
    ).fetchone()
    assert rows[0] > 0.7
