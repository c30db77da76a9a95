"""CLI surface for the round-5 late operators: query --intervals /
--bool-prefix modes and the percolate subcommand, end-to-end in-process
(the test_cli idiom), each checked against the operator called
directly."""

from __future__ import annotations

import json

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _build_pos_index(spark, tmp_path):
    from sgpt_spark.cli import main
    from sgpt_spark.sources.pages import generate_pages

    pages = tmp_path / "pages.parquet"
    generate_pages(spark, 300, partitions=2).write.parquet(str(pages))
    idx = tmp_path / "idx"
    main(["build-index", "--pages", str(pages), "--out", str(idx),
          "--segment-size", "100", "--positions"])
    return pages, idx / "index"


def _queries_jsonl(tmp_path, texts):
    q = tmp_path / "queries.jsonl"
    q.write_text(
        "\n".join(
            json.dumps({"_id": f"q{i}", "text": t})
            for i, t in enumerate(texts)
        )
        + "\n"
    )
    return q


def test_cli_intervals_and_bool_prefix(spark, tmp_path):
    from sgpt_spark.cli import main
    from sgpt_spark.sources.pages import make_page

    pages, idx = _build_pos_index(spark, tmp_path)
    # distinct-token interior words of doc 7's second line
    body = make_page(7)[3].split("\n")[1].split(" ")
    terms, seen = [], set()
    for w in body[1:-1]:
        if w not in seen:
            seen.add(w)
            terms.append(w)
        if len(terms) == 3:
            break
    queries = _queries_jsonl(tmp_path, [" ".join(terms)])

    out_iv = tmp_path / "run_iv"
    main(["query", "--index", str(idx), "--queries", str(queries),
          "--out", str(out_iv), "--k", "5", "--intervals", "--max-gaps", "4"])
    got = spark.read.parquet(str(out_iv))
    from sgpt_spark.operators.indexer import read_term_stats
    from sgpt_spark.operators.intervals import intervals_search_index

    want = intervals_search_index(
        spark, str(idx), [("q0", " ".join(terms))], ordered=False,
        max_gaps=4, k=5, term_stats=read_term_stats(spark, str(idx)),
    )
    key = lambda df: sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in df.collect()
    )
    assert key(got) == key(want) and got.count() > 0

    out_bp = tmp_path / "run_bp"
    prefix_q = _queries_jsonl(tmp_path, [f"{terms[0]} {terms[1][:8]}"])
    main(["query", "--index", str(idx), "--queries", str(prefix_q),
          "--out", str(out_bp), "--k", "5", "--bool-prefix"])
    assert spark.read.parquet(str(out_bp)).count() > 0


def test_cli_query_mode_exclusive(spark, tmp_path):
    from sgpt_spark.cli import main

    _, idx = _build_pos_index(spark, tmp_path)
    q = _queries_jsonl(tmp_path, ["anything"])
    with pytest.raises(SystemExit, match="one query mode"):
        main(["query", "--index", str(idx), "--queries", str(q),
              "--out", str(tmp_path / "x"), "--intervals", "--bool-prefix"])


def test_cli_percolate(spark, tmp_path):
    from sgpt_spark.cli import main
    from sgpt_spark.operators.percolate import percolate
    from sgpt_spark.sources.pages import generate_pages

    docs_path = tmp_path / "docs.parquet"
    docs = generate_pages(spark, 200, partitions=2)
    docs.write.parquet(str(docs_path))
    body = docs.limit(1).collect()[0]["text"].split("\n")[0].split(" ")
    rules = _queries_jsonl(tmp_path, [" ".join(body[:3]), "zzz_nothing"])

    out = tmp_path / "fired"
    main(["percolate", "--rules", str(rules), "--docs", str(docs_path),
          "--out", str(out), "--min-match", "2", "--id-col", "url"])
    got = sorted(
        (r["doc_id"], r["qid"], r["matched"])
        for r in spark.read.parquet(str(out)).collect()
    )
    from sgpt_spark.sources.readers import read_beir_queries

    want = sorted(
        (r["doc_id"], r["qid"], r["matched"])
        for r in percolate(
            read_beir_queries(spark, str(rules)),
            spark.read.parquet(str(docs_path)),
            minimum_should_match=2,
            id_col="url",
        ).collect()
    )
    assert got == want and len(got) > 0
    assert not [r for r in got if r[1] == "q1"]  # zzz rule never fires


def test_cli_lucene_query_string(spark, tmp_path):
    from sgpt_spark.cli import main
    from sgpt_spark.operators.indexer import read_term_stats
    from sgpt_spark.operators.luceneqs import query_string_search_index
    from sgpt_spark.sources.pages import make_page

    pages, idx = _build_pos_index(spark, tmp_path)
    body = make_page(3)[3].split("\n")[1].split(" ")
    terms, seen = [], set()
    for w in body[1:-1]:
        if w not in seen and w.isalnum():
            seen.add(w)
            terms.append(w)
        if len(terms) == 3:
            break
    qs = f"+{terms[0]} ({terms[1]} OR {terms[2]})"
    queries = _queries_jsonl(tmp_path, [qs])

    out = tmp_path / "run_lq"
    main(["query", "--index", str(idx), "--queries", str(queries),
          "--out", str(out), "--k", "5", "--lucene"])
    got = spark.read.parquet(str(out))
    want = query_string_search_index(
        spark, str(idx), [("q0", qs)], k=5,
        term_stats=read_term_stats(spark, str(idx)),
    )
    key = lambda df: sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in df.collect()
    )
    assert key(got) == key(want) and got.count() > 0
