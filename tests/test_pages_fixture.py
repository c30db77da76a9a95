"""Pages fixture: determinism, schema, Zipf skew, and the byte-identical
extract_text invariant (BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sgpt_spark.schema import PAGES
from sgpt_spark.sources.pages import (
    extract_text_py,
    generate_pages,
    make_page,
    with_extracted_text,
)

N = 2000


def test_schema_and_counts(spark):
    df = generate_pages(spark, N)
    assert df.schema == PAGES
    assert df.count() == N
    langs = {r["lang"]: r["n"] for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert langs["en"] == N * 45 // 50
    assert langs["de"] == N * 4 // 50
    assert langs["fr"] == N * 1 // 50


def test_determinism_across_partitionings(spark):
    a = sorted(generate_pages(spark, 300, partitions=1).collect())
    b = sorted(generate_pages(spark, 300, partitions=7).collect())
    assert a == b


def test_extract_text_byte_identical(spark):
    """input_hint per-row invariant: extract_text(html) == text, byte-for-byte."""
    df = with_extracted_text(generate_pages(spark, N))
    mismatches = df.filter(
        ~(F.col("extracted").eqNullSafe(F.col("text")))
    ).count()
    assert mismatches == 0


def test_extract_text_py_twin():
    for i in [0, 17, 1017, 999, 50]:  # includes empty docs (i%1000==17)
        url, ts, html, text, lang = make_page(i)
        assert extract_text_py(html) == text


def test_empty_docs_present():
    assert make_page(17)[3] == ""
    assert make_page(1017)[3] == ""
    assert make_page(18)[3] != ""


def test_zipf_head_skew(spark):
    """The vocabulary head must dominate — this is the skew the salted
    indexer shuffle exists for (SURVEY.md §7.4(3))."""
    df = generate_pages(spark, 1000)
    tf = (
        df.filter(F.length("text") > 0)
        .select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .count()
    )
    top = tf.orderBy(F.desc("count")).limit(1).collect()[0]
    total = tf.agg(F.sum("count")).collect()[0][0]
    assert top["term"] == "term000000"
    assert top["count"] / total > 0.05  # head term carries >5% of all postings
