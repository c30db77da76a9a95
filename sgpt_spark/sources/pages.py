"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Generation is fully deterministic (seed = 42 + i per doc) and distributed:
``spark.range(n)`` -> ``mapInPandas`` so a 10^12-row fixture would
generate in parallel across executors with no driver materialization.
``text`` is the extraction ground truth: byte-identical to
``extract_text(html)`` per url — the per-row invariant from input_hint.

Body terms are drawn from a 10 000-word vocabulary with a Zipf(s=1.07)
rank distribution; the Zipf head produces the term skew the salted
indexer shuffle must handle (SURVEY.md §7.4(3)). 1/1000 docs are
empty-text to exercise the empty-document filter
(reference: beir_dense_retriever.py:393-398).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from sgpt_spark.schema import PAGES

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_S = 1.07
MIN_LEN, MAX_LEN = 20, 400
BASE_TS = np.datetime64("2024-01-01T00:00:00")

_VOCAB = np.array([f"term{i:06d}" for i in range(VOCAB_SIZE)])
# Zipf(s) over ranks 1..V — cumulative distribution for inverse sampling.
_P = (1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_S)
_P /= _P.sum()
_CUM = np.cumsum(_P)


def _lang(i: int) -> str:
    m = i % 50
    return "en" if m < 45 else ("de" if m < 49 else "fr")


def _doc_terms(i: int) -> np.ndarray:
    """Zipf-distributed term indices for doc i (seed=42+i)."""
    rng = np.random.default_rng(SEED + i)
    length = int(rng.integers(MIN_LEN, MAX_LEN + 1))
    u = rng.random(length)
    return np.searchsorted(_CUM, u, side="right")


def make_page(i: int) -> tuple[str, np.datetime64, bytes, str, str]:
    """Pure function i -> page row. Driver/oracle twin of the UDF body."""
    lang = _lang(i)
    url = f"https://example.org/{lang}/doc{i:08d}"
    ts = BASE_TS + np.timedelta64(i * 17, "s")
    if i % 1000 == 17:  # deterministic empty-text docs
        title, body = "", ""
    else:
        idx = _doc_terms(i)
        title = f"doc{i:08d} " + " ".join(_VOCAB[idx[:2]])
        body = " ".join(_VOCAB[idx])
    html = (
        "<html><head><title>" + title + "</title></head><body><p>" + body
        + "</p></body></html>"
    ).encode("utf-8")
    text = "" if (not title and not body) else title + "\n" + body
    return url, ts, html, text, lang


def generate_pages(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages fixture of n_docs rows."""
    if partitions is None:
        partitions = max(1, min(256, n_docs // 2000 or 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_page(int(i)) for i in pdf["id"]]
            out = pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )
            out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES)
    )


def extract_text_py(html: bytes) -> str:
    """Pure html -> text extraction (extract-v1).

    The byte-identity contract: for every url,
    ``extract_text(html) == text`` exactly. For the fixture's HTML shape
    this is title + "\\n" + body ("" when both empty). Swap-in point for
    a real HTML parser at production; the invariant (pure, versioned,
    byte-stable) is what matters.
    """
    import re

    s = html.decode("utf-8")
    m_t = re.search(r"<title>(.*?)</title>", s, re.DOTALL)
    m_b = re.search(r"<p>(.*?)</p>", s, re.DOTALL)
    title = m_t.group(1) if m_t else ""
    body = m_b.group(1) if m_b else ""
    if not title and not body:
        return ""
    return title + "\n" + body


def with_extracted_text(pages: DataFrame, out_col: str = "extracted") -> DataFrame:
    """Adds extract_text(html) as a vectorized Arrow/pandas UDF column."""
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    @F.pandas_udf(T.StringType())
    def extract_text(html: pd.Series) -> pd.Series:
        return html.map(extract_text_py)

    return pages.withColumn(out_col, extract_text("html"))
