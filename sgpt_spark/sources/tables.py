"""Parquet scans over the driver test tables.

Replaces the reference's eager whole-file loaders
(``GenericDataLoader(data_path).load(split)``,
/root/reference/biencoder/beir/beir_dense_retriever.py:388-390) with lazy
columnar scans — Catalyst prunes columns and pushes filters into the
parquet reader, which at 100 TB is the difference between reading the
whole corpus and reading two columns of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
