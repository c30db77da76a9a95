"""Thin Iceberg adapter for the stage-checkpoint layer.

The north rule words resumability as "resumable from Iceberg snapshot
checkpoints". This sandbox has no Iceberg runtime jars, so the engine's
checkpoints are parquet directories + JSON manifests with identical
semantics (`plans/pipeline.py`, `plans/beir.py`). This module is the
seam for the day the jar is on the classpath: stage commit becomes an
Iceberg snapshot (`writeTo(...).createOrReplace()`), resume becomes
read-latest-snapshot, and historical debugging gets time travel
(`VERSION AS OF`). Everything degrades loudly, never silently:
``iceberg_available`` probes the catalog, and the writers raise
``IcebergUnavailableError`` rather than quietly writing something else.

Usage (cluster with Iceberg configured):
    if iceberg_available(spark):
        commit_stage_snapshot(df, "lake.indexes.postings_v1")
    else:
        df.write.mode("overwrite").parquet(stage_dir)  # manifest path
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IcebergUnavailableError(RuntimeError):
    """Raised when an Iceberg write is requested but no Iceberg catalog
    is usable in this session (missing jars or catalog conf)."""


def iceberg_available(spark: SparkSession, catalog: str | None = None) -> bool:
    """True iff an Iceberg catalog is usable in this session.

    Probes the session conf for a ``spark.sql.catalog.<name>`` entry
    whose implementation mentions iceberg, then verifies the class
    actually loads (jars present), so a conf-without-jars cluster still
    reports False instead of failing mid-job.
    """
    conf = spark.sparkContext.getConf().getAll()
    prefix = "spark.sql.catalog."
    names = []
    for k, v in conf:
        if k.startswith(prefix) and k.count(".") == 3 and "iceberg" in v.lower():
            names.append(k[len(prefix):])
    if catalog is not None:
        names = [n for n in names if n == catalog]
    for name in names:
        try:
            spark.sql(f"SHOW NAMESPACES IN {name}").collect()
            return True
        except Exception:
            continue
    return False


def commit_stage_snapshot(
    df: DataFrame, table: str, mode: str = "replace"
) -> None:
    """Commit a stage output as one atomic Iceberg snapshot.

    ``mode``: 'replace' (stage rerun replaces the table — the manifest
    overwrite) or 'append' (incremental segments — the postings append).
    Either way the commit is a single snapshot: a killed job leaves the
    previous snapshot intact, which is exactly the manifest-file
    contract (`plans/pipeline.stage_done`) expressed in table form.
    """
    spark = df.sparkSession
    if not iceberg_available(spark, table.split(".", 1)[0] if "." in table else None):
        raise IcebergUnavailableError(
            f"no usable Iceberg catalog for {table!r}: add the iceberg-spark-runtime "
            "jar and spark.sql.catalog.* conf, or use the parquet+manifest "
            "checkpoints (plans/pipeline.py) which carry the same semantics"
        )
    writer = df.writeTo(table).using("iceberg")
    if mode == "replace":
        writer.createOrReplace()
    elif mode == "append":
        writer.append()
    else:
        raise ValueError(f"unknown mode {mode!r}: replace|append")


def read_snapshot(
    spark: SparkSession, table: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read a stage table, optionally pinned to a snapshot (resume from
    checkpoint = read the last committed snapshot; debugging = time
    travel to any earlier one)."""
    if snapshot_id is None:
        return spark.read.table(table)
    return spark.read.option("snapshot-id", str(snapshot_id)).table(table)
