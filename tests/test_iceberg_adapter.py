"""Iceberg adapter: loud degradation without jars, real snapshot write
when a catalog exists (skipped here — no Iceberg runtime in the sandbox)."""

from __future__ import annotations

import pytest

from sgpt_spark.sources.iceberg import (
    IcebergUnavailableError,
    commit_stage_snapshot,
    iceberg_available,
)


def test_unavailable_is_detected_and_loud(spark):
    df = spark.range(3)
    if iceberg_available(spark):
        pytest.skip("Iceberg catalog present — covered by the live path")
    with pytest.raises(IcebergUnavailableError, match="manifest"):
        commit_stage_snapshot(df, "lake.db.t")


def test_bad_mode_rejected_before_probe(spark):
    # mode validation must not depend on catalog availability
    with pytest.raises((IcebergUnavailableError, ValueError)):
        commit_stage_snapshot(spark.range(1), "lake.db.t", mode="merge")


def test_live_snapshot_roundtrip_if_catalog(spark):
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jars in this environment (declared)")
    commit_stage_snapshot(spark.range(5).toDF("v"), "lake.tmp.sgpt_t", mode="replace")
    from sgpt_spark.sources.iceberg import read_snapshot

    assert read_snapshot(spark, "lake.tmp.sgpt_t").count() == 5
