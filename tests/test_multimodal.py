"""Multimodal plumbing: schemas, batch shapes, determinism. Decoders are
stubs by design (no codec libs in the container) — the tests pin the
Spark-side contract a real decoder drops into."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.multimodal import (
    audio_stats,
    generate_media,
    image_features,
    resize_images,
    sample_video_frames,
)

N = 90


@pytest.fixture(scope="module")
def media(spark):
    df = generate_media(spark, N, partitions=3)
    df.persist().count()
    return df


def test_generate_media_deterministic(spark):
    a = sorted(generate_media(spark, 30, partitions=1).drop("payload").collect())
    b = sorted(generate_media(spark, 30, partitions=5).drop("payload").collect())
    assert a == b


def test_image_features(spark, media):
    feats = image_features(media, feature_dim=16).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(feats) == n_images > 0
    for r in feats:
        assert len(r["feature"]) == 16
        assert abs(sum(r["feature"]) - 1.0) < 1e-5  # normalized histogram
        assert 0.0 <= r["mean_luma"] <= 255.0
    # feature is a pure function of the payload: recompute one row
    row = media.filter(F.col("kind") == "image").limit(1).collect()[0]
    got = [r for r in feats if r["media_id"] == row["media_id"]][0]
    assert got["sha256"] == hashlib.sha256(bytes(row["payload"])).hexdigest()
    assert got["n_bytes"] == len(bytes(row["payload"]))


def test_resize_payload_shape(spark, media):
    out = resize_images(media, out_w=8, out_h=6).collect()
    assert len(out) == media.filter(F.col("kind") == "image").count()
    for r in out:
        assert len(bytes(r["payload"])) == 8 * 6
        assert (r["width"], r["height"]) == (8, 6)


def test_audio_stats(spark, media):
    stats = audio_stats(media).collect()
    assert len(stats) == media.filter(F.col("kind") == "audio").count() > 0
    for r in stats:
        assert r["n_samples"] == 16000
        assert 0.0 < r["rms"] < 1.0


def test_video_frame_sampling(spark, media):
    frames = sample_video_frames(media, every_ms=1000).collect()
    vids = {r["media_id"]: r["duration_ms"] for r in
            media.filter(F.col("kind") == "video").collect()}
    by_vid: dict = {}
    for r in frames:
        by_vid.setdefault(r["media_id"], []).append(r)
    assert set(by_vid) == set(vids)
    for mid, rows in by_vid.items():
        assert len(rows) == max(vids[mid] // 1000, 1)
        assert sorted(r["frame_idx"] for r in rows) == list(range(len(rows)))


def test_metadata_only_plan_prunes_payload(spark, media):
    """Counting by kind must not read the payload column — check the
    optimized plan only touches the pruned schema."""
    pq_path = "/tmp/sgpt_media_test.parquet"
    media.write.mode("overwrite").parquet(pq_path)
    df = spark.read.parquet(pq_path).groupBy("kind").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
