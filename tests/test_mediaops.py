"""Multimodal column plumbing: schemas, determinism, stub gating."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from docling_core_spark.engine import synth_documents
from docling_core_spark.mediaops import (
    extract_media_features,
    media_feature_stats,
    media_table,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = synth_documents(spark, 30, seed=42)
    m = media_table(docs)
    m.cache().count()
    return m


def test_media_table_shape(media):
    rows = media.collect()
    assert rows
    assert {r["kind"] for r in rows} <= {"image", "audio", "video"}
    for r in rows[:10]:
        assert r["n_bytes"] == len(r["payload"])
        assert 256 <= r["n_bytes"] <= 16384
    # refs unique
    assert media.select("media_ref").distinct().count() == len(rows)


def test_features_deterministic(media):
    f1 = sorted(map(tuple, extract_media_features(media).collect()))
    f2 = sorted(map(tuple, extract_media_features(media).collect()))
    assert f1 == f2
    assert len(f1) == media.count()


def test_feature_schema_typed(media):
    feats = extract_media_features(media)
    by_kind = {r["kind"]: r for r in feats.collect()}
    if "image" in by_kind:
        r = by_kind["image"]
        assert r["width"] % 16 == 0 and r["height"] % 16 == 0
        assert r["n_frames"] is None and r["duration_s"] is None
    if "audio" in by_kind:
        r = by_kind["audio"]
        assert r["width"] is None and r["duration_s"] > 0
    if "video" in by_kind:
        r = by_kind["video"]
        assert r["n_frames"] % 30 == 0
        assert abs(r["duration_s"] - r["n_frames"] / 30.0) < 1e-9
    assert feats.filter(F.col("phash16") < 0).count() == 0


def test_real_decode_is_gated(media):
    with pytest.raises(NotImplementedError):
        resize_images(media, 224, 224, decode="real")
    with pytest.raises(NotImplementedError):
        sample_frames(media, decode="real")
    with pytest.raises(Exception):
        extract_media_features(media, decode="real").collect()


def test_resize_and_frames(media):
    resized = resize_images(media, 224, 224).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(resized) == n_images
    assert all(r["width"] == 224 and len(r["payload"]) == 64
               for r in resized)

    frames = sample_frames(media, every_n=30)
    n_videos = media.filter(F.col("kind") == "video").count()
    if n_videos:
        per_ref = frames.groupBy("media_ref").count().collect()
        assert len(per_ref) == n_videos
        assert all(r["count"] >= 1 for r in per_ref)


def test_stats_rollup(spark):
    docs = synth_documents(spark, 30, seed=42)
    stats = media_feature_stats(docs).collect()
    assert stats
    assert sum(r["n_items"] for r in stats) > 0
