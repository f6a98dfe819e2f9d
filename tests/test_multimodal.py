"""Multimodal plumbing: schemas, mapInPandas batch shapes, decode /
feature / frame-sample stages, binary-column pruning behavior."""

from __future__ import annotations

import pytest

from kafka_sparkstreaming_sbt_spark.operators.multimodal import (
    DECODED_SCHEMA,
    FEATURE_DIM,
    FEATURES_SCHEMA,
    _decode_payload,
    decode_media,
    frame_sample,
    media_features,
    media_metadata_stats,
    synthetic_media,
)


def test_decode_all_rows_with_schema(spark):
    media = synthetic_media(spark, 32)
    out = decode_media(media)
    assert out.schema == DECODED_SCHEMA
    rows = out.collect()
    assert len(rows) == 32
    assert all(r.width > 0 and r.height > 0 for r in rows)
    assert all(0.0 <= r.mean_intensity <= 255.0 for r in rows)


def test_decode_is_deterministic(spark):
    a = sorted(decode_media(synthetic_media(spark, 16)).collect())
    b = sorted(decode_media(synthetic_media(spark, 16)).collect())
    assert a == b


def test_decode_stub_boundary_is_explicit():
    """Non-synthetic payloads hit the clearly-marked stub."""
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG\r\n\x1a\n not actually decodable")


def test_features_shape(spark):
    out = media_features(synthetic_media(spark, 16))
    assert out.schema == FEATURES_SCHEMA
    rows = out.collect()
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    for r in rows:
        assert abs(sum(r.features) - 1.0) < 1e-9  # normalized histogram


def test_frame_sample_videos_expand(spark):
    media = synthetic_media(spark, 30)
    sampled = frame_sample(media, every_k=2)
    rows = sampled.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_index)
    kinds = {r.media_id: r.kind for r in media.select("media_id", "kind").collect()}
    for mid, frames in by_media.items():
        if kinds[mid] == "video":  # 3 frames, keep 0 and 2
            assert sorted(frames) == [0, 2]
        else:  # single frame image
            assert frames == [0]


def test_map_stages_add_no_shuffle(spark):
    """decode is a pure map: input partitioning must survive."""
    media = synthetic_media(spark, 32).repartition(7)
    assert decode_media(media).rdd.getNumPartitions() == 7


def test_metadata_stats_prune_payload(spark, tmp_path):
    """Metadata aggregation over a parquet-backed media table never
    reads the payload column: the physical scan's ReadSchema excludes
    the binary bytes (the point of the payload/meta split at 100 TB).
    Also pins the binary+struct parquet round-trip."""
    path = str(tmp_path / "media.parquet")
    synthetic_media(spark, 32).write.parquet(path)
    media = spark.read.parquet(path)
    stats = media_metadata_stats(media)
    physical = stats._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in physical.splitlines() if "ReadSchema" in l]
    assert scan_lines and all("payload" not in l for l in scan_lines)
    rows = {r.kind: r for r in stats.collect()}
    assert set(rows) == {"image", "video"}
    assert rows["video"].total_frames == rows["video"].n_items * 3
