"""Multimodal plumbing: schemas, mapInPandas batch shapes, decode /
feature / frame-sample stages, binary-column pruning behavior."""

from __future__ import annotations

import pytest

from kafka_sparkstreaming_sbt_spark.operators.multimodal import (
    DECODED_SCHEMA,
    FEATURE_DIM,
    FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    _decode_payload,
    decode_media,
    encode_bmp,
    encode_pgm,
    encode_ppm,
    frame_sample,
    media_features,
    media_metadata_stats,
    resize_media,
    synthetic_media,
)


def _rgb_rows(width, height):
    """Deterministic RGB test pattern."""
    return [
        [((x * 37) % 256, (y * 53) % 256, (x * y) % 256) for x in range(width)]
        for y in range(height)
    ]


def _luma_ref(rgb_rows):
    """Reference luma (integer BT.601), row-major top-to-bottom."""
    return [
        (299 * r + 587 * g + 114 * b) // 1000
        for row in rgb_rows
        for (r, g, b) in row
    ]


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
    """Compressed formats still hit the clearly-marked boundary."""
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG\r\n\x1a\n not actually decodable")


def test_decode_real_bmp_bytes():
    """A real 24-bit BMP byte payload decodes to the right dims and
    exact integer-luma pixels (incl. bottom-up row flip + row pad:
    width 5 -> 15-byte rows padded to 16)."""
    rows = _rgb_rows(5, 4)
    w, h, nf, body = _decode_payload(encode_bmp(5, 4, rows))
    assert (w, h, nf) == (5, 4, 1)
    assert list(body) == _luma_ref(rows)


def test_decode_real_ppm_and_pgm_bytes():
    rows = _rgb_rows(7, 3)
    w, h, nf, body = _decode_payload(encode_ppm(7, 3, rows))
    assert (w, h, nf) == (7, 3, 1)
    assert list(body) == _luma_ref(rows)

    gray = [[(x * 11 + y * 7) % 256 for x in range(6)] for y in range(5)]
    w, h, nf, body = _decode_payload(encode_pgm(6, 5, gray))
    assert (w, h, nf) == (6, 5, 1)
    assert list(body) == [v for row in gray for v in row]


def test_decode_netpbm_header_comments():
    """netpbm headers may hold # comments between tokens."""
    gray = [[1, 2], [3, 4]]
    raw = encode_pgm(2, 2, gray)
    commented = b"P5\n# a comment\n2 # trailing\n2\n255\n" + raw.split(b"255\n", 1)[1]
    w, h, nf, body = _decode_payload(commented)
    assert (w, h, nf) == (2, 2, 1)
    assert list(body) == [1, 2, 3, 4]


def test_decode_topdown_bmp():
    """Negative BMP height = top-down row order (no flip)."""
    rows = _rgb_rows(3, 2)
    payload = bytearray(encode_bmp(3, 2, rows))
    import struct as _s

    # rewrite height to -2 and re-order raster rows to top-down
    stride = 12  # 3px * 3B = 9, padded to 12
    raster = payload[54:]
    payload[54:] = raster[stride:] + raster[:stride]
    _s.pack_into("<i", payload, 22, -2)
    w, h, nf, body = _decode_payload(bytes(payload))
    assert (w, h, nf) == (3, 2, 1)
    assert list(body) == _luma_ref(rows)


def test_decode_paletted_bmp():
    """8-bit paletted BMP: indices resolve through the BGRA palette."""
    import struct as _s

    # 2x2, palette of 4 grays; rows pad to 4 bytes (2px -> 2B + 2 pad)
    palette = b"".join(bytes((v, v, v, 0)) for v in (0, 64, 128, 255))
    raster = bytes((0, 1, 0, 0)) + bytes((2, 3, 0, 0))  # bottom-up rows
    pixel_offset = 14 + 40 + len(palette)
    payload = (
        b"BM"
        + _s.pack("<IHHI", pixel_offset + len(raster), 0, 0, pixel_offset)
        + _s.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(raster), 0, 0, 4, 0)
        + palette
        + raster
    )
    w, h, nf, body = _decode_payload(payload)
    assert (w, h, nf) == (2, 2, 1)
    # top row was the second raster row (bottom-up): indices 2,3 then 0,1;
    # luma of pure gray v is exactly v ((299+587+114)v // 1000)
    assert list(body) == [128, 255, 0, 64]


def test_decode_media_end_to_end_on_real_formats(spark):
    """Bytes in, typed columns out, through the same mapInPandas
    stage the synthetic gate queries use (contract shape of reference
    IT:418-421's batch decode): a DataFrame mixing BMP, PPM and FAKE
    payloads decodes in one pass."""
    bmp_rows, ppm_rows = _rgb_rows(4, 4), _rgb_rows(8, 2)
    data = [
        (100, "image", bytearray(encode_bmp(4, 4, bmp_rows)),
         {"format": "bmp", "width": 4, "height": 4, "n_frames": 1}),
        (101, "image", bytearray(encode_ppm(8, 2, ppm_rows)),
         {"format": "ppm", "width": 8, "height": 2, "n_frames": 1}),
    ]
    real = spark.createDataFrame(data, MEDIA_SCHEMA)
    mixed = real.unionByName(synthetic_media(spark, 4))
    out = {r.media_id: r for r in decode_media(mixed).collect()}
    assert len(out) == 6
    assert (out[100].width, out[100].height) == (4, 4)
    exp_bmp = _luma_ref(bmp_rows)
    assert out[100].mean_intensity == pytest.approx(sum(exp_bmp) / len(exp_bmp))
    exp_ppm = _luma_ref(ppm_rows)
    assert (out[101].width, out[101].height) == (8, 2)
    assert out[101].mean_intensity == pytest.approx(sum(exp_ppm) / len(exp_ppm))
    # features stage runs over the same mixed batch
    feats = media_features(mixed).collect()
    assert len(feats) == 6 and all(len(r.features) == FEATURE_DIM for r in feats)


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


def test_frame_sample_means_match_decode_for_stills(spark):
    """A still image's only frame IS its whole raster, so frame 0's
    mean must equal decode_media's mean_intensity exactly."""
    media = synthetic_media(spark, 30)
    means = {
        r.media_id: r.frame_mean
        for r in frame_sample(media).collect()
        if r.frame_index == 0
    }
    for r in decode_media(media).collect():
        if r.n_frames == 1:
            assert means[r.media_id] == r.mean_intensity


def test_resize_nearest_neighbor_real_bmp(spark):
    """End-to-end resize of a REAL 2x2 BMP checkerboard to 4x4: each
    source pixel's luma must replicate into its 2x2 output block
    (nearest-neighbor src = dst * 2 // 4 = dst // 2)."""
    rgb = [
        [(255, 255, 255), (0, 0, 0)],
        [(0, 0, 0), (255, 255, 255)],
    ]
    payload = encode_bmp(2, 2, rgb)
    df = spark.createDataFrame(
        [(0, payload)], "media_id long, payload binary"
    )
    rows = resize_media(df, out_w=4, out_h=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.src_width, r.src_height) == (2, 2)
    white = (299 * 255 + 587 * 255 + 114 * 255) // 1000
    grid = [r.resized[i * 4 : (i + 1) * 4] for i in range(4)]
    expect = [
        [white, white, 0, 0],
        [white, white, 0, 0],
        [0, 0, white, white],
        [0, 0, white, white],
    ]
    assert grid == expect


def test_resize_video_frames_are_independent(spark):
    """frame_index selects the frame; stills are skipped when asked
    for a frame they don't have."""
    media = synthetic_media(spark, 12)
    f0 = resize_media(media, 4, 4, frame_index=0).collect()
    f2 = resize_media(media, 4, 4, frame_index=2).collect()
    assert len(f0) == 12  # every item has a frame 0
    videos = {r.media_id for r in media.collect() if r.kind == "video"}
    assert {r.media_id for r in f2} == videos
    by0 = {r.media_id: r.resized for r in f0}
    for r in f2:  # deeper frames read different byte ranges
        assert r.resized != by0[r.media_id]


def test_map_stages_add_no_shuffle(spark):
    """decode is a pure map: input partitioning must survive."""
    media = synthetic_media(spark, 32).repartition(7)
    assert decode_media(media).rdd.getNumPartitions() == 7
    assert resize_media(media, 4, 4).rdd.getNumPartitions() == 7


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


def test_decode_paletted_bmp_clrused_zero_defaults_256():
    """biClrUsed=0 means a FULL 256-entry palette per the BMP spec —
    the decoder must skip all 1024 palette bytes to find the raster,
    and high indices (>=128) must resolve; closed-form BT.601 luma."""
    import struct as _s

    # 256 entries: entry i is BGR=(i, 255-i, i//2) -> luma per _luma()
    palette = b"".join(bytes((i, 255 - i, i // 2, 0)) for i in range(256))
    # 3x1 image, indices 0 / 200 / 255; 3px row pads to 4 bytes
    raster = bytes((0, 200, 255, 0))
    pixel_offset = 14 + 40 + len(palette)
    payload = (
        b"BM"
        + _s.pack("<IHHI", pixel_offset + len(raster), 0, 0, pixel_offset)
        + _s.pack("<IiiHHIIiiII", 40, 3, 1, 1, 8, 0, len(raster), 0, 0, 0, 0)
        + palette
        + raster
    )

    def luma(i):
        r, g, b = i // 2, 255 - i, i
        return (299 * r + 587 * g + 114 * b) // 1000

    w, h, nf, body = _decode_payload(payload)
    assert (w, h, nf) == (3, 1, 1)
    assert list(body) == [luma(0), luma(200), luma(255)]
