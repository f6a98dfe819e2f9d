"""Multimodal column plumbing (extension surface, SURVEY.md §7.2
step 6): image/audio/video as opaque ``binary`` columns with typed
metadata structs, processed by Arrow-batched ``mapInPandas`` stages.

The REAL parts (tested, scale-honest):
- schema: ``payload: binary`` + ``meta: struct<...>`` — the layout a
  100 TB multimodal lake uses (payload stays a byte blob through the
  scan; metadata prunes without touching bytes)
- partition discipline: decode/resize/feature stages are per-row maps
  via ``mapInPandas`` — no shuffle, preserve partitioning, Arrow
  batch transfer
- UDF signatures and output schemas

The STUBBED part: actual codec work.  This container ships no
image/audio libraries, so payloads use a deterministic synthetic
format (``FAKE`` header + dims + raw bytes) and ``decode_media``
parses that; a real deployment swaps ``_decode_payload`` for
PIL/ffmpeg while every schema/batching contract stays identical.
Attempting to decode a payload that is not in the synthetic format
raises ``NotImplementedError`` (clearly marked stub boundary).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FAKE"

#: Typed metadata carried alongside the opaque payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
    ]
)

FEATURE_DIM = 16
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField(
            "features", T.ArrayType(T.DoubleType()), True
        ),
    ]
)


def _encode_payload(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Synthetic payload: MAGIC + dims + deterministic pixel bytes."""
    header = MAGIC + struct.pack("<iii", width, height, n_frames)
    n = width * height * n_frames
    body = bytes((seed * 31 + i * 7) % 256 for i in range(min(n, 4096)))
    return header + body


def _decode_payload(payload: bytes) -> tuple[int, int, int, bytes]:
    """STUB BOUNDARY: replace with PIL/ffmpeg in a real deployment."""
    if payload is None or payload[:4] != MAGIC:
        raise NotImplementedError(
            "real codec decode not available in this environment; "
            "payload is not in the synthetic FAKE format"
        )
    width, height, n_frames = struct.unpack("<iii", payload[4:16])
    return width, height, n_frames, payload[16:]


def synthetic_media(
    spark: SparkSession, n: int = 64, partitions: int = 2
) -> DataFrame:
    """Deterministic synthetic media table in MEDIA_SCHEMA (images and
    3-frame 'videos' alternating).

    Generated distributed — ``spark.range`` ids -> per-partition
    payload encoding via ``mapInPandas`` — never materialized on the
    driver, so the same generator scales to any n."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                kind = "video" if i % 3 == 0 else "image"
                w, h = 8 + (i % 5) * 4, 8 + (i % 7) * 2
                frames = 3 if kind == "video" else 1
                rows["media_id"].append(i)
                rows["kind"].append(kind)
                rows["payload"].append(_encode_payload(w, h, frames, seed=i))
                rows["meta"].append(
                    {
                        "format": "fake",
                        "width": w,
                        "height": h,
                        "n_frames": frames,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n, numPartitions=partitions).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Decode stage: per-row map over Arrow batches (``mapInPandas``),
    no shuffle, partitioning preserved.  Output: dims + mean pixel
    intensity per media item."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "n_frames": [],
                "mean_intensity": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, nf, body = _decode_payload(bytes(payload))
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["mean_intensity"].append(
                    float(sum(body)) / len(body) if body else 0.0
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        _decode, DECODED_SCHEMA
    )


def media_features(df: DataFrame) -> DataFrame:
    """Feature-extraction stage: 16-bin byte histogram (the stand-in
    for a real embedding model), Arrow-batched, shuffle-free."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, _, body = _decode_payload(bytes(payload))
                hist = [0.0] * FEATURE_DIM
                for b in body:
                    hist[b * FEATURE_DIM // 256] += 1.0
                total = sum(hist) or 1.0
                ids.append(mid)
                feats.append([v / total for v in hist])
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return df.select("media_id", "payload").mapInPandas(
        _feats, FEATURES_SCHEMA
    )


def frame_sample(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video payloads: emits one row per kept frame
    (frame indices 0, k, 2k, ...) with the frame's byte slice — a
    generator-style map (row count grows, still no shuffle)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, nf, body = _decode_payload(bytes(payload))
                frame_sz = max(1, len(body) // max(nf, 1))
                for fi in range(0, nf, every_k):
                    ids.append(mid)
                    frames.append(fi)
                    blobs.append(body[fi * frame_sz : (fi + 1) * frame_sz])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": frames, "frame": blobs}
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )
    return df.select("media_id", "payload").mapInPandas(_sample, schema)


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — never touches payload bytes, so the
    parquet scan prunes the binary column entirely (the point of the
    payload/meta split at 100 TB)."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.avg(F.col("meta.width") * F.col("meta.height")).alias(
                "avg_pixels"
            ),
            F.sum("meta.n_frames").alias("total_frames"),
        )
    )
