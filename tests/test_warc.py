"""WARC/WET source tests: byte-level round trip (plain + gzip),
binaryFile-based read_wet, dead-letter on corruption."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.sources.warc import (
    iter_warc_records,
    parse_warc_records,
    read_wet,
    wet_bytes,
)

RECS = [
    ("http://a.example/1", "hello world"),
    ("http://a.example/2", "unicode snowman ☃ body"),
    ("http://a.example/3", ""),
]


@pytest.mark.parametrize("compress", [False, True])
def test_iter_roundtrip(compress):
    data = wet_bytes(RECS, compress=compress)
    out = list(iter_warc_records(data))
    assert [r["error"] for r in out] == [None] * 3
    assert [r["target_uri"] for r in out] == [u for u, _ in RECS]
    got = [r["body"].decode("utf-8") for r in out]
    assert got == [t for _, t in RECS]
    # Content-Length is the utf-8 BYTE length, not the char count
    assert out[1]["content_length"] == len(RECS[1][1].encode("utf-8"))


def test_read_wet_from_files(spark, tmp_path):
    for i, compress in enumerate([False, True]):
        ext = "warc.wet.gz" if compress else "warc.wet"
        (tmp_path / f"seg{i}.{ext}").write_bytes(
            wet_bytes(RECS, compress=compress)
        )
    out = read_wet(spark, str(tmp_path)).collect()
    assert len(out) == 6  # both segments parse
    urls = sorted({r["url"] for r in out})
    assert urls == sorted(u for u, _ in RECS)
    by_url = {(r["path"], r["url"]): r["text"] for r in out}
    assert len(by_url) == 6


def test_truncated_body_dead_letters(spark):
    data = wet_bytes(RECS)[:-20]  # cut into the last record's body
    rows = list(iter_warc_records(data))
    assert rows[-1]["error"] is not None
    assert len([r for r in rows if r["error"] is None]) == 2
    df = spark.createDataFrame(
        [("mem://bad", bytearray(data))], "path string, content binary"
    )
    parsed = parse_warc_records(df)
    assert parsed.filter(F.col("error").isNotNull()).count() == 1
    ok = parsed.filter(F.col("error").isNull())
    assert ok.count() == 2


def test_bad_gzip_and_bad_version_dead_letter():
    assert list(iter_warc_records(b"\x1f\x8bnot-really-gzip"))[0][
        "error"
    ].startswith("gzip")
    bad = b"HTTP/1.1 200 OK\r\n\r\n"
    assert "version" in list(iter_warc_records(bad))[0]["error"]


def test_non_conversion_records_filtered(spark, tmp_path):
    # splice a warcinfo record in front: read_wet must skip it
    info = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n"
    )
    (tmp_path / "seg.warc.wet").write_bytes(info + wet_bytes(RECS))
    out = read_wet(spark, str(tmp_path)).collect()
    assert len(out) == 3
    assert all(r["url"] for r in out)
