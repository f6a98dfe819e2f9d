"""End-to-end WET curation example: raw web archives -> parse ->
lang-id -> NB quality screen -> boilerplate removal -> near-dup
canonical -> (optional) DSIR selection."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
    ),
)

from wet_curation import curate_wet  # noqa: E402

from kafka_sparkstreaming_sbt_spark.sources.warc import (  # noqa: E402
    wet_bytes,
)

BOILER = "site nav menu login cookies banner terms privacy"
SPAM = "buy click casino buy click casino buy click casino buy"


def _clean(i):
    return (
        f"{BOILER} the story of document {i} is a tale of the sea "
        f"and of the wind and it is told in chapter {i} again"
    )


def _pages():
    pages = [(f"http://s.example/{i}", _clean(i)) for i in range(12)]
    # exact dup of page 3 and a near dup of page 4 (one token changed)
    pages.append(("http://s.example/dup3", _clean(3)))
    pages.append(
        ("http://s.example/near4", _clean(4).replace("tale", "saga"))
    )
    pages += [(f"http://s.example/spam{i}", SPAM) for i in range(3)]
    pages.append(
        ("http://s.example/es", "el cuento de la mar y de que y el")
    )
    return pages


def test_wet_curation_end_to_end(spark, tmp_path):
    (tmp_path / "seg0.warc.wet.gz").write_bytes(
        wet_bytes(_pages(), compress=True)
    )
    seed = spark.createDataFrame(
        [(i, _clean(i), 1) for i in range(90, 95)]
        + [(100 + i, SPAM, 0) for i in range(5)],
        "doc_id long, text string, label int",
    )
    out = tempfile.mkdtemp()
    report = curate_wet(
        spark, str(tmp_path), out, seed, lang="en", n_buckets=256
    )
    assert report["parsed_pages"] == len(_pages())
    # spam + es pages die before the dedup stage
    assert report["post_screen_pages"] == 14
    # the exact dup and the near dup each collapse into their group
    assert report["curated_pages"] == 12
    rows = spark.read.parquet(out).collect()
    # boilerplate chunk stripped from every surviving page
    assert all("cookies" not in r["text"] for r in rows)
    assert all(r["text"] for r in rows)
    # deterministic: rerun byte-identical
    out2 = tempfile.mkdtemp()
    report2 = curate_wet(
        spark, str(tmp_path), out2, seed, lang="en", n_buckets=256
    )
    assert {r["doc_id"] for r in rows} == {
        r["doc_id"] for r in spark.read.parquet(out2).collect()
    }
    assert report2["curated_pages"] == report["curated_pages"]


SYND = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "in spain falls mainly on the plain tonight"
)  # 19-token syndicated paragraph, shared by exactly TWO pages


def _unique_page(i):
    filler = " ".join(f"tok{i}x{j}" for j in range(14))
    return f"the report of site {i} is about {filler} and the end"


def test_wet_curation_span_excision_stage(spark, tmp_path):
    """span_window=16 excises a 19-token paragraph syndicated across
    TWO pages — below boiler_min_docs=3 (the frequency rule can't
    touch it) and at DIFFERENT offsets (the chunk grid couldn't
    align on it anyway); unique pages come through whole."""
    pages = [
        ("http://s.example/a", _unique_page(0) + " " + SYND),
        ("http://s.example/b", SYND + " " + _unique_page(1)),
    ] + [
        (f"http://s.example/{i}", _unique_page(i)) for i in range(2, 6)
    ]
    (tmp_path / "seg0.warc.wet.gz").write_bytes(
        wet_bytes(pages, compress=True)
    )
    seed = spark.createDataFrame(
        [(i, _unique_page(90 + i), 1) for i in range(5)]
        + [(100 + i, SPAM, 0) for i in range(5)],
        "doc_id long, text string, label int",
    )
    out = tempfile.mkdtemp()
    report = curate_wet(
        spark, str(tmp_path), out, seed, lang="en",
        n_buckets=256, span_window=16,
    )
    assert report["parsed_pages"] == 6
    assert report["curated_pages"] == 6  # nothing near-dups away
    rows = {r["url"]: r["text"] for r in
            spark.read.parquet(out).collect()}
    assert all("fox" not in t for t in rows.values())
    assert rows["http://s.example/a"] == _unique_page(0)
    assert rows["http://s.example/b"] == _unique_page(1)
    for i in range(2, 6):
        assert rows[f"http://s.example/{i}"] == _unique_page(i)


def test_wet_curation_with_dsir_stage(spark, tmp_path):
    (tmp_path / "seg0.warc.wet").write_bytes(wet_bytes(_pages()))
    seed = spark.createDataFrame(
        [(i, _clean(i), 1) for i in range(90, 95)]
        + [(100 + i, SPAM, 0) for i in range(5)],
        "doc_id long, text string, label int",
    )
    target = spark.createDataFrame(
        [(500 + i, _clean(500 + i)) for i in range(3)],
        "doc_id long, text string",
    )
    out = tempfile.mkdtemp()
    report = curate_wet(
        spark, str(tmp_path), out, seed, lang="en",
        target_docs=target, n_keep=5, n_buckets=256,
    )
    assert report["curated_pages"] == 5
