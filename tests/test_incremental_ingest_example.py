"""The daily-ingest example (examples/incremental_ingest.py) composes
BOTH incremental screens; pin its contract: one auditable verdict per
batch doc, screens agree with their underlying operators, thresholds
off -> everything accepted, deterministic."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from incremental_ingest import screen_batch  # noqa: E402

from kafka_sparkstreaming_sbt_spark.sources.batch import (  # noqa: E402
    read_table,
)


def _tables(spark, sf_small, k=350):
    docs = read_table(spark, sf_small, "documents")
    emb = read_table(spark, sf_small, "embeddings")
    return (
        docs.filter(F.col("doc_id") < k),
        docs.filter(F.col("doc_id") >= k),
        emb.filter(F.col("vec_id") < k),
        emb.filter(F.col("vec_id") >= k),
    )


def test_screen_batch_verdicts_and_report(spark, sf_small):
    cd, bd, ce, be = _tables(spark, sf_small)
    verdicts, report = screen_batch(
        spark, cd, bd, ce, be,
        jaccard_threshold=0.5, semantic_threshold=0.4,
    )
    rows = verdicts.collect()
    # one verdict per batch doc, consistent bookkeeping
    assert len(rows) == bd.count() == report["batch_docs"]
    assert report["accepted"] == sum(1 for r in rows if r.accepted)
    for r in rows:
        assert r.accepted == (not r.textual_dup and not r.semantic_dup)
    # the planted near-dups make both screens fire on this corpus
    assert report["textual_dups"] > 0
    assert report["semantic_dups"] > 0
    assert 0 < report["accepted"] < report["batch_docs"]
    # deterministic: byte-identical verdicts on a re-run
    again, _ = screen_batch(
        spark, cd, bd, ce, be,
        jaccard_threshold=0.5, semantic_threshold=0.4,
    )
    assert {tuple(r) for r in rows} == {tuple(r) for r in again.collect()}


def test_screen_batch_semantic_off_accepts_more(spark, sf_small):
    cd, bd, ce, be = _tables(spark, sf_small)
    _, with_sem = screen_batch(
        spark, cd, bd, ce, be,
        jaccard_threshold=0.5, semantic_threshold=0.4,
    )
    _, without = screen_batch(
        spark, cd, bd, jaccard_threshold=0.5, semantic_threshold=None,
    )
    assert without["semantic_dups"] == 0
    assert without["accepted"] >= with_sem["accepted"]


def test_batch_drift_report_clean_and_broken_feed(spark, sf_small):
    from incremental_ingest import batch_drift_report

    docs = read_table(spark, sf_small, "documents")
    corpus = docs.filter(F.col("doc_id") < 350)
    batch = docs.filter(F.col("doc_id") >= 350)
    clean = batch_drift_report(corpus, batch)
    # a healthy batch: no schema/null/distinct alarms; the id range
    # legitimately extends (reported, not alarmed)
    assert clean["drift_alarms"] == 0
    assert clean["range_shifts"] >= 1

    broken = batch.withColumn(
        "lang",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(
            F.col("lang")
        ),
    ).withColumn("source", F.lit("onefeed"))
    rep = batch_drift_report(corpus, broken)
    assert rep["drift_alarms"] >= 2
    assert any("lang:null_jump" == d for d in rep["drift_detail"])
    assert any(
        "source:distinct_collapse" == d for d in rep["drift_detail"]
    )


def test_screen_batch_span_stage_excises_and_flags(spark):
    """--span-window: a corpus span inside fresh batch text is excised
    (doc still accepted, on its CLEANED text), a batch doc that IS a
    corpus span empties out and is rejected as span_emptied, and the
    report carries the excision accounting."""
    corpus = spark.createDataFrame(
        [
            (0, "s1 s2 s3 s4 c1 c2 c3 c4"),
            (1, "q1 q2 q3 q4 q5 q6 q7 q8"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, "x1 x2 s1 s2 s3 s4 y1 y2"),  # span excised, accepted
            (101, "s1 s2 s3 s4 c1 c2 c3 c4"),  # all corpus spans -> emptied
            (102, "m1 m2 m3 m4 m5 m6 m7 m8"),  # untouched
        ],
        "doc_id long, text string",
    )
    verdicts, report = screen_batch(
        spark, corpus, batch,
        jaccard_threshold=0.5, semantic_threshold=None, span_window=4,
    )
    rows = {r.doc_id: r for r in verdicts.collect()}
    assert len(rows) == 3 == report["batch_docs"]
    assert report["span_excised_docs"] == 2  # 100 and 101
    assert report["span_emptied_docs"] == 1
    assert report["span_tokens_removed"] == 4 + 8
    assert rows[100].accepted and not rows[100].span_emptied
    assert rows[101].span_emptied and not rows[101].accepted
    assert rows[102].accepted
    # without the span stage, doc 101 dies at the textual screen
    # instead (it IS a corpus doc) and 100 survives with its span
    _, plain = screen_batch(
        spark, corpus, batch,
        jaccard_threshold=0.5, semantic_threshold=None,
    )
    assert "span_excised_docs" not in plain
    assert plain["textual_dups"] >= 1
