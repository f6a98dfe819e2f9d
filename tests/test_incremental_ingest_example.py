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
