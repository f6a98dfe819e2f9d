"""Streaming dedup-on-ingest (streaming/ingest.py): per-micro-batch
incremental screen vs static corpus + previously accepted batches,
idempotent per-batch lake writes."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.streaming.ingest import (
    run_dedup_ingest_pipeline,
)


def _doc(i, text):
    return {"doc_id": i, "text": text}


T = {
    "c0": "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
    "u1": "kilo lima mike november oscar papa quebec romeo sierra tango",
    "u2": "uniform victor whiskey xray yankee zulu amber bronze copper dusk",
    "u3": "ember falcon garnet harbor iris jasper kestrel lagoon meadow north",
}


@pytest.fixture
def dirs():
    made = [tempfile.mkdtemp(prefix=p) for p in ("src_", "acc_", "ckpt_")]
    yield made
    for d in made:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_ingest_screens_corpus_prior_batches_and_self(
    spark, dirs
):
    src, acc, ckpt = dirs
    corpus = spark.createDataFrame(
        [(0, T["c0"])], "doc_id long, text string"
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(src)
    )
    seen = []
    q = run_dedup_ingest_pipeline(
        stream, corpus, acc, ckpt,
        on_batch=lambda bid, n, a: seen.append((n, a)),
    )
    try:
        # wave 1: corpus dup (10), two uniques (11, 12), and a
        # within-batch copy of 12's text (13 — larger id loses)
        wave1 = spark.createDataFrame(
            [(10, T["c0"]), (11, T["u1"]), (12, T["u2"]), (13, T["u2"])],
            "doc_id long, text string",
        )
        wave1.coalesce(1).write.mode("append").json(src)
        q.processAllAvailable()
        # wave 2: copy of a batch-1 SURVIVOR (20 — must be caught by
        # the accepted-so-far corpus, not the static one) + new unique
        wave2 = spark.createDataFrame(
            [(20, T["u1"]), (21, T["u3"])],
            "doc_id long, text string",
        )
        wave2.coalesce(1).write.mode("append").json(src)
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(acc)
    accepted = {r.doc_id for r in out.collect()}
    assert accepted == {11, 12, 21}
    # per-batch lake partitions carry the batch id
    assert {r.batch_id for r in out.select("batch_id").distinct().collect()} == {0, 1}
    # observability hook saw both non-empty waves with correct counts
    non_empty = [s for s in seen if s[0] > 0]
    assert non_empty == [(4, 2), (2, 1)]


def test_replay_of_a_batch_is_idempotent_and_self_blind(spark, dirs):
    """The checkpoint-replay contract: re-running batch N must (a)
    NOT screen the batch against its own half-written partition (the
    strict ``batch_id <`` exclusion — otherwise every replayed row
    would look like a dup of itself and be dropped), and (b) leave
    the lake byte-identical (per-partition overwrite)."""
    from kafka_sparkstreaming_sbt_spark.streaming.ingest import (
        screen_micro_batch,
    )

    _, acc, _ = dirs
    corpus = spark.createDataFrame(
        [(0, T["c0"])], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, T["c0"]), (11, T["u1"])], "doc_id long, text string"
    )
    n1, a1 = screen_micro_batch(batch, 0, corpus, acc)
    first = {tuple(r) for r in spark.read.parquet(acc).collect()}
    # simulate the failure-replay: same batch id, partition already on
    # disk from the first attempt
    n2, a2 = screen_micro_batch(batch, 0, corpus, acc)
    second = {tuple(r) for r in spark.read.parquet(acc).collect()}
    assert (n1, a1) == (n2, a2) == (2, 1)
    assert first == second
    assert {r.doc_id for r in spark.read.parquet(acc).collect()} == {11}


def test_streaming_ingest_with_materialized_signatures(spark, dirs):
    """The signature_dir path must produce the SAME accept/reject
    decisions as the self-contained screen while maintaining the
    banded-key lake: base table written once at start, one incr
    partition per batch holding exactly the accepted rows' keys."""
    import tempfile

    src, acc, ckpt = dirs
    sig = tempfile.mkdtemp(prefix="sig_")
    try:
        corpus = spark.createDataFrame(
            [(0, T["c0"])], "doc_id long, text string"
        )
        stream = (
            spark.readStream.schema("doc_id long, text string").json(src)
        )
        q = run_dedup_ingest_pipeline(
            stream, corpus, acc, ckpt, signature_dir=sig,
        )
        try:
            wave1 = spark.createDataFrame(
                [(10, T["c0"]), (11, T["u1"]), (12, T["u2"]), (13, T["u2"])],
                "doc_id long, text string",
            )
            wave1.coalesce(1).write.mode("append").json(src)
            q.processAllAvailable()
            wave2 = spark.createDataFrame(
                [(20, T["u1"]), (21, T["u3"])],
                "doc_id long, text string",
            )
            wave2.coalesce(1).write.mode("append").json(src)
            q.processAllAvailable()
        finally:
            q.stop()

        out = spark.read.parquet(acc)
        assert {r.doc_id for r in out.collect()} == {11, 12, 21}
        # base signatures: the static corpus's docs only
        base = spark.read.parquet(f"{sig}/base")
        assert {r.doc_id for r in base.select("doc_id").distinct().collect()} == {0}
        # incr partitions: exactly the accepted ids per batch
        incr = spark.read.parquet(f"{sig}/incr")
        by_batch = {
            (r.batch_id, r.doc_id)
            for r in incr.select("batch_id", "doc_id").distinct().collect()
        }
        assert by_batch == {(0, 11), (0, 12), (1, 21)}
    finally:
        import shutil

        shutil.rmtree(sig, ignore_errors=True)
