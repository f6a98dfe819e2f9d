"""Quality-model staleness management (streaming/ingest.py — VERDICT
r7 next-6): the NB quality model becomes a lake generation with a
mean-score baseline; score-distribution shift on the quality-accepted
slice schedules a staged retrain over corpus + accepted, swapped in
atomically, with crash recovery mirroring the quantizer protocol."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.classify import (
    nb_score,
    nb_train,
)
from kafka_sparkstreaming_sbt_spark.streaming.ingest import (
    _load_quality_generation,
    _quantizer_upto,
    materialize_quality_model,
    rebuild_quality_model,
    recover_quality_model,
    run_dedup_ingest_pipeline,
    screen_micro_batch,
)

N_BUCKETS = 256

#: three registers: A = the corpus's "good" vocabulary, SPAM = the
#: negative seed, C = a legitimate NEW register (mostly unseen
#: carbon* tokens plus a few alpha* so the old model still accepts it
#: — weakly, far below the baseline).  Token picks are quasi-random
#: (quadratic probe over a 43-token vocabulary): docs within a
#: register share vocabulary (consistent NB scores) but never 3-gram
#: shingles (no accidental near-dup kills).  The seed model trains on
#: HELD-OUT register-A docs (50..55), not the corpus itself —
#: otherwise the corpus mean-score baseline is inflated by training-
#: set memorization and an in-register wave reads as drift.
#: Measured gaps (deterministic): wave-0 2.21 nats, register-C 5.96 —
#: the 4.0 threshold splits them.
def _a_text(i):
    return " ".join(
        f"alpha{(i * 131 + 17 * j * j + j) % 43}" for j in range(12)
    )


def _c_text(i):
    carbon = [
        f"carbon{(i * 131 + 17 * j * j + j) % 43}" for j in range(8)
    ]
    alpha = [f"alpha{(i * 59 + 13 * j * j + j) % 43}" for j in range(4)]
    return " ".join(carbon + alpha)


_SPAM = "buy click spam buy click spam buy click spam buy"


@pytest.fixture
def setup(spark):
    dirs = [
        tempfile.mkdtemp(prefix=p)
        for p in ("src_", "acc_", "ckpt_", "qual_")
    ]
    corpus = spark.createDataFrame(
        [(i, _a_text(i)) for i in range(6)], "doc_id long, text string"
    )
    negatives = spark.createDataFrame(
        [(9000 + i, _SPAM + f" z{i}") for i in range(5)],
        "doc_id long, text string",
    )
    seed_pos = spark.createDataFrame(
        [(50 + i, _a_text(50 + i)) for i in range(6)],
        "doc_id long, text string",
    )
    seed = seed_pos.withColumn("label", F.lit(1)).unionByName(
        negatives.withColumn("label", F.lit(0))
    )
    model = nb_train(seed, "label", n_buckets=N_BUCKETS)
    yield dirs, corpus, negatives, model
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def test_drift_fires_retrains_and_matches_fresh_nb_train(spark, setup):
    """Injected shift: vocabulary-C batches pass the filter but score
    far from the corpus baseline -> on_quality_drift fires, the next
    trigger retrains over corpus + accepted, and the swapped-in lake
    model is value-identical to a fresh nb_train on the same
    inputs."""
    (src, acc, ckpt, qual), corpus, negatives, model = setup
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    drifts = []
    q = run_dedup_ingest_pipeline(
        stream, corpus, acc, ckpt,
        quality_model=model, quality_n_buckets=N_BUCKETS,
        quality_dir=qual, quality_negatives=negatives,
        quality_drift_nats=4.0,
        on_quality_drift=lambda bid, gap: drifts.append((bid, gap)),
    )
    try:
        # wave 0: in-register docs — near the baseline, no drift
        spark.createDataFrame(
            [(100, _a_text(100)), (101, _a_text(101))],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").json(src)
        q.processAllAvailable()
        assert drifts == []
        assert _quantizer_upto(spark, f"{qual}/current") == 0
        # wave 1: the feed shifts to vocabulary C — accepted (spam
        # model is indifferent) but the score distribution moves
        spark.createDataFrame(
            [(200 + i, _c_text(i)) for i in range(4)],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").json(src)
        q.processAllAvailable()
        assert drifts and drifts[0][0] == 1
        assert drifts[0][1] > 4.0
        # wave 2: retrain fires at trigger start (generation upto=2),
        # then the wave screens under the NEW model
        spark.createDataFrame(
            [(300, _c_text(50)), (301, _a_text(300))],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").json(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert _quantizer_upto(spark, f"{qual}/current") == 2
    accepted = {r.doc_id for r in spark.read.parquet(acc).collect()}
    assert {100, 101, 300, 301} <= accepted
    assert {200, 201, 202, 203} <= accepted  # C docs passed the filter

    # verdict parity vs a fresh nb_train on the same inputs: corpus +
    # accepted(<2) positives, the seed negatives
    pos = corpus.unionByName(
        spark.read.parquet(acc)
        .filter(F.col("batch_id") < 2)
        .select("doc_id", "text")
    )
    fresh = nb_train(
        pos.withColumn("label", F.lit(1)).unionByName(
            negatives.withColumn("label", F.lit(0))
        ),
        "label",
        n_buckets=N_BUCKETS,
    )
    lake_model, baseline = _load_quality_generation(spark, qual)
    probe = spark.createDataFrame(
        [(1, _a_text(7)), (2, _c_text(7)), (3, _SPAM + " probe")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.score_micro)
        for r in nb_score(probe, lake_model, n_buckets=N_BUCKETS).collect()
    }
    want = {
        (r.doc_id, r.score_micro)
        for r in nb_score(probe, fresh, n_buckets=N_BUCKETS).collect()
    }
    assert got == want  # integer-exact parity
    # the refreshed baseline now describes the blended corpus
    assert isinstance(baseline, float)


def test_quality_rebuild_crash_recovery_both_phases(spark, setup):
    """Staged-generation protocol: no _UPTO marker -> roll back (old
    generation intact); marker present -> roll forward."""
    import os

    (_, acc, _, qual), corpus, negatives, model = setup
    materialize_quality_model(
        corpus, qual, model, n_buckets=N_BUCKETS
    )
    old_model, old_base = _load_quality_generation(spark, qual)
    old_rows = {tuple(r) for r in old_model.collect()}

    # accept one batch so a retrain has lake content
    screen_micro_batch(
        spark.createDataFrame(
            [(100, _a_text(100))], "doc_id long, text string"
        ),
        0, corpus, acc,
    )

    # crash DURING staging: generation dir without its marker
    stale = spark.createDataFrame(
        [(0, 12345)], "bucket int, w_micro long"
    )
    stale.write.mode("overwrite").parquet(
        f"{qual}/_rebuild/upto=1/model"
    )
    recover_quality_model(spark, qual)
    assert not os.path.exists(f"{qual}/_rebuild")
    m, b = _load_quality_generation(spark, qual)
    assert {tuple(r) for r in m.collect()} == old_rows
    assert b == old_base

    # full rebuild -> commit path (marker written last by the build)
    rebuild_quality_model(
        spark, corpus, acc, negatives, qual, 1, n_buckets=N_BUCKETS
    )
    assert _quantizer_upto(spark, f"{qual}/current") == 1
    # re-running recovery is a no-op
    recover_quality_model(spark, qual)
    assert _quantizer_upto(spark, f"{qual}/current") == 1
