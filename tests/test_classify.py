"""NB quality-classifier tests: separation, prior, filter
composition, determinism, degenerate labels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.classify import (
    PRIOR_BUCKET,
    nb_score,
    nb_train,
    quality_filter,
)


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, "clean prose with real words here", 1) for i in range(20)]
    rows += [(100 + i, "buy buy click spam spam click", 0) for i in range(20)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, label int"
    )


def test_model_shape_and_prior(spark, labeled):
    model = nb_train(labeled, "label", n_buckets=128)
    assert model.count() == 129  # 128 buckets + prior row
    prior = model.filter(F.col("bucket") == PRIOR_BUCKET).first()
    # balanced classes: ln(21/21) = 0
    assert prior["w_micro"] == 0


def test_scores_separate_classes(spark, labeled):
    model = nb_train(labeled, "label", n_buckets=128)
    scored = nb_score(labeled, model, n_buckets=128)
    rows = scored.collect()
    assert len(rows) == 40
    for r in rows:
        want = 1 if r["doc_id"] < 100 else 0
        assert r["predicted"] == want, r
    # decision is the sign of the integer score
    assert all(
        (r["score_micro"] > 0) == (r["predicted"] == 1) for r in rows
    )


def test_quality_filter_keeps_positive_class(spark, labeled):
    model = nb_train(labeled, "label", n_buckets=128)
    kept = quality_filter(labeled, model, n_buckets=128)
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == set(range(20))


def test_unseen_tokens_fall_back_to_prior_plus_smoothing(spark, labeled):
    model = nb_train(labeled, "label", n_buckets=128)
    novel = spark.createDataFrame(
        [(999, "zzz qqq xxx")], "doc_id long, text string"
    )
    out = nb_score(novel, model, n_buckets=128).first()
    assert out["score_micro"] is not None


def test_single_class_corpus_still_trains(spark):
    df = spark.createDataFrame(
        [(1, "only positives here", 1), (2, "more positives", 1)],
        "doc_id long, text string, label int",
    )
    model = nb_train(df, "label", n_buckets=64)
    prior = model.filter(F.col("bucket") == PRIOR_BUCKET).first()
    assert prior["w_micro"] > 0  # ln(3/1) with add-1 docs smoothing
    out = nb_score(df, model, n_buckets=64)
    assert out.count() == 2


def test_deterministic(spark, labeled):
    model = nb_train(labeled, "label", n_buckets=128)
    a = sorted(nb_score(labeled, model, n_buckets=128).collect())
    b = sorted(nb_score(labeled, model, n_buckets=128).collect())
    assert a == b
