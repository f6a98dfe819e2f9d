"""DSIR importance-resampling tests: weight direction, determinism,
smoothing degradation, and the Gumbel-top-k contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.dsir import (
    bucket_log_ratio,
    dsir_log_weights,
    dsir_select,
    hashed_ngram_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpora(spark):
    # target domain: 'alpha beta' language; off-domain: 'zig zag'
    target = _docs(
        spark,
        [(100 + i, "alpha beta gamma alpha beta") for i in range(5)],
    )
    raw = _docs(
        spark,
        [(i, "alpha beta gamma delta") for i in range(10)]
        + [(i, "zig zag zog zug") for i in range(10, 30)],
    )
    return raw, target


def test_feature_buckets_in_range(spark, corpora):
    raw, _ = corpora
    feats = hashed_ngram_counts(raw, n_buckets=64)
    bad = feats.filter(
        (F.col("bucket") < 0) | (F.col("bucket") >= 64)
    ).count()
    assert bad == 0
    # a 4-token doc carries 4 unigrams + 3 bigrams = 7 n-grams
    tot = (
        feats.groupBy("doc_id")
        .agg(F.sum("cnt").alias("n"))
        .agg(F.min("n"), F.max("n"))
        .first()
    )
    assert tot[0] == 7 and tot[1] == 7


def test_weights_rank_target_like_docs_first(spark, corpora):
    raw, target = corpora
    rf = hashed_ngram_counts(raw, n_buckets=256)
    tf = hashed_ngram_counts(target, n_buckets=256)
    w = dsir_log_weights(rf, bucket_log_ratio(tf, rf, 256))
    rows = {r["doc_id"]: r["log_weight"] for r in w.collect()}
    assert len(rows) == 30
    on_domain = [rows[i] for i in range(10)]
    off_domain = [rows[i] for i in range(10, 30)]
    assert min(on_domain) > max(off_domain)


def test_select_is_deterministic_and_sized(spark, corpora):
    raw, target = corpora
    a = dsir_select(raw, target, 8, n_buckets=256).collect()
    b = dsir_select(raw, target, 8, n_buckets=256).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 8
    # selection is weight-proportional: the 10 on-domain docs should
    # dominate an 8-slot draw given the weight gap this corpus has
    on = sum(1 for r in a if r["doc_id"] < 10)
    assert on >= 6


def test_empty_target_degrades_to_gumbel_only(spark, corpora):
    raw, target = corpora
    empty = target.filter(F.lit(False))
    out = dsir_select(raw, empty, 5, n_buckets=256)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["sel_micro"] is not None for r in rows)


def test_validation(spark, corpora):
    raw, target = corpora
    with pytest.raises(ValueError, match="n_keep"):
        dsir_select(raw, target, 0)
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_ngram_counts(raw, n_buckets=1)


def test_single_token_docs_have_no_bigrams(spark):
    df = _docs(spark, [(1, "solo")])
    feats = hashed_ngram_counts(df, n_buckets=32)
    assert feats.agg(F.sum("cnt")).first()[0] == 1
