"""Deterministic sampling/splitting: stability across invocations,
partitioning, and approximate rate."""

from __future__ import annotations

from kafka_sparkstreaming_sbt_spark.operators.sampling import (
    deterministic_sample,
    with_split,
)


def test_sample_is_stable_and_partition_independent(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in deterministic_sample(df, "doc_id", 2).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(
            df.repartition(17), "doc_id", 2
        ).collect()
    }
    assert a == b
    # ~2/16 = 12.5%, loose tolerance
    assert 0.08 < len(a) / 2000 < 0.18


def test_split_partitions_everything_once(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = with_split(df, "doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").count()
              .withColumnRenamed("count", "n").collect()}
    assert sum(counts.values()) == 1000
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] > counts["valid"] > 0
    # splits are disjoint by construction (single CASE); stability:
    again = {(r.doc_id, r.split) for r in out.collect()}
    assert again == {(r.doc_id, r.split) for r in with_split(df, "doc_id").collect()}


def test_sample_is_subset_of_train_like_buckets(spark):
    # nibble < 2 sample is exactly the first two buckets of the split
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    sample = {r.doc_id for r in deterministic_sample(df, "doc_id", 2).collect()}
    train = {
        r.doc_id
        for r in with_split(df, "doc_id").filter("split = 'train'").collect()
    }
    assert sample <= train  # nibble<2 implies nibble<13


def test_stratified_sample_per_group_independent(spark, sf_small):
    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        stratified_sample,
    )
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_small, "documents")
    picked = stratified_sample(docs, "lang", "doc_id", sixteenths=2)
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sampled = {r.lang: r.n for r in picked.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # every stratum drawn at roughly 2/16 = 12.5% (loose bounds; small strata noisy)
    for lang, total in totals.items():
        frac = sampled.get(lang, 0) / total
        assert 0.0 <= frac <= 0.35, (lang, frac, total)
    # deterministic: identical on rerun
    again = {r.doc_id for r in stratified_sample(docs, "lang", "doc_id", 2).select("doc_id").collect()}
    assert {r.doc_id for r in picked.select("doc_id").collect()} == again
