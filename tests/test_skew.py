"""Salted join / salted aggregation: result equivalence with the
plain operators on skewed data, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.skew import (
    salted_join,
    salted_sum,
)


def _skewed_df(spark, n=10_000):
    # 90% of rows share key 1; the rest spread over 100 keys
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise((F.col("id") % 100) + 2)
        .alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    left = _skewed_df(spark)
    right = spark.range(120).select(
        (F.col("id") + 1).alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = left.join(right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    salted = salted_join(left, right, "k", buckets=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k long, tag string")
    right = spark.createDataFrame([(1, 10)], "k long, w long")
    out = salted_join(left, right, "k", buckets=4, how="left").collect()
    got = {(r.k, r.tag, r.w) for r in out}
    assert got == {(1, "a", 10), (99, "b", None)}


def test_salted_sum_matches_plain_sum(spark):
    df = _skewed_df(spark)
    plain = {
        r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    salted = {
        r.k: r.sum_v for r in salted_sum(df, ["k"], "v", buckets=8).collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert abs(salted[k] - plain[k]) < 1e-9


def test_salted_join_spreads_hot_key(spark):
    left = _skewed_df(spark)
    right = spark.range(5).select((F.col("id") + 1).alias("k"))
    salted = salted_join(left, right, "k", buckets=8)
    # the physical join key includes the salt column
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_salted_join_rejects_outer_accepts_spellings(spark):
    left = spark.createDataFrame([(1, "a")], "k long, tag string")
    right = spark.createDataFrame([(1, 10)], "k long, w long")
    import pytest

    for bad in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError):
            salted_join(left, right, "k", how=bad)
    # every Spark-accepted spelling of the safe types passes
    for ok in ("inner", "left", "left_outer", "leftouter", "LEFT_OUTER"):
        assert salted_join(left, right, "k", buckets=2, how=ok).count() == 1


def test_salted_join_salt_on_deterministic_under_repartition(spark):
    """With salt_on, the salt derives from row CONTENT (xxhash64), so
    the same rows route identically no matter how the input is
    partitioned — task retries and different cluster layouts produce
    bit-identical routing (seeded rand only pins a fixed
    partitioning)."""
    left = _skewed_df(spark).withColumn(
        "rid", F.monotonically_increasing_id()
    )
    # freeze rid values so both layouts hold identical rows
    rows = left.collect()
    frozen = spark.createDataFrame(rows, left.schema)
    right = spark.range(120).select(
        (F.col("id") + 1).alias("k"), (F.col("id") * 10).alias("w")
    )

    def run(df):
        out = salted_join(df, right, "k", buckets=8, salt_on="rid")
        return sorted((r.k, r.rid, r.w) for r in out.collect())

    assert run(frozen.repartition(3)) == run(frozen.repartition(17))


def test_key_skew_report_finds_the_hot_key(spark):
    from kafka_sparkstreaming_sbt_spark.operators.skew import (
        key_skew_report,
    )

    rows = [("hot", i) for i in range(60)] + [
        (f"u{i % 4}", i) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "user_id string, v long")
    rep = key_skew_report(df, "user_id", top_n=3).orderBy("rank").collect()
    assert rep[0].user_id == "hot"
    assert rep[0].n_rows == 60 and rep[0].share == 0.6
    assert len(rep) == 3 and rep[0].rank == 1
    # ties among u0..u3 (10 rows each) break by ascending key
    assert [r.user_id for r in rep[1:]] == ["u0", "u1"]


def test_key_skew_report_validates_inputs(spark):
    import pytest as _pytest

    from kafka_sparkstreaming_sbt_spark.operators.skew import (
        key_skew_report,
    )

    df = spark.createDataFrame([("a", 1)], "user_id string, v long")
    with _pytest.raises(ValueError):
        key_skew_report(df, [], top_n=3)
    with _pytest.raises(ValueError):
        key_skew_report(df, "user_id", top_n=0)
