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


def test_weighted_sample_rate_tracks_weight(spark):
    from pyspark.sql import functions as F

    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(4000).select(
        F.col("id").cast("string").alias("rid"),
        (F.col("id") % 4).cast("double").alias("w"),
    )
    picked = weighted_sample(df, "rid", "w", max_weight=4.0)
    rates = {
        r.w: r.n
        for r in picked.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # weight 0 -> probability 0; rate roughly proportional to weight
    assert 0.0 not in rates
    assert 0.15 < rates[1.0] / 1000 < 0.35  # ~0.25
    assert 0.65 < rates[3.0] / 1000 < 0.85  # ~0.75
    assert rates[1.0] < rates[2.0] < rates[3.0]
    # deterministic under repartitioning
    a = {r.rid for r in picked.collect()}
    b = {
        r.rid
        for r in weighted_sample(
            df.repartition(13), "rid", "w", max_weight=4.0
        ).collect()
    }
    assert a == b


def test_weighted_sample_monotone_in_weight(spark):
    # raising a row's weight can only ADD it to the sample, never
    # evict it (byte stays fixed, the threshold grows)
    from pyspark.sql import functions as F

    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        weighted_sample,
    )

    base = spark.range(1500).select(
        F.col("id").cast("string").alias("rid")
    )
    low = {
        r.rid
        for r in weighted_sample(
            base.withColumn("w", F.lit(1.0)), "rid", "w", 4.0
        ).collect()
    }
    high = {
        r.rid
        for r in weighted_sample(
            base.withColumn("w", F.lit(3.0)), "rid", "w", 4.0
        ).collect()
    }
    assert low <= high


def test_scd2_history_contract(spark):
    from kafka_sparkstreaming_sbt_spark.operators.cdc import scd2_history

    rows = [
        # user A: a -> a -> b -> a  (3 runs)
        ("A", 1, 1, "a"),
        ("A", 2, 2, "a"),
        ("A", 3, 3, "b"),
        ("A", 5, 4, "a"),
        # user B: single run
        ("B", 1, 5, "x"),
        ("B", 9, 6, "x"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "state0"])
    out = scd2_history(df, ["user_id"], "ts", "state0", tie_break="event_id")
    got = {
        (r.user_id, r.state, r.valid_from, r.valid_to, r.is_current, r.version)
        for r in out.collect()
    }
    assert got == {
        ("A", "a", 1, 3, 0, 1),
        ("A", "b", 3, 5, 0, 2),
        ("A", "a", 5, None, 1, 3),
        ("B", "x", 1, None, 1, 1),
    }
    # exactly one current row per key; intervals are contiguous
    assert sum(1 for g in got if g[4] == 1 and g[0] == "A") == 1


def test_scd2_history_null_states(spark):
    """Null-safe change detection (ADVICE r3): a transition TO NULL
    opens a version, a NULL->NULL run stays ONE version, and the row
    after a NULL run does not open a spurious version when the value
    returns to the pre-NULL state via a real change."""
    from kafka_sparkstreaming_sbt_spark.operators.cdc import scd2_history

    rows = [
        # a -> NULL -> NULL -> a : three runs (a | NULL | a)
        ("A", 1, 1, "a"),
        ("A", 2, 2, None),
        ("A", 3, 3, None),
        ("A", 4, 4, "a"),
        # user starting at NULL: NULL is a real first state
        ("B", 1, 5, None),
        ("B", 2, 6, "x"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts int, event_id int, state0 string")
    out = scd2_history(df, ["user_id"], "ts", "state0", tie_break="event_id")
    got = {
        (r.user_id, r.state, r.valid_from, r.valid_to, r.is_current, r.version)
        for r in out.collect()
    }
    assert got == {
        ("A", "a", 1, 2, 0, 1),
        ("A", None, 2, 4, 0, 2),
        ("A", "a", 4, None, 1, 3),
        ("B", None, 1, 2, 0, 1),
        ("B", "x", 2, None, 1, 2),
    }


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


def test_sample_k_per_group_exact_count_and_stable(spark):
    """Every group yields min(k, |group|) rows; the selection is
    invariant under repartitioning (no RNG, no order dependence)."""
    from pyspark.sql import functions as F

    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        sample_k_per_group,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(100)] + [(1000, "tiny")],
        ["id", "grp"],
    )
    out = sample_k_per_group(df, "grp", "id", k=5)
    counts = {r.grp: r.n for r in
              out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5, "tiny": 1}
    picked = sorted((r.grp, r.id) for r in out.collect())
    again = sorted(
        (r.grp, r.id)
        for r in sample_k_per_group(df.repartition(7), "grp", "id", 5).collect()
    )
    assert picked == again


def test_mixture_rates_track_temperature(spark):
    from pyspark.sql import functions as F

    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        mixture_rates,
    )

    # 3 sources at 1600 / 400 / 100 rows
    df = (
        spark.range(2100)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "src",
            F.when(F.col("doc_id") < 1600, "big")
            .when(F.col("doc_id") < 2000, "mid")
            .otherwise("small"),
        )
    )
    rates = {r.src: r.rate for r in mixture_rates(df, "src", 0.5).collect()}
    # smallest group kept whole; rates fall with size as n^(alpha-1)
    assert rates["small"] == 1.0
    assert rates["small"] > rates["mid"] > rates["big"]
    assert abs(rates["big"] - (1600 ** -0.5) / (100 ** -0.5)) < 1e-6
    # alpha=1 is the natural mix: every rate is 1
    natural = {r.src: r.rate for r in mixture_rates(df, "src", 1.0).collect()}
    assert set(natural.values()) == {1.0}


def test_temperature_mixture_sample_is_deterministic_and_rate_true(spark):
    from pyspark.sql import functions as F

    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    df = (
        spark.range(4000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "src", F.when(F.col("doc_id") < 3600, "big").otherwise("small")
        )
    )
    out = temperature_mixture_sample(df, "src", "doc_id", alpha=0.5)
    picked = {r.doc_id for r in out.collect()}
    again = {
        r.doc_id
        for r in temperature_mixture_sample(
            df.repartition(13), "src", "doc_id", alpha=0.5
        ).collect()
    }
    assert picked == again  # RNG-free: same rows on any partitioning
    by_src = {
        r.src: r.n
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    # small kept whole; big at ~sqrt(400/3600)=1/3 (256-quantized), so
    # the realized mixture moved from 90/10 toward the n^0.5 60/40 target
    assert by_src["small"] == 400
    assert abs(by_src["big"] / 3600 - 1 / 3) < 0.04


def test_diverse_sample_flattens_cluster_distribution(spark):
    """Cluster-balanced sampling: a corpus with one dominant cluster
    must come out capped at k rows per cell — the majority mode
    cannot dominate the subset — while small cells keep everything;
    deterministic across runs."""
    from kafka_sparkstreaming_sbt_spark.operators.similarity import (
        diverse_sample,
    )

    # cell 0 direction holds 60 vectors, cell 1 direction 5
    rows = [(i, [1.0, 0.01 * i]) for i in range(60)]
    rows += [(100 + i, [0.01 * i, 1.0]) for i in range(5)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "cell_id long, c_vec array<double>",
    )
    out = diverse_sample(corpus, cent, k_per_cell=8).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell_id, []).append(r.vec_id)
    assert len(by_cell[0]) == 8  # dominant cluster capped
    assert len(by_cell[1]) == 5  # small cluster kept whole
    assert all(1 <= r.draw_rank <= 8 for r in out)
    again = diverse_sample(corpus, cent, k_per_cell=8).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}


def test_group_quantile_filter_is_per_group_and_tie_stable(spark):
    """The relative cut must be WITHIN-group (a low-scoring group
    keeps its own top fraction, not get gutted by a global bar), keep
    threshold ties deterministically, and never drop a whole group."""
    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        group_quantile_filter,
    )

    rows = [("hi", i, float(i)) for i in range(10)]  # scores 0..9
    rows += [("lo", 100 + i, float(i) / 100) for i in range(10)]  # 0..0.09
    rows += [("tied", 200 + i, 1.0) for i in range(4)]  # all equal
    rows += [("hi", 300, None)]  # unscored row: never kept, never
    # distorts the threshold (percentile ignores nulls)
    rows += [(None, 400 + i, float(i)) for i in range(4)]  # NULL group
    df = spark.createDataFrame(rows, "grp string, id long, score double")
    out = group_quantile_filter(df, "grp", "score", keep_frac=0.5)
    by = {}
    for r in out.collect():
        by.setdefault(r.grp, set()).add(r.id)
    # each group keeps its own top half (interpolated median = 4.5 /
    # 0.045 -> 5 rows each); a global bar would have kept 0 'lo' rows
    assert by["hi"] == {5, 6, 7, 8, 9}
    assert by["lo"] == {105, 106, 107, 108, 109}
    # all-tied group: threshold == the tied score, everything kept
    assert by["tied"] == {200, 201, 202, 203}
    assert 300 not in by["hi"]  # NULL score dropped, threshold intact
    # a NULL group key is a real group (null-safe join), not a silent
    # drop: its own top half survives
    assert by[None] == {402, 403}
    # keep_frac outside (0, 1] fails fast at the API boundary
    import pytest

    with pytest.raises(ValueError, match="keep_frac"):
        group_quantile_filter(df, "grp", "score", keep_frac=0.0)
    with pytest.raises(ValueError, match="keep_frac"):
        group_quantile_filter(df, "grp", "score", keep_frac=1.5)
    # deterministic across runs
    again = group_quantile_filter(df, "grp", "score", keep_frac=0.5)
    assert {tuple(r) for r in again.collect()} == {
        tuple(r) for r in out.collect()
    }


def test_leakage_safe_split_keeps_components_together(spark):
    """Every member of a near-dup component gets the representative's
    split (no train/test straddle); singletons match with_split of
    their own id exactly."""
    from kafka_sparkstreaming_sbt_spark.operators.graph import (
        near_dup_groups,
    )
    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        leakage_safe_split,
        with_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(40)], ["doc_id"]
    )
    # two components {0..4} and {10,11}; the rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)],
        ["doc_a", "doc_b"],
    )
    groups = near_dup_groups(docs, pairs)
    out = {r.doc_id: r for r in
           leakage_safe_split(docs, groups).collect()}
    assert len({out[i].split for i in range(5)}) == 1
    assert out[10].split == out[11].split
    # splits land on >1 class over 40 ids (the draw is not constant)
    assert len({r.split for r in out.values()}) > 1
    # singleton assignment == plain with_split on its own id
    plain = {r.doc_id: r.split
             for r in with_split(docs, "doc_id").collect()}
    for i in (20, 25, 33):
        assert out[i].group_id == i and out[i].split == plain[i]


def test_snapshot_diff_emits_only_the_delta(spark):
    """Dataset-version diff (operators/cdc.py): added / removed /
    changed keys only — unchanged keys are absent, hashes expose
    which side differs."""
    from kafka_sparkstreaming_sbt_spark.operators.cdc import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C2"), (4, "d")], ["k", "v"]
    )
    out = {r.k: r for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert set(out) == {1, 3, 4}  # 2 unchanged -> absent
    assert out[1].status == "removed" and out[1].new_hash is None
    assert out[4].status == "added" and out[4].old_hash is None
    assert out[3].status == "changed"
    assert out[3].old_hash != out[3].new_hash


def test_select_to_token_budget_matches_global_window(spark):
    """Bucketed prefix-sum budget fill == the textbook global-window
    selection, independent of n_buckets, with the straddling row
    included (run_before < budget rule)."""
    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        select_to_token_budget,
    )

    rows = [
        # (id, score, weight) — scores engineered with 6-dp ties
        (1, 0.9, 40), (2, 0.9, 10), (3, 0.8, 25), (4, 0.7, 100),
        (5, 0.7, 5), (6, 0.5, 30), (7, 0.3, 60), (8, 0.1, 2),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "score", "w"])
    # brute-force model: order by (score desc, id asc), cumsum
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    budget = 120
    run, expect = 0, {}
    for i, s, w in ordered:
        if run < budget:
            expect[i] = run
        run += w
    for nb in (1, 3, 64):
        got = {
            r.doc_id: r.run_before
            for r in select_to_token_budget(
                df, budget, "w", "score", n_buckets=nb
            ).collect()
        }
        assert got == expect, f"n_buckets={nb}"
    # the straddling row (id 4 pushes past 120) is INCLUDED
    assert 4 in expect
    # fill level is re-derivable: max(run_before)+its weight >= budget
    assert max(expect.values()) < budget


def test_select_to_token_budget_edges(spark):
    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        select_to_token_budget,
    )
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, 5.0, 10), (2, 5.0, 10)], ["doc_id", "score", "w"]
    )
    # budget >= total: everything selected (constant order key ->
    # single bucket, width-0 guard)
    out = select_to_token_budget(df, 1000, "w", "score").collect()
    assert {r.doc_id for r in out} == {1, 2}
    # empty input: empty output with the output schema
    empty = df.limit(0)
    assert select_to_token_budget(empty, 10, "w", "score").count() == 0
    with _pt.raises(ValueError):
        select_to_token_budget(df, 0, "w", "score")
    with _pt.raises(ValueError):
        select_to_token_budget(df, 10, "w", "score", n_buckets=0)


def test_curriculum_order_stages_and_determinism(spark):
    """Exact-quantile staging: 4 stages of ~equal size over a uniform
    score, stage monotone in score, draw deterministic and
    partition-independent."""
    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        curriculum_order,
    )
    import pytest as _pt

    rows = [(i, round(i / 100.0, 6)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "score"])
    out = {r.doc_id: r for r in curriculum_order(df, "score", 4).collect()}
    assert len(out) == 100
    sizes = {}
    for r in out.values():
        sizes[r.stage] = sizes.get(r.stage, 0) + 1
    assert set(sizes) == {0, 1, 2, 3}
    assert all(20 <= n <= 30 for n in sizes.values()), sizes
    # stage monotone in score
    ordered = sorted(out.values(), key=lambda r: r.score)
    stages = [r.stage for r in ordered]
    assert stages == sorted(stages)
    # deterministic under repartition
    again = {
        r.doc_id: r
        for r in curriculum_order(
            df.repartition(7), "score", 4
        ).collect()
    }
    assert {(r.doc_id, r.stage, r.draw) for r in out.values()} == {
        (r.doc_id, r.stage, r.draw) for r in again.values()
    }
    with _pt.raises(ValueError):
        curriculum_order(df, "score", 1)
    assert curriculum_order(df.limit(0), "score", 4).count() == 0


def test_curriculum_order_approx_tier_tolerance(spark):
    """exact=False routes the stage thresholds through
    approx_percentile (bounded sketch state — the 100 TB tier): every
    row still lands in a stage, stages stay monotone in score, and
    each row's stage differs from the exact tier's by at most 1
    (the sketch's rank error moves BOUNDARIES only); the md5 draw is
    unchanged for rows whose stage agrees."""
    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        curriculum_order,
    )

    rows = [(i, round((i * 37 % 1000) / 1000.0, 6)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "score"])
    exact = {
        r.doc_id: r for r in curriculum_order(df, "score", 4).collect()
    }
    approx = {
        r.doc_id: r
        for r in curriculum_order(df, "score", 4, exact=False).collect()
    }
    assert set(approx) == set(exact)
    ordered = sorted(approx.values(), key=lambda r: r.score)
    stages = [r.stage for r in ordered]
    assert stages == sorted(stages)
    for i, r in exact.items():
        assert abs(approx[i].stage - r.stage) <= 1, i
        if approx[i].stage == r.stage:
            assert approx[i].draw == r.draw
    # at default accuracy (1e4) on 1k rows the sketch is exact
    assert sum(
        approx[i].stage != exact[i].stage for i in exact
    ) == 0
