"""Connected-components dedup groups: label propagation fixpoint,
singleton handling, transitivity, and the pivot/set-op analytics."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.analytics import (
    lapsed_customers,
    order_status_pivot,
)
from kafka_sparkstreaming_sbt_spark.operators.graph import (
    connected_components,
    near_dup_groups,
)


def test_connected_components_basic(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    # components: {1,2,3} (chain), {4,5}, singletons {6}, {7}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    out = connected_components(nodes, edges)
    got = {r.doc_id: r.group_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 7}


def test_connected_components_transitive_chain(spark):
    # a path graph needs multiple propagation rounds: 0-1-2-...-9
    n = 10
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = connected_components(nodes, edges)
    assert {r.group_id for r in out.collect()} == {0}


def test_near_dup_groups_keeps_all_docs(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(2, 4)], "doc_a long, doc_b long")
    out = near_dup_groups(docs, pairs)
    got = {r.doc_id: r.group_id for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5}


def test_order_status_pivot(spark, sf_small):
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    orders = read_table(spark, sf_small, "orders")
    out = order_status_pivot(orders).collect()
    assert len(out) == orders.select("o_orderpriority").distinct().count()
    # pivot cells reconcile with the plain group-by
    total = sum(r.n_f + r.n_o + r.n_p for r in out)
    assert total == orders.count()


def test_lapsed_customers_set_difference(spark):
    rows = [
        (1, "1995-06-01"), (1, "1996-06-01"),  # both years -> excluded
        (2, "1995-07-01"),                      # 1995 only -> kept
        (3, "1996-08-01"),                      # 1996 only -> excluded
    ]
    orders = spark.createDataFrame(
        [(c, d) for c, d in rows], "o_custkey long, d string"
    ).select("o_custkey", F.to_date("d").alias("o_orderdate"))
    out = lapsed_customers(orders, 1995, 1996)
    assert [r.o_custkey for r in out.collect()] == [2]


def test_select_canonical_keeps_highest_score(spark):
    """Canonical per component = highest score (ties -> lowest id);
    every doc points at its group's survivor; singletons keep
    themselves."""
    from kafka_sparkstreaming_sbt_spark.operators.graph import (
        select_canonical,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5)], ["doc_id", "n_chars"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], ["doc_a", "doc_b"]
    )
    out = {r.doc_id: r for r in
           select_canonical(docs, pairs, "n_chars").collect()}
    # component {1,2,3}: 2 and 3 tie on score, lower id (2) wins
    assert out[1].canonical_id == 2 and not out[1].keep
    assert out[2].canonical_id == 2 and out[2].keep
    assert out[3].canonical_id == 2 and not out[3].keep
    # singleton keeps itself
    assert out[7].canonical_id == 7 and out[7].keep
    assert out[7].group_id == 7


def test_dedup_report_by_key_counts_non_representatives(spark):
    """Per-key dup counts: a doc counts as a duplicate member iff it
    is a non-representative member of its component, so n_dup_members
    is exactly the docs a group-level dedup would delete per key."""
    from kafka_sparkstreaming_sbt_spark.operators.graph import (
        dedup_report_by_key,
        near_dup_groups,
    )

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (7, "b")],
        ["doc_id", "source"],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
    groups = near_dup_groups(docs, pairs)
    out = {r.source: r for r in
           dedup_report_by_key(docs, groups).collect()}
    # component {1,2,3} survives as doc 1; doc 7 is a singleton
    assert out["a"].n_docs == 2 and out["a"].n_dup_members == 1
    assert out["a"].dup_rate == 0.5
    assert out["b"].n_docs == 2 and out["b"].n_dup_members == 1
    assert out["b"].dup_rate == 0.5


def test_soft_dedup_weights_unit_mass_per_group(spark):
    """Each component's weights sum to ~1 (unit content mass) and
    singletons get exactly 1.0."""
    from kafka_sparkstreaming_sbt_spark.operators.graph import (
        soft_dedup_weights,
    )

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 7)], ["doc_id"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
    out = {r.doc_id: r for r in soft_dedup_weights(docs, pairs).collect()}
    assert set(out) == {1, 2, 3, 7}
    for d in (1, 2, 3):
        assert out[d].group_id == 1
        assert out[d].group_size == 3
        assert out[d].weight == round(1 / 3, 6)
    assert out[7].group_size == 1 and out[7].weight == 1.0


# ---- fixed-iteration integer PageRank ---------------------------


def _pr_expected(nodes, undirected_edges, n_iter, damping_pct=85):
    """Pure-Python replica of the pico-unit integer recurrence."""
    unit = 1_000_000_000_000
    ends = []
    for a, b in undirected_edges:
        ends += [(a, b), (b, a)]
    outdeg = {}
    for s, _ in ends:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    r = {v: unit // n for v in nodes}
    keep = 100 - damping_pct
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for src, dst in ends:
            s[dst] += r[src] // outdeg[src]
        r = {
            v: (keep * (unit // n)) // 100
            + (damping_pct * s[v]) // 100
            for v in nodes
        }
    return r


def test_pagerank_matches_integer_recurrence(spark):
    from kafka_sparkstreaming_sbt_spark.operators.graph import pagerank

    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4]], "doc_id long"
    )
    edges = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.rank_pico
        for r in pagerank(nodes, edges, n_iter=2).collect()
    }
    assert got == _pr_expected([1, 2, 3, 4], [(1, 2), (1, 3)], 2)
    # the hub out-ranks the leaves, leaves out-rank the isolate
    assert got[1] > got[2] == got[3] > got[4]


def test_pagerank_partitioning_invariant(spark):
    from kafka_sparkstreaming_sbt_spark.operators.graph import pagerank

    nodes = spark.createDataFrame(
        [(i,) for i in range(30)], "doc_id long"
    )
    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 30) for i in range(25)],
        "doc_a long, doc_b long",
    )
    a = {
        r.doc_id: r.rank_pico
        for r in pagerank(nodes, edges, n_iter=3).collect()
    }
    b = {
        r.doc_id: r.rank_pico
        for r in pagerank(
            nodes.repartition(7), edges.repartition(11), n_iter=3
        ).collect()
    }
    assert a == b


def test_pagerank_directed_contributes_one_way(spark):
    from kafka_sparkstreaming_sbt_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
    edges = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    got = {
        r.doc_id: r.rank_pico
        for r in pagerank(nodes, edges, n_iter=1, directed=True).collect()
    }
    unit = 1_000_000_000_000
    r0 = unit // 2
    teleport = (15 * r0) // 100
    assert got[1] == teleport
    assert got[2] == teleport + (85 * r0) // 100


def test_pagerank_validates_inputs(spark):
    import pytest as _pytest

    from kafka_sparkstreaming_sbt_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(1,)], "doc_id long")
    edges = spark.createDataFrame([(1, 1)], "doc_a long, doc_b long")
    with _pytest.raises(ValueError):
        pagerank(nodes, edges, n_iter=0)
    with _pytest.raises(ValueError):
        pagerank(nodes, edges, damping_pct=101)


def test_label_propagation_planted_clusters(spark):
    """Two planted cliques with one seed each: every member inherits
    its clique's seed label; the bridge node (equal votes from both)
    tie-breaks to the SMALLER label; seeds stay clamped even when
    outvoted; an isolated node never appears."""
    from kafka_sparkstreaming_sbt_spark.operators.graph import (
        label_propagation,
    )

    # clique A: 0-1-2 fully connected; clique B: 10-11-12; bridge 5
    # touches one node of each; 99 is isolated (no edges)
    edges = spark.createDataFrame(
        [
            (0, 1), (1, 2), (0, 2),
            (10, 11), (11, 12), (10, 12),
            (5, 2), (5, 12),
        ],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([(0, 7), (10, 3)], ["vec_id", "label"])
    out = {
        r.vec_id: r
        for r in label_propagation(edges, seeds, n_rounds=3).collect()
    }
    assert 99 not in out
    assert out[0].label == 7 and out[0].origin == "seed"
    assert out[10].label == 3 and out[10].origin == "seed"
    for n in (1, 2):
        assert out[n].label == 7 and out[n].origin == "propagated"
    for n in (11, 12):
        assert out[n].label == 3 and out[n].origin == "propagated"
    # bridge: one vote label 7 (via 2), one vote label 3 (via 12) ->
    # tie breaks to the smaller label
    assert out[5].label == 3


def test_label_propagation_seed_clamped_and_rounds(spark):
    """A seed surrounded by oppositely-labeled neighbors keeps its
    label; a node two hops from the only seed is unlabeled after 1
    round and labeled after 2."""
    from kafka_sparkstreaming_sbt_spark.operators.graph import (
        label_propagation,
    )
    import pytest as _pt

    # chain: 0(seed) - 1 - 2; plus seed 3 adjacent to 0
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 0)], ["src", "dst"]
    )
    seeds = spark.createDataFrame(
        [(0, 5), (3, 9)], ["vec_id", "label"]
    )
    r1 = {
        r.vec_id: r
        for r in label_propagation(edges, seeds, n_rounds=1).collect()
    }
    assert set(r1) == {0, 1, 3}  # node 2 not yet reached
    assert r1[0].label == 5  # clamped (neighbor 3 voted 9)
    assert r1[1].label == 5
    r2 = {
        r.vec_id: r
        for r in label_propagation(edges, seeds, n_rounds=2).collect()
    }
    assert r2[2].label == 5 and r2[2].origin == "propagated"
    with _pt.raises(ValueError):
        label_propagation(edges, seeds, n_rounds=0)


def test_label_propagation_deterministic_under_repartition(spark):
    """Same labels regardless of input partitioning — integer votes,
    no float accumulation order anywhere."""
    from kafka_sparkstreaming_sbt_spark.operators.graph import (
        label_propagation,
    )

    import random

    rng = random.Random(11)
    edges_rows = [
        (rng.randrange(50), rng.randrange(50)) for _ in range(200)
    ]
    edges_rows = [(a, b) for a, b in edges_rows if a != b]
    seeds_rows = [(i, i % 3) for i in range(5)]
    e1 = spark.createDataFrame(edges_rows, ["src", "dst"])
    seeds = spark.createDataFrame(seeds_rows, ["vec_id", "label"])
    base = sorted(
        map(tuple, label_propagation(e1, seeds, n_rounds=3).collect())
    )
    e2 = e1.repartition(13)
    again = sorted(
        map(tuple, label_propagation(e2, seeds, n_rounds=3).collect())
    )
    assert base == again
