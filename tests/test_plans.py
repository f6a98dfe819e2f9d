"""Physical-plan assertions — the 100 TB discipline checks: filters
reach the parquet scan, projections prune the read schema, dimension
joins broadcast, aggregations are partial->final."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark, sf_small):
    df = entry_mod.q_pricing_summary(spark, sf_small)
    plan = _physical(df)
    # shipdate filter pushed into the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # unused columns never read
    scan = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_comment"):
        assert col not in scan
    # map-side partial aggregation before the shuffle
    assert plan.count("HashAggregate") >= 2


def test_revenue_by_nation_broadcasts_dims(spark, sf_small):
    df = entry_mod.q_revenue_by_nation(spark, sf_small)
    plan = _physical(df)
    assert "BroadcastHashJoin" in plan
    # the lineitem scan reads only the join key + revenue columns
    li_scans = [
        l
        for l in plan.splitlines()
        if "ReadSchema" in l and "l_extendedprice" in l
    ]
    assert li_scans and all("l_shipdate" not in l for l in li_scans)


def test_windowed_spending_partial_agg(spark, sf_small):
    df = entry_mod.q_windowed_spending_per_customer(spark, sf_small)
    plan = _physical(df)
    # TimeWindowing expansion feeds a partial->final hash aggregate
    assert plan.count("HashAggregate") >= 2
    # events scan reads only ts/user_id/value
    scan = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in scan and "event_type" not in scan


def test_ann_corpus_never_shuffled_before_scoring(spark, sf_small):
    df = entry_mod.q_ann_cosine_topk(spark, sf_small)
    plan = _physical(df)
    # query side broadcast: nested-loop join against the corpus stream
    assert "BroadcastNestedLoopJoin" in plan


def test_ann_rank_pruned_map_side(spark, sf_small):
    """The rank <= k filter must compile to Catalyst's partial
    WindowGroupLimit BELOW the exchange — each map partition keeps only
    its k best rows per query, so the shuffle carries Q x k x P rows,
    never the full Q x N scored set."""
    for q in (
        entry_mod.q_ann_cosine_topk,
        entry_mod.q_ivf_topk,
        entry_mod.q_hard_negatives,
    ):
        lines = _physical(q(spark, sf_small)).splitlines()
        partial = [
            i
            for i, l in enumerate(lines)
            if "WindowGroupLimit" in l and "Partial" in l
        ]
        exchange = [
            i
            for i, l in enumerate(lines)
            if "Exchange hashpartitioning(query_id" in l
        ]
        assert partial and exchange
        # toString prints children below parents: the map-side Partial
        # limit must sit UPSTREAM of (printed after) the rank exchange
        assert partial[-1] > exchange[0]


def test_latest_by_key_is_partial_aggregate_not_window(spark, sf_small):
    """CDC latest-by-key must be a partial->final max_by aggregate —
    |keys| rows shuffle — never the rank-window spelling that shuffles
    every update row."""
    plan = _physical(entry_mod.q_latest_event_per_user(spark, sf_small))
    assert "Window" not in plan
    # struct-ordered max_by compiles to SortAggregate; the load-bearing
    # property is the MAP-SIDE partial (each partition reduces to one
    # candidate per key before the single exchange)
    assert "partial_max_by" in plan
    assert plan.count("Exchange") == 1


def test_skewed_totals_two_phase_aggregation(spark, sf_small):
    """salted_sum: (key, salt) partial phase then key phase — two
    exchanges, four HashAggregate nodes (partial+final each)."""
    plan = _physical(entry_mod.q_skewed_event_totals(spark, sf_small))
    assert plan.count("HashAggregate") >= 4
    assert plan.count("Exchange hashpartitioning") == 2


def test_global_topk_has_no_window_operator(spark, sf_small):
    """top_customers / top_tokens: global top-k must be
    TakeOrderedAndProject (per-partition bounded heap, k-row merge) +
    a k-row rank join — never a partition-less global window funneling
    the whole aggregate through one task (r1's confirmed
    scale-killer)."""
    for q in (entry_mod.q_top_customers, entry_mod.q_top_tokens):
        plan = _physical(q(spark, sf_small))
        assert "TakeOrderedAndProject" in plan
        assert "Window" not in plan  # no WindowExec of any kind


def test_global_topk_rank_matches_spark_null_order(spark):
    """ADVICE r3: the pandas re-rank of the k survivors must place
    NULLs where Spark's orderBy did — FIRST for ascending keys, LAST
    for descending — or the rank column contradicts the cut order on
    nullable columns."""
    from kafka_sparkstreaming_sbt_spark.operators.topk import (
        global_topk_with_rank,
    )

    df = spark.createDataFrame(
        [(None, "a"), (5.0, "b"), (1.0, "c"), (None, "d"), (3.0, "e")],
        "score double, id string",
    )
    # desc score: nulls LAST in Spark; id asc tie-break
    got = [
        (r.id, r.rank)
        for r in global_topk_with_rank(
            df, [("score", "desc"), ("id", "asc")], 5
        ).collect()
    ]
    assert sorted(got, key=lambda t: t[1]) == [
        ("b", 1), ("e", 2), ("c", 3), ("a", 4), ("d", 5)
    ]
    # asc score: nulls FIRST in Spark
    got = [
        (r.id, r.rank)
        for r in global_topk_with_rank(
            df, [("score", "asc"), ("id", "asc")], 5
        ).collect()
    ]
    assert sorted(got, key=lambda t: t[1]) == [
        ("a", 1), ("d", 2), ("c", 3), ("e", 4), ("b", 5)
    ]


def test_grouped_topk_pruned_map_side(spark, sf_small):
    """grouped_topk (top-3 per nation) must get Catalyst's partial
    WindowGroupLimit below the rank exchange — map tasks pre-prune to
    their local per-group top-k, so the shuffle carries at most
    k x groups x partitions rows."""
    lines = _physical(
        entry_mod.q_top_customers_per_nation(spark, sf_small)
    ).splitlines()
    partial = [
        i
        for i, l in enumerate(lines)
        if "WindowGroupLimit" in l and "Partial" in l
    ]
    exchange = [
        i for i, l in enumerate(lines) if "Exchange hashpartitioning(n_name" in l
    ]
    assert partial and exchange
    assert partial[-1] > exchange[0]  # Partial prune upstream of the exchange


def _walk_plan(node):
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        children = n.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


def test_no_partitionless_window_in_any_query(spark, sf_small):
    """Fleet-wide guard (VERDICT r1): NO gate query may contain a
    WindowExec with an empty partition spec — the 'moving all data to
    a single partition' plan that collapses at scale.  Walks the
    actual physical plan tree of every queries() entry."""
    offenders = []
    for name, fn in entry_mod.queries().items():
        plan = fn(spark, sf_small)._jdf.queryExecution().sparkPlan()
        for node in _walk_plan(plan):
            if node.getClass().getSimpleName() == "WindowExec":
                if node.partitionSpec().isEmpty():
                    offenders.append(name)
    assert not offenders, f"partition-less WindowExec in: {offenders}"


def test_benchmark_overlap_join_strategy_is_runtime_chosen(spark, sf_small):
    """Decontamination's shingle join must carry NO forced broadcast
    hint: the eval-set shingle volume is data-dependent, so strategy
    belongs to AQE runtime statistics (policy parity with the minhash
    verify join).  A hint would OOM the driver exactly when an eval
    suite's n-gram set is large."""
    df = entry_mod.q_benchmark_overlap(spark, sf_small)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized
    assert "strategy=broadcast" not in optimized


#: Queries whose BroadcastNestedLoopJoin is INTENTIONAL and bounded:
#: the broadcast side is provably small by construction — never a
#: data-dependent table.
_BOUNDED_NESTED_LOOP = {
    "ann_cosine_topk",  # scored cross join vs the broadcast query set
    "ivf_topk",  # probe assignment vs the bounded centroid set
    "ivf_kmeans_topk",  # same, k-means centroids (~sqrt N rows)
    # the next three surface ivf_assign's bounded centroid cross-join
    # directly in the plan now that the dual-consumer checkpoint is
    # size-guarded (it used to hide behind the ExistingRDD cut at
    # every scale; the join itself is unchanged and bounded)
    "semantic_dedup",
    "semantic_dedup_multiprobe",
    "incremental_semantic_dedup",
    "diverse_sample",  # same bounded centroid assignment cross-join
    "tf_idf",  # 1-row corpus-size scalar joined lazily (no collect)
    "unigram_lm_score",  # 1-row corpus-total scalar, same pattern
    "bigram_pmi",  # two 1-row count scalars, same pattern
    "mixture_sample",  # 1-row max-rate scalar vs per-group counts
    # DSIR/NB: 1-row corpus-total scalars (n_t/n_r, n_p/n_n, prior)
    # cross-joined into the <= n_buckets-row ratio/model tables —
    # bounded by construction on both sides, the tf_idf pattern
    "dsir_doc_weights",
    "dsir_selected_docs",
    "nb_quality_scores",
    "bm25_topk",  # 2-row avgdl/N scalar joined lazily (tf_idf pattern)
    # same 1-row stats scalar cross join, read from the index meta
    "bm25_topk_indexed",
    "bm25_multi_query",  # same 1-row stats scalar, batched serving
    # bm25 leg's scalar + the <= 1-row broadcast query-vector cross
    # join of the dense leg — both bounded by construction
    "hybrid_retrieval_rrf",
    "key_skew_report",  # 1-row corpus-total scalar, tf_idf pattern
    "pagerank_weights",  # 1-row node-count scalar, tf_idf pattern
    # ann_cosine_topk's scored cross join with the label-exclusion
    # predicate fused in — same bounded broadcast query set
    "hard_negatives",
    # the exact (oracle) tier of the kNN graph on a bounded subset;
    # the scale path is the cell-blocked cogroup, recall-gated
    "knn_graph_edges",
    "label_propagation",  # same exact-tier kNN graph as input
}


def test_no_accidental_cartesian_in_any_query(spark, sf_small):
    """Fleet-wide guard (VERDICT r2 #8): no gate query may contain a
    CartesianProduct, and BroadcastNestedLoopJoin is allowed only
    where the broadcast side is bounded by construction (whitelist
    above).  An accidental cross join is quadratic at 100 TB."""
    offenders = []
    for name, fn in entry_mod.queries().items():
        plan = fn(spark, sf_small)._jdf.queryExecution().sparkPlan()
        for node in _walk_plan(plan):
            kind = node.getClass().getSimpleName()
            if kind == "CartesianProductExec":
                offenders.append((name, kind))
            if (
                kind == "BroadcastNestedLoopJoinExec"
                and name not in _BOUNDED_NESTED_LOOP
            ):
                offenders.append((name, kind))
    assert not offenders, f"unbounded join in: {offenders}"


def test_anti_join_pushes_quantity_filter(spark, sf_small):
    df = entry_mod.q_parts_without_bulk(spark, sf_small)
    plan = _physical(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan
    joins = [l for l in plan.splitlines() if "Join" in l]
    assert any("LeftAnti" in l for l in joins)


def test_asof_join_single_shuffle(spark, sf_small):
    """The union-sort as-of join shuffles ONCE on the key — no range
    join, no per-key quadratic expansion."""
    df = entry_mod.q_purchase_attribution(spark, sf_small)
    plan = _physical(df)
    assert plan.count("Exchange") == 1
    # both side filters reach the parquet scans
    assert "EqualTo(event_type,purchase)" in plan
    assert "EqualTo(event_type,click)" in plan
    # the click side never reads event_id/value/props
    click_scans = [
        l
        for l in plan.splitlines()
        if "ReadSchema" in l and "value:double" not in l
    ]
    assert click_scans and all("props" not in l for l in click_scans)


def test_session_window_partial_agg_and_pruning(spark, sf_small):
    df = entry_mod.q_user_sessions(spark, sf_small)
    plan = _physical(df)
    # events scan reads only ts/user_id/value
    scan = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in scan and "event_type" not in scan
    # session windows shuffle once on the grouping key
    assert plan.count("Exchange") == 1


def test_lsh_near_pairs_bucket_table_computed_once(
    spark, sf_small, monkeypatch
):
    """The bucketed table feeds both sides of the self-join; Catalyst
    does NOT fold the two aliased projections into a ReusedExchange
    (verified empirically), so lsh_near_pairs materializes it at
    scale — both join sides must read the checkpointed RDD, not
    recompute the n_bits dot products.  The materialization is
    SIZE-GUARDED (VERDICT r5 §wrong-3): below the row floor the
    checkpoint job costs more than the recompute, so gate-scale
    corpora skip it."""
    from kafka_sparkstreaming_sbt_spark.operators import similarity
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    emb = read_table(spark, sf_small, "embeddings")
    # scale shape: force the floor under this corpus size -> both
    # sides read the checkpointed RDD (single execution)
    monkeypatch.setattr(similarity, "_CHECKPOINT_MIN_ROWS", 1)
    out = similarity.lsh_near_pairs(emb, dim=8, threshold=0.8, n_bits=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") >= 2, plan
    # gate shape: 500 footer rows << the default floor -> no
    # checkpoint job; the plan reads parquet directly on both sides
    monkeypatch.setattr(similarity, "_CHECKPOINT_MIN_ROWS", 50_000)
    out2 = similarity.lsh_near_pairs(emb, dim=8, threshold=0.8, n_bits=4)
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan2, plan2


def test_ivf_probe_broadcast_is_size_guarded(spark, sf_small, monkeypatch):
    """The probed-search broadcast hint must apply ONLY when metadata
    proves Q x n_probe small (VERDICT r5 §wrong-2): the probe table
    carries query vectors, and a forced broadcast of a data-dependent
    table is exactly the documented driver-OOM shape.  Over the
    budget, the hint disappears and AQE picks the strategy."""
    from kafka_sparkstreaming_sbt_spark.operators import similarity
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    emb = read_table(spark, sf_small, "embeddings")
    queries = emb.filter("vec_id < 8")

    def n_hints(df):
        return str(df._jdf.queryExecution().analyzed()).count(
            "strategy=broadcast"
        )

    small = similarity.ivf_topk(emb, queries, k=3, n_cells=4, n_probe=2)
    # metadata says 500 x 2 probe rows -> hint present (centroid
    # broadcasts exist on both shapes; the probe hint is the +1)
    monkeypatch.setattr(similarity, "_PROBE_BROADCAST_MAX_ROWS", 10)
    large = similarity.ivf_topk(emb, queries, k=3, n_cells=4, n_probe=2)
    assert n_hints(small) == n_hints(large) + 1, (
        n_hints(small),
        n_hints(large),
    )
    # and the result is identical either way (strategy, not semantics)
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, large.collect())
    )


def test_token_budget_window_is_bucketed_and_prune_reaches_scan(
    spark, sf_small
):
    """select_to_token_budget must never build the single-partition
    global window it replaces: its one Window is PARTITIONED BY the
    range bucket, the only exchange is the bucket hash exchange, and
    the over-budget-bucket prune is a scan-side data filter (below
    the exchange), so dropped buckets never shuffle."""
    plan = _physical(
        entry_mod.q_token_budget_selection(spark, sf_small)
    )
    lines = plan.splitlines()
    win = [i for i, l in enumerate(lines) if "Window [" in l]
    assert win, "no Window operator found"
    assert "_bucket" in lines[win[0]]
    exch = [
        i
        for i, l in enumerate(lines)
        if "Exchange hashpartitioning(_bucket" in l
    ]
    assert exch, "window exchange must partition by the bucket"
    # the bucket-membership prune is pushed into the scan-side
    # Filter/DataFilters BELOW (printed after) the exchange
    scan_filter = [
        i
        for i, l in enumerate(lines)
        if i > exch[0] and "Filter" in l and "FLOOR" in l
    ]
    assert scan_filter, "bucket prune did not reach the scan side"
