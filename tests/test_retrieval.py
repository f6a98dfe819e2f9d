"""BM25 query-time retrieval (operators/retrieval.py): scoring
semantics on a hand-checkable corpus, the query-term pushdown /
no-window plan shape, and cross-engine determinism of the integer
micro-unit score (the oracle-parity hash gate runs in
tests/test_oracle_parity.py's registry sweep via ``bm25_topk``)."""

from __future__ import annotations

import math

import pytest

from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark spark scan"),
        (2, "spark merge"),
        (3, "table row filter batch"),
        (4, "merge merge merge merge merge merge merge merge"),
        (5, "spark"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_scores_match_closed_form(corpus):
    got = {
        r["doc_id"]: r
        for r in bm25_scores(corpus, ["spark", "merge"]).collect()
    }
    # docs 3 has no query term -> absent
    assert set(got) == {1, 2, 4, 5}
    n, avgdl = 5, (4 + 2 + 4 + 8 + 1) / 5
    # doc 2 hits both terms; contributions quantized to micro-units
    exp = sum(
        round(_bm25(1, df, n, 2, avgdl) * 1e6)
        for df in (3, 2)  # spark df=3, merge df=2
    )
    assert got[2]["n_hit_terms"] == 2
    assert got[2]["score_micro"] == exp
    assert got[2]["score"] == round(exp / 1e6, 6)
    # doc 5: single 'spark' in the shortest doc
    assert got[5]["score_micro"] == round(_bm25(1, 3, n, 1, avgdl) * 1e6)


def test_topk_rank_is_total_order(corpus):
    top = bm25_topk(corpus, ["spark", "merge"], k=3).collect()
    assert [r["rank"] for r in top] == [1, 2, 3]
    micro = [r["score_micro"] for r in top]
    assert micro == sorted(micro, reverse=True)


def test_duplicate_query_terms_are_deduped(corpus):
    once = bm25_scores(corpus, ["spark"]).collect()
    twice = bm25_scores(corpus, ["spark", "spark"]).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


def test_empty_query_rejected(corpus):
    with pytest.raises(ValueError):
        bm25_scores(corpus, [])


def test_plan_pushdown_and_no_window(spark, sf_small):
    """The postings explode is filtered to query terms BEFORE the
    (doc, term) shuffle, the cut is TakeOrderedAndProject, and there
    is no window operator anywhere in the plan.  Since r12 the slim
    (id, dl, hits) projection is checkpointed once (one tokenize for
    stats + postings), so the term pushdown lives in the CHECKPOINT's
    lineage and the query plan reads the materialized slim rows."""
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    docs = read_table(spark, sf_small, "documents")
    plan = (
        bm25_topk(docs, ["spark", "scan"], k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    # the query plan consumes the materialized slim frame — proof the
    # tokenize (with the term filter inside its projection) runs
    # once, not per consumer; the slim schema carries the pushed-down
    # hits column
    assert "ExistingRDD[doc_id" in plan and "hits" in plan


# ---- reciprocal-rank fusion -------------------------------------


def _rrf_nano(*ranks, rrf_k=60):
    return sum(1_000_000_000 // (rrf_k + r) for r in ranks)


def test_rrf_fuse_matches_closed_form(spark):
    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        rrf_fuse,
    )

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
    )
    den = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rank long"
    )
    got = {
        r.doc_id: (r.rrf_nano, r.n_legs, r.rank)
        for r in rrf_fuse([lex, den], k=10).collect()
    }
    # doc 20: ranks (2, 1) -> top; doc 10: (1, 3); singles 30, 40
    exp_scores = {
        10: _rrf_nano(1, 3),
        20: _rrf_nano(2, 1),
        30: _rrf_nano(3),
        40: _rrf_nano(2),
    }
    assert {d: s for d, (s, _, _) in got.items()} == exp_scores
    assert got[20][1] == 2 and got[30][1] == 1
    order = sorted(got, key=lambda d: got[d][2])
    assert order == sorted(
        exp_scores, key=lambda d: (-exp_scores[d], d)
    )


def test_rrf_fuse_cut_and_tie_break(spark):
    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        rrf_fuse,
    )

    # identical single-leg ranks -> tie on score, broken by doc_id asc
    leg = spark.createDataFrame(
        [(5, 1), (3, 1), (9, 2)], "doc_id long, rank long"
    )
    rows = rrf_fuse([leg], k=2).orderBy("rank").collect()
    assert [r.doc_id for r in rows] == [3, 5]


def test_rrf_fuse_validates_inputs(spark):
    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        rrf_fuse,
    )

    with pytest.raises(ValueError):
        rrf_fuse([])
    leg = spark.createDataFrame([(1, 1)], "doc_id long, rank long")
    with pytest.raises(ValueError):
        rrf_fuse([leg], k=0)


def test_inverted_index_matches_query_time_bm25(spark, tmp_path):
    """Materialized-index BM25 == query-time BM25 exactly (shared
    scoring tail), for multiple queries, on generation 0."""
    import pyspark.sql.functions as F

    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_from_index,
        build_inverted_index,
    )
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    docs = read_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    rep = build_inverted_index(docs, idx, n_buckets=8)
    assert rep["generation"] == 0 and rep["n_docs"] == docs.count()
    for q in (["customer", "merge"], ["spark"], ["scan", "window", "key"]):
        a = sorted(
            map(tuple, bm25_topk_from_index(spark, idx, q, k=15).collect())
        )
        b = sorted(map(tuple, bm25_topk(docs, q, k=15).collect()))
        assert a == b, q


def test_inverted_index_append_and_crash_replay(spark, tmp_path):
    """Incremental append == full rebuild on the union corpus; a
    crash between postings and meta leaves readers on the old
    generation; the replayed append converges to the same state (no
    duplicate postings)."""
    import shutil

    import pyspark.sql.functions as F

    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        append_to_index,
        bm25_topk,
        bm25_topk_from_index,
        build_inverted_index,
    )
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    docs = read_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text")
    n = docs.count()
    old = docs.filter(F.col("doc_id") < n * 3 // 4)
    new = docs.filter(F.col("doc_id") >= n * 3 // 4)
    idx = str(tmp_path / "idx")
    build_inverted_index(old, idx, n_buckets=8)
    q = ["customer", "merge", "scan"]
    gen0 = sorted(
        map(tuple, bm25_topk_from_index(spark, idx, q, k=15).collect())
    )
    append_to_index(new, idx)
    want = sorted(map(tuple, bm25_topk(docs, q, k=15).collect()))
    got = sorted(
        map(tuple, bm25_topk_from_index(spark, idx, q, k=15).collect())
    )
    assert got == want
    # crash: meta gen 1 vanishes -> reader rolls back to gen 0 even
    # though gen-1 postings exist on disk
    shutil.rmtree(f"{idx}/meta/upto=1")
    rolled = sorted(
        map(tuple, bm25_topk_from_index(spark, idx, q, k=15).collect())
    )
    assert rolled == gen0
    # replay converges (dynamic overwrite of the same upto dirs)
    append_to_index(new, idx)
    again = sorted(
        map(tuple, bm25_topk_from_index(spark, idx, q, k=15).collect())
    )
    assert again == want


def test_rebuild_over_committed_index_fails_fast(spark, tmp_path):
    """A generation-0 build over an index with committed generations
    must fail fast (stale higher-generation meta would stay readable
    and silently merge with the fresh postings); overwrite=True drops
    the whole index and rebuilds cleanly."""
    import pyspark.sql.functions as F
    import pytest

    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        append_to_index,
        bm25_topk,
        bm25_topk_from_index,
        build_inverted_index,
    )
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    docs = read_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text")
    n = docs.count()
    old = docs.filter(F.col("doc_id") < n // 2)
    new = docs.filter(F.col("doc_id") >= n // 2)
    idx = str(tmp_path / "idx")
    build_inverted_index(old, idx, n_buckets=8)
    append_to_index(new, idx)  # committed generation is now 1
    with pytest.raises(ValueError, match="committed generation"):
        build_inverted_index(old, idx, n_buckets=8)
    # overwrite drops gen 0 AND gen 1 — the rebuilt index answers
    # exactly like a fresh one over `old` (no stale gen-1 leakage)
    build_inverted_index(old, idx, n_buckets=8, overwrite=True)
    q = ["customer", "merge", "scan"]
    got = sorted(
        map(tuple, bm25_topk_from_index(spark, idx, q, k=15).collect())
    )
    want = sorted(map(tuple, bm25_topk(old, q, k=15).collect()))
    assert got == want


def test_crash_mid_overwrite_reads_as_empty_index(spark, tmp_path):
    """The overwrite=True crash contract (documented on
    build_inverted_index): a crash after meta/ is deleted but before
    generation 0 commits leaves postings with NO committed meta —
    readers must see an EMPTY index (fail fast), never a stale or
    mixed generation, and a from-scratch rebuild recovers."""
    import shutil

    import pyspark.sql.functions as F
    import pytest

    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        _committed_generation,
        append_to_index,
        bm25_topk,
        bm25_topk_from_index,
        build_inverted_index,
    )
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    docs = read_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text")
    n = docs.count()
    old = docs.filter(F.col("doc_id") < n // 2)
    idx = str(tmp_path / "idx")
    build_inverted_index(old, idx, n_buckets=8)
    append_to_index(docs.filter(F.col("doc_id") >= n // 2), idx)
    # simulate the crash window: overwrite deletes meta/ first, then
    # dies before the fresh generation-0 dfreq/stats commit — stale
    # postings from BOTH generations are still on disk
    shutil.rmtree(f"{idx}/meta")
    assert _committed_generation(spark, idx) == -1
    with pytest.raises(ValueError, match="no committed index"):
        bm25_topk_from_index(spark, idx, ["customer"], k=5)
    # recovery is a from-scratch rebuild (no overwrite needed: the
    # crashed index has no committed generation) — over a DIFFERENT
    # corpus (ADVICE r10 #1): the crashed build's on-disk postings
    # cover buckets the new corpus may never rewrite, so the rebuild
    # must delete the leftovers wholesale or its dfreq/stats would
    # commit a silent mix of both corpora.  The rebuilt index must
    # answer exactly like a fresh build over the new corpus alone.
    new = docs.filter(F.col("doc_id") >= n // 2)
    build_inverted_index(new, idx, n_buckets=8)
    q = ["customer", "merge", "scan"]
    got = sorted(
        map(tuple, bm25_topk_from_index(spark, idx, q, k=15).collect())
    )
    want = sorted(map(tuple, bm25_topk(new, q, k=15).collect()))
    assert got == want


def test_append_after_crash_with_different_batch(spark, tmp_path):
    """Crash recovery must hold even when the NEXT append carries a
    DIFFERENT batch: orphan postings from the crashed batch (written
    under upto=G+1 before the meta committed) must not leak into the
    replacement generation's results."""
    import shutil

    import pyspark.sql.functions as F

    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        append_to_index,
        bm25_topk,
        bm25_topk_from_index,
        build_inverted_index,
    )
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    docs = read_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text")
    n = docs.count()
    base = docs.filter(F.col("doc_id") < n // 2)
    crashed = docs.filter(
        (F.col("doc_id") >= n // 2) & (F.col("doc_id") < n * 3 // 4)
    )
    replacement = docs.filter(F.col("doc_id") >= n * 3 // 4)
    idx = str(tmp_path / "idx")
    build_inverted_index(base, idx, n_buckets=8)
    # simulate a crash mid-append: postings for `crashed` land under
    # upto=1 but the meta commit never happens
    append_to_index(crashed, idx)
    shutil.rmtree(f"{idx}/meta/upto=1")
    # next append carries a different batch — its bucket set need not
    # cover the crashed batch's buckets, so without the orphan sweep
    # the crashed docs would be folded into generation 1
    append_to_index(replacement, idx)
    q = ["customer", "merge", "scan"]
    want = sorted(
        map(
            tuple,
            bm25_topk(base.unionByName(replacement), q, k=15).collect(),
        )
    )
    got = sorted(
        map(tuple, bm25_topk_from_index(spark, idx, q, k=15).collect())
    )
    assert got == want


def test_inverted_index_read_is_partition_pruned(spark, tmp_path):
    """The indexed query's postings scan must prune on BOTH partition
    columns — bucket (the terms' hash buckets) and upto (committed
    generations) — and push the token filter into the files."""
    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        bm25_topk_from_index,
        build_inverted_index,
    )
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    docs = read_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_inverted_index(docs, idx, n_buckets=8)
    plan = (
        bm25_topk_from_index(spark, idx, ["customer"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pruned = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l
        and "bucket" in l
        and "upto" in l
    ]
    assert pruned, "postings scan not partition-pruned"
    assert any(
        "token" in l and "DataFilters" in l for l in plan.splitlines()
    )


def test_bm25_topk_many_equals_per_query_runs(spark):
    """Batched serving == N single-query runs exactly (same integer
    contribution arithmetic), per-query ranks dense, shared terms
    between queries scored independently per query."""
    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_many,
    )
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    docs = read_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text")
    queries = [
        (1, ["customer", "merge"]),
        (2, ["merge", "spark"]),  # shares 'merge' with query 1
        (3, ["scan"]),
    ]
    qs = spark.createDataFrame(
        queries, "query_id long, terms array<string>"
    )
    many = {
        (r.query_id, r.doc_id): (
            r.n_hit_terms, r.score_micro, r.score, r.rank
        )
        for r in bm25_topk_many(docs, qs, k=10).collect()
    }
    for qid, terms in queries:
        got = {
            k[1]: v for k, v in many.items() if k[0] == qid
        }
        want = {
            r.doc_id: (r.n_hit_terms, r.score_micro, r.score, r.rank)
            for r in bm25_topk(docs, terms, k=10).collect()
        }
        assert got == want, qid


def test_bm25_topk_many_rank_pruned_map_side(spark):
    """The per-query cut must be Catalyst's partial WindowGroupLimit
    below the rank exchange — Q x k x partitions rows shuffle, never
    the full hit set."""
    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        bm25_topk_many,
    )
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    docs = read_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text")
    qs = spark.createDataFrame(
        [(1, ["customer"])], "query_id long, terms array<string>"
    )
    plan = (
        bm25_topk_many(docs, qs, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert any(
        "WindowGroupLimit" in l and "Partial" in l
        for l in plan.splitlines()
    )
