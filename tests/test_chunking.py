"""Training-set assembly: chunking, deterministic shuffle, sequence
packing — semantics + the scale discipline (no global sort, no
unpartitioned window, chunking shuffle-free)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.chunking import (
    chunk_documents,
    deterministic_shuffle,
    pack_documents,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_boundaries_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(50))  # 50 tokens
    out = chunk_documents(
        _docs(spark, [(1, text)]), chunk_tokens=32, stride=24
    ).collect()
    # starts 0, 24, 48 -> 3 chunks
    assert [(r.chunk_index, r.token_start, r.n_tokens) for r in out] == [
        (0, 0, 32),
        (1, 24, 26),  # truncated tail
        (2, 48, 2),
    ]
    # overlap: chunk 1 re-covers tokens 24..31
    c0, c1 = out[0].chunk_text.split(" "), out[1].chunk_text.split(" ")
    assert c0[24:] == c1[:8]
    assert c1 == [f"t{i}" for i in range(24, 50)]


def test_chunk_short_doc_single_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b c")]), chunk_tokens=32, stride=24
    ).collect()
    assert len(out) == 1
    assert (out[0].n_tokens, out[0].chunk_text) == (3, "a b c")


def test_chunking_adds_no_shuffle(spark):
    df = _docs(spark, [(i, "a b c") for i in range(20)]).repartition(5)
    chunked = chunk_documents(df)
    assert chunked.rdd.getNumPartitions() == 5
    # pre-AQE physical plan (executedPlan's toString prints the
    # initial AND final adaptive plans, double-counting nodes)
    plan = chunked._jdf.queryExecution().sparkPlan().toString()
    # the ONLY exchange is the test's own repartition(5) upstream —
    # the chunking stages themselves are pure map/generate
    assert plan.count("Exchange") == 1
    assert "RoundRobinPartitioning(5)" in plan


def test_shuffle_is_deterministic_and_complete(spark):
    df = _docs(spark, [(i, "x") for i in range(200)])
    a = deterministic_shuffle(df, seed=7).collect()
    b = deterministic_shuffle(df.repartition(13), seed=7).collect()
    # same permutation regardless of input partitioning
    key = lambda rows: sorted((r.doc_id, r.shard, r.pos_in_shard) for r in rows)  # noqa: E731
    assert key(a) == key(b)
    # a permutation: every doc exactly once, positions contiguous per shard
    assert sorted(r.doc_id for r in a) == list(range(200))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # a different seed is a different epoch order
    c = deterministic_shuffle(df, seed=8).collect()
    assert key(a) != key(c)


def test_pack_running_offsets(spark):
    # 3 docs of 100 tokens each in one shard -> contiguous packing
    # into 256-token sequences: starts at 0, 100, 200
    docs = _docs(spark, [(i, " ".join(["w"] * 100)) for i in range(3)])
    out = pack_documents(docs, seq_len=256, n_shards=1).collect()
    got = sorted((r.pos_in_shard, r.seq_index, r.seq_offset) for r in out)
    assert got == [(1, 0, 0), (2, 0, 100), (3, 0, 200)]
    assert all(r.n_tokens == 100 for r in out)


def test_pack_spans_sequence_boundary(spark):
    docs = _docs(spark, [(i, " ".join(["w"] * 200)) for i in range(3)])
    out = {
        r.pos_in_shard: (r.seq_index, r.seq_offset)
        for r in pack_documents(docs, seq_len=256, n_shards=1).collect()
    }
    # doc 2 starts at token 200 of seq 0 (spans into seq 1),
    # doc 3 starts at token 400 -> seq 1 offset 144
    assert out == {1: (0, 0), 2: (0, 200), 3: (1, 144)}


def test_pack_windows_are_all_partitioned(spark):
    """The shuffle/pack plan may window ONLY per shard — never a
    partition-less window (the global-sort scale-killer)."""
    docs = _docs(spark, [(i, "a b") for i in range(50)])
    plan = pack_documents(docs)._jdf.queryExecution().sparkPlan()
    stack = [plan]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "WindowExec":
            assert not node.partitionSpec().isEmpty()
        ch = node.children()
        stack.extend(ch.apply(i) for i in range(ch.size()))


def test_drop_duplicate_chunks_keeps_first_occurrence(spark):
    """The repeated 8-token span survives only in the earliest
    (doc_id, chunk_index); unique text is untouched; a fully-duplicate
    doc comes back empty."""
    from pyspark.sql import functions as F

    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        drop_duplicate_chunks,
    )

    span = " ".join(f"w{i}" for i in range(8))
    uniq = " ".join(f"u{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, span + " " + uniq),  # first occurrence of span + unique
            (2, span),               # exact chunk-dup of doc 1's span
            (3, uniq.replace("u", "v")),  # untouched
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in drop_duplicate_chunks(docs, chunk_tokens=8).collect()
    }
    assert out[1].clean_text == span + " " + uniq
    assert out[1].n_dropped == 0
    assert out[2].clean_text == ""
    assert out[2].n_dropped == 1
    assert out[3].n_dropped == 0
    total_chunks = sum(r.n_chunks for r in out.values())
    assert total_chunks == 4  # doc1: 2 chunks, doc2: 1, doc3: 1


def test_drop_duplicate_chunks_negative_ids(spark):
    """First-occurrence election is a struct-min over (doc_id,
    chunk_index) — negative ids order correctly and there is no
    packed-long range limit to overflow."""
    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        drop_duplicate_chunks,
    )

    span = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(-5, span), (7, span), (1 << 40, span)], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in drop_duplicate_chunks(docs, chunk_tokens=8).collect()
    }
    assert out[-5].clean_text == span and out[-5].n_dropped == 0
    assert out[7].clean_text == "" and out[7].n_dropped == 1
    assert out[1 << 40].clean_text == "" and out[1 << 40].n_dropped == 1


def test_remove_common_chunks_strips_boilerplate_everywhere(spark):
    """A span in >= min_docs distinct docs disappears from ALL of
    them (no first-occurrence survivor — the contrast with
    drop_duplicate_chunks); rarer spans survive, and within-doc
    repetition alone does not trip the document-frequency threshold."""
    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        remove_common_chunks,
    )

    boiler = " ".join(f"b{i}" for i in range(8))
    rare = " ".join(f"r{i}" for i in range(8))
    solo = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + solo),
            (2, boiler + " " + rare),
            (3, boiler),
            (4, rare),
            # within-doc repetition: 3 occurrences but doc-freq 1
            (5, solo + " " + solo + " " + solo),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in remove_common_chunks(
            docs, chunk_tokens=8, min_docs=3
        ).collect()
    }
    assert out[1].clean_text == solo
    assert out[2].clean_text == rare
    assert out[3].clean_text == ""  # pure boilerplate doc empties
    assert out[3].n_removed == 1
    assert out[4].clean_text == rare  # doc-freq 2 < 3: kept
    assert out[5].n_removed == 0  # within-doc repeats don't count
    assert out[5].n_chunks == 3


def test_remove_duplicate_spans_alignment_free(spark):
    """The ExactSubstr contrast case: a duplicated run at DIFFERENT
    offsets in each doc (off the chunk grid) is excised from both;
    unique surroundings survive; overlapping dup windows merge into
    ONE maximal span; within-doc repeats don't trip the cross-doc
    threshold; short docs pass through."""
    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        remove_duplicate_spans,
    )

    run = " ".join(f"d{i}" for i in range(12))  # 12-token dup run
    u = " ".join(f"u{i}" for i in range(5))
    v = " ".join(f"v{i}" for i in range(3))
    w_pre = "w0"
    solo = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, u + " " + run + " " + v),  # run at offset 5
            (2, w_pre + " " + run),  # run at offset 1
            (3, run),  # fully covered -> empties
            # within-doc repetition only: doc-freq 1, untouched
            (4, solo + " " + solo),
            (5, "a b c"),  # shorter than the window: passthrough
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in remove_duplicate_spans(
            docs, window_tokens=8, min_docs=2
        ).collect()
    }
    # 12-token run -> 5 overlapping 8-windows -> ONE merged span
    assert out[1].clean_text == u + " " + v
    assert (out[1].n_spans, out[1].tokens_removed) == (1, 12)
    assert out[2].clean_text == w_pre
    assert (out[2].n_spans, out[2].tokens_removed) == (1, 12)
    assert out[3].clean_text == ""
    assert (out[3].n_spans, out[3].tokens_removed) == (1, 12)
    assert out[4].clean_text == solo + " " + solo
    assert (out[4].n_spans, out[4].tokens_removed) == (0, 0)
    assert out[5].clean_text == "a b c"
    assert (out[5].n_spans, out[5].tokens_removed) == (0, 0)


def test_remove_duplicate_spans_disjoint_spans_counted(spark):
    """Two dup runs separated by unique text stay TWO spans (the
    island break fires on the gap) and both are excised."""
    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        remove_duplicate_spans,
    )

    r1 = " ".join(f"p{i}" for i in range(8))
    r2 = " ".join(f"q{i}" for i in range(8))
    mid = " ".join(f"m{i}" for i in range(4))
    docs = spark.createDataFrame(
        [
            (1, r1 + " " + mid + " " + r2),
            (2, r1),
            (3, r2),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in remove_duplicate_spans(
            docs, window_tokens=8, min_docs=2
        ).collect()
    }
    assert out[1].clean_text == mid
    assert (out[1].n_spans, out[1].tokens_removed) == (2, 16)


def test_incremental_span_dedup_matches_full_run_on_union(spark):
    """The documented equivalence: incremental(batch, corpus) ==
    full-run(corpus+batch, min_docs=2) restricted to batch rows —
    corpus hits, within-batch dups, and corpus-internal-only dups
    (which must NOT mark batch text) all exercised.  Both corpus
    paths (docs / materialized hash table) agree."""
    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        remove_duplicate_spans,
        remove_duplicate_spans_incremental,
        window_hash_table,
    )

    run = " ".join(f"d{i}" for i in range(10))  # corpus<->batch dup
    bb = " ".join(f"b{i}" for i in range(9))  # within-batch dup
    cc = " ".join(f"c{i}" for i in range(12))  # corpus-internal only
    u = " ".join(f"u{i}" for i in range(4))
    corpus = spark.createDataFrame(
        [(1, run), (2, cc), (3, cc + " " + u)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (10, u + " " + run),  # loses run via corpus membership
            (11, bb + " x0"),  # loses bb via within-batch count
            (12, "y0 " + bb),
            (13, "z0 z1 z2 z3 z4 z5 z6 z7 z8"),  # untouched
        ],
        ["doc_id", "text"],
    )
    inc = {
        r.doc_id: r
        for r in remove_duplicate_spans_incremental(
            batch, corpus_docs=corpus, window_tokens=8
        ).collect()
    }
    full = {
        r.doc_id: r
        for r in remove_duplicate_spans(
            corpus.unionByName(batch), window_tokens=8, min_docs=2
        ).collect()
        if r.doc_id >= 10
    }
    assert set(inc) == set(full) == {10, 11, 12, 13}
    for k in inc:
        assert (
            inc[k].clean_text,
            inc[k].n_spans,
            inc[k].tokens_removed,
        ) == (full[k].clean_text, full[k].n_spans, full[k].tokens_removed)
    assert inc[10].clean_text == u
    assert inc[11].clean_text == "x0"
    assert inc[12].clean_text == "y0"
    assert inc[13].tokens_removed == 0
    # corpus-internal dup (cc in docs 2+3) never marks batch text:
    # doc 13 is whole, and no batch doc contains cc anyway
    via_table = {
        r.doc_id: (r.clean_text, r.n_spans, r.tokens_removed)
        for r in remove_duplicate_spans_incremental(
            batch,
            corpus_hashes=window_hash_table(corpus, window_tokens=8),
            window_tokens=8,
        ).collect()
    }
    assert via_table == {
        k: (v.clean_text, v.n_spans, v.tokens_removed)
        for k, v in inc.items()
    }


def test_duplicated_span_report_counts_and_order(spark):
    """n_docs is DISTINCT docs, n_occurrences counts every
    occurrence (within-doc repeats included), windows in one doc
    only are excluded, ordering is (n_docs, n_occurrences) desc with
    the md5 tiebreak, and top_k cuts deterministically."""
    import hashlib

    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        duplicated_span_report,
    )

    B = " ".join(f"b{i}" for i in range(8))  # 3 docs, 4 occurrences
    P = " ".join(f"p{i}" for i in range(8))  # 2 docs
    U = " ".join(f"u{i}" for i in range(8))  # 1 doc: excluded
    docs = spark.createDataFrame(
        [
            (1, B + " m0 m1 m2 " + B),
            (2, B),
            (3, B),
            (4, P),
            (5, P),
            (6, U),
        ],
        ["doc_id", "text"],
    )
    out = duplicated_span_report(
        docs, window_tokens=8, top_k=20
    ).collect()
    got = {r.span_text: r for r in out}
    assert set(got) == {B, P}
    assert (got[B].n_docs, got[B].n_occurrences) == (3, 4)
    assert (got[P].n_docs, got[P].n_occurrences) == (2, 2)
    assert got[B].window_md5 == hashlib.md5(B.encode()).hexdigest()
    top1 = duplicated_span_report(
        docs, window_tokens=8, top_k=1
    ).collect()
    assert [r.span_text for r in top1] == [B]
    import pytest

    with pytest.raises(ValueError, match="top_k"):
        duplicated_span_report(docs, top_k=0)


def test_incremental_span_dedup_validation(spark):
    import pytest

    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        remove_duplicate_spans_incremental,
        window_hash_table,
    )

    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="exactly one"):
        remove_duplicate_spans_incremental(d)
    with pytest.raises(ValueError, match="exactly one"):
        remove_duplicate_spans_incremental(
            d, corpus_docs=d, corpus_hashes=window_hash_table(d)
        )
    with pytest.raises(ValueError, match="min_docs_within"):
        remove_duplicate_spans_incremental(
            d, corpus_docs=d, min_docs_within=1
        )


def test_remove_duplicate_spans_validation(spark):
    import pytest

    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        remove_duplicate_spans,
    )

    with pytest.raises(ValueError, match="min_docs"):
        remove_duplicate_spans(_docs(spark, [(1, "a b")]), min_docs=1)
    with pytest.raises(ValueError, match="window_tokens"):
        remove_duplicate_spans(
            _docs(spark, [(1, "a b")]), window_tokens=1
        )


def test_remove_common_chunks_threshold_validation(spark):
    import pytest

    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        remove_common_chunks,
    )

    with pytest.raises(ValueError, match="min_docs"):
        remove_common_chunks(_docs(spark, [(1, "a b")]), min_docs=1)
