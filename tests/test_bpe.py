"""BPE merge training vs the reference sequential algorithm
(Sennrich et al.): merge table, tiebreaks, greedy application, and
the vocabulary-tokens artifact must match exactly."""

from __future__ import annotations

import collections

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_sparkstreaming_sbt_spark.operators.bpe import (
    bpe_encode_docs,
    bpe_train_merges,
    bpe_vocab_tokens,
    word_vocab,
)


def _ref_bpe(words: dict, n_merges: int):
    """Sequential reference: dict pair counts, argmax with
    (count DESC, left, right) tiebreak, greedy left-to-right merge."""
    syms = {w: list(w) for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = collections.Counter()
        for w, c in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += c
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, cnt))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def _docs_from_words(spark, words: dict):
    text = " ".join(
        " ".join([w] * c) for w, c in sorted(words.items())
    )
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


WORDS = {"low": 5, "lower": 2, "lowest": 2, "newer": 6, "wider": 3}


def test_merge_table_matches_reference(spark):
    df = _docs_from_words(spark, WORDS)
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(df, n_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    ref, _ = _ref_bpe(WORDS, 6)
    assert got == ref


def test_vocab_tokens_match_reference_and_reconstruct(spark):
    df = _docs_from_words(spark, WORDS)
    merges = bpe_train_merges(df, n_merges=6)
    out = {
        r.word: (list(r.tokens), r.wcount)
        for r in bpe_vocab_tokens(df, merges).collect()
    }
    _, ref_syms = _ref_bpe(WORDS, 6)
    assert {w: t for w, (t, _) in out.items()} == ref_syms
    for w, (tokens, c) in out.items():
        assert "".join(tokens) == w  # lossless
        assert c == WORDS[w]


def test_greedy_left_to_right_scan(spark):
    """'aaa' under merge (a, a) tokenizes [aa, a], never [a, aa] —
    the reference scan order."""
    words = {"aaa": 3, "aa": 1}
    df = _docs_from_words(spark, words)
    merges = bpe_train_merges(df, n_merges=1)
    m = merges.collect()[0]
    assert (m.left, m.right) == ("a", "a")
    toks = {
        r.word: list(r.tokens)
        for r in bpe_vocab_tokens(df, merges).collect()
    }
    assert toks["aaa"] == ["aa", "a"]
    assert toks["aa"] == ["aa"]


def test_early_stop_and_validation(spark):
    df = spark.createDataFrame([(1, "a b c a")], ["doc_id", "text"])
    # single-char words: no adjacent pairs, merge table is empty
    assert bpe_train_merges(df, n_merges=4).count() == 0
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train_merges(df, n_merges=0)
    vocab = {r.word: r.wcount for r in word_vocab(df).collect()}
    assert vocab == {"a": 2, "b": 1, "c": 1}


def test_bpe_merges_query_matches_reference_on_test_table(
    spark, sf_small
):
    """The registered rows-only query (``bpe_merges``, n_merges=8
    over the documents table) equals the sequential reference run on
    the same parquet — the pytest gate standing in for the SQL
    oracle the iterative loop can't have."""
    import __spark_entry__ as entry_mod

    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in entry_mod.queries()["bpe_merges"](spark, sf_small)
        .orderBy("merge_rank")
        .collect()
    ]
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    words = collections.Counter()
    for row in docs.select("text").collect():
        words.update(t for t in row.text.split() if t)
    ref, _ = _ref_bpe(dict(words), 8)
    assert got == ref
    assert len(got) == 8


def test_eow_marker_learns_word_final_units(spark):
    """With '</w>' appended, word-final merges are distinct symbols:
    'er</w>' (newer/wider endings) can win where plain 'er' would be
    conflated with word-internal 'er'; tokens still reconstruct
    word + marker, and the reference (words with marker appended as
    one extra symbol) agrees exactly."""
    df = _docs_from_words(spark, WORDS)
    merges = bpe_train_merges(df, n_merges=6, eow_marker="</w>")
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in merges.orderBy("merge_rank").collect()
    ]
    ref_words = {w: c for w, c in WORDS.items()}
    # reference: same algorithm over symbols list(word) + ['</w>']
    syms = {w: list(w) + ["</w>"] for w in ref_words}
    ref = []
    for rank in range(1, 7):
        counts = collections.Counter()
        for w, c in ref_words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += c
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        ref.append((rank, left, right, cnt))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    assert got == ref
    toks = {
        r.word: list(r.tokens)
        for r in bpe_vocab_tokens(
            df, merges, eow_marker="</w>"
        ).collect()
    }
    assert toks == syms
    for w, t in toks.items():
        assert "".join(t) == w + "</w>"
    # some learned unit must actually involve the marker (a
    # word-final merge — what the marker exists to enable)
    assert any("</w>" in l + r for _, l, r, _ in got)


def test_encode_docs_orders_and_counts(spark):
    """Corpus encoding: subwords appear in document word order, the
    per-doc count is the sum of the words' token counts, and an
    empty-text doc comes back with an empty array."""
    df = spark.createDataFrame(
        [(1, "low lower low"), (2, "newer"), (3, "")],
        ["doc_id", "text"],
    )
    merges = bpe_train_merges(df, n_merges=4)
    word_toks = {
        r.word: list(r.tokens)
        for r in bpe_vocab_tokens(df, merges).collect()
    }
    out = {
        r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
        for r in bpe_encode_docs(df, merges).collect()
    }
    expect1 = (
        word_toks["low"] + word_toks["lower"] + word_toks["low"]
    )
    assert out[1] == (expect1, len(expect1))
    assert out[2] == (word_toks["newer"], len(word_toks["newer"]))
    assert out[3] == ([], 0)


_word_lists = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1,
    max_size=8,
).map(lambda ws: dict(collections.Counter(ws)))


@given(words=_word_lists, k=st.integers(1, 3))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_training_matches_reference_on_random_corpora(spark, words, k):
    """Property: distributed training equals the sequential reference
    (merge table AND final vocabulary tokens) on random tiny-alphabet
    corpora where ties and overlapping pairs are common."""
    df = _docs_from_words(spark, words)
    merges_df = bpe_train_merges(df, n_merges=k)
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    ref, ref_syms = _ref_bpe(words, k)
    assert got == ref
    toks = {
        r.word: list(r.tokens)
        for r in bpe_vocab_tokens(df, merges_df).collect()
    }
    assert toks == ref_syms


# ---- production-scale local trainer -----------------------------


def test_local_trainer_matches_distributed_and_reference(spark):
    from kafka_sparkstreaming_sbt_spark.operators.bpe import (
        bpe_train_merges_local,
    )

    df = _docs_from_words(spark, WORDS)
    loc = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges_local(df, n_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    ref, _ = _ref_bpe(WORDS, 6)
    assert loc == ref
    dist = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(df, n_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    assert loc == dist


def test_local_trainer_deep_run_prefix_equals_shallow(spark):
    """Training MORE merges never changes the earlier ones (BPE's
    rank order is greedy-prefix-stable), and the deep run matches
    the sequential reference exactly — the property the >=1k-merge
    SCALECHECK row relies on."""
    from kafka_sparkstreaming_sbt_spark.operators.bpe import (
        bpe_train_merges_local,
    )

    df = _docs_from_words(spark, WORDS)
    deep = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges_local(df, n_merges=50)
        .orderBy("merge_rank")
        .collect()
    ]
    ref, _ = _ref_bpe(WORDS, 50)
    assert deep == ref  # early-stops when no pair remains
    shallow = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges_local(df, n_merges=3)
        .orderBy("merge_rank")
        .collect()
    ]
    assert deep[:3] == shallow


def test_local_trainer_eow_and_vocab_guard(spark):
    from kafka_sparkstreaming_sbt_spark.operators.bpe import (
        bpe_train_merges_local,
    )

    df = _docs_from_words(spark, WORDS)
    a = [
        tuple(r)
        for r in bpe_train_merges(df, n_merges=6, eow_marker="</w>")
        .orderBy("merge_rank")
        .collect()
    ]
    b = [
        tuple(r)
        for r in bpe_train_merges_local(
            df, n_merges=6, eow_marker="</w>"
        )
        .orderBy("merge_rank")
        .collect()
    ]
    assert a == b
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train_merges_local(df, n_merges=2, max_vocab_rows=2)


def test_vocab_tokens_local_and_batched_fold_tiers_agree(spark):
    """The three application tiers of bpe_vocab_tokens (single-
    expression fold, fold batched at fold_batch=2, driver-local
    lowest-rank-first) produce identical mappings."""
    df = _docs_from_words(spark, WORDS)
    merges = bpe_train_merges(df, n_merges=6)
    want = {
        r.word: (list(r.tokens), r.wcount)
        for r in bpe_vocab_tokens(df, merges, method="fold").collect()
    }
    batched = {
        r.word: (list(r.tokens), r.wcount)
        for r in bpe_vocab_tokens(
            df, merges, method="fold", fold_batch=2
        ).collect()
    }
    local = {
        r.word: (list(r.tokens), r.wcount)
        for r in bpe_vocab_tokens(df, merges, method="local").collect()
    }
    assert batched == want
    assert local == want
    with pytest.raises(ValueError, match="unknown method"):
        bpe_vocab_tokens(df, merges, method="nope")
    # The local tier's vocabulary collect carries the SAME bounded-
    # artifact guard as bpe_train_merges_local (auto routes >
    # fold_batch tables here, including via bpe_encode_docs).
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_vocab_tokens(df, merges, method="local", max_vocab_rows=2)


@given(words=_word_lists, k=st.integers(1, 4))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_local_trainer_matches_reference_on_random_corpora(
    spark, words, k
):
    """Property: the incremental-update local trainer (heap argmax,
    touched-set updates) equals the sequential recount-everything
    reference on tiny-alphabet corpora where ties, overlapping pairs,
    and re-created symbol strings are common — AND the local
    application tier reproduces the reference's final vocabulary."""
    from kafka_sparkstreaming_sbt_spark.operators.bpe import (
        bpe_train_merges_local,
    )

    df = _docs_from_words(spark, words)
    merges_df = bpe_train_merges_local(df, n_merges=k)
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    ref, ref_syms = _ref_bpe(words, k)
    assert got == ref
    toks = {
        r.word: list(r.tokens)
        for r in bpe_vocab_tokens(
            df, merges_df, method="local"
        ).collect()
    }
    assert toks == ref_syms
