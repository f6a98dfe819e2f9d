"""Property-based invariants (hypothesis) for training-set assembly —
the contracts downstream renderers rely on, checked over generated
corpora rather than hand-picked examples:

- chunking covers every token and reconstructs the doc at
  stride == chunk_tokens (disjoint chunks);
- packing tiles each shard's token stream exactly (no gaps, no
  overlap) and never loses a document;
- duplicated-span excision equals a brute-force reference model
  (window dict + interval merge) on dense tiny-vocab corpora where
  islands overlap heavily.

Example counts are kept small: every example runs real Spark jobs on
the shared session (~0.3 s each)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_sparkstreaming_sbt_spark.operators.chunking import (
    chunk_documents,
    pack_documents,
    remove_duplicate_spans,
)


def _reference_span_dedup(corpus, w, min_docs):
    """Brute-force oracle: duplicated windows via a dict, interval
    merge, excision — the semantics remove_duplicate_spans must
    reproduce distributed."""
    toks = {d: t.split(" ") for d, t in corpus}
    seen = {}
    for d, ts in toks.items():
        for s in range(len(ts) - w + 1):
            seen.setdefault(" ".join(ts[s : s + w]), set()).add(d)
    dup = {k for k, v in seen.items() if len(v) >= min_docs}
    out = {}
    for d, ts in toks.items():
        marks = [
            s
            for s in range(len(ts) - w + 1)
            if " ".join(ts[s : s + w]) in dup
        ]
        spans = []
        for s in marks:
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], s + w)
            else:
                spans.append([s, s + w])
        keep = [
            t
            for i, t in enumerate(ts)
            if not any(a <= i < b for a, b in spans)
        ]
        out[d] = (
            " ".join(keep),
            len(spans),
            sum(b - a for a, b in spans),
        )
    return out

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# docs of 1..60 single-char tokens; ids unique by construction
_corpora = st.lists(
    st.integers(min_value=1, max_value=60), min_size=1, max_size=8
).map(
    lambda lens: [
        (i, " ".join(f"t{i}x{j}" for j in range(n)))
        for i, n in enumerate(lens)
    ]
)


@given(corpus=_corpora, chunk=st.integers(4, 16))
@settings(**_SETTINGS)
def test_disjoint_chunks_reconstruct_documents(spark, corpus, chunk):
    """stride == chunk_tokens: chunks partition the token stream, so
    joining them in chunk_index order rebuilds every document."""
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    rows = chunk_documents(
        df, chunk_tokens=chunk, stride=chunk
    ).collect()
    rebuilt = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_index)):
        rebuilt[r.doc_id] = (
            rebuilt.get(r.doc_id, "") + " " + r.chunk_text
        ).strip()
        assert 1 <= r.n_tokens <= chunk
    assert rebuilt == dict(corpus)


@given(corpus=_corpora, chunk=st.integers(6, 16), stride=st.integers(2, 6))
@settings(**_SETTINGS)
def test_overlapping_chunks_cover_every_token(spark, corpus, chunk, stride):
    """stride < chunk_tokens: every token index of every doc appears
    in at least one chunk window [start, start + chunk)."""
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    rows = chunk_documents(
        df, chunk_tokens=chunk, stride=stride
    ).collect()
    covered = {}
    for r in rows:
        covered.setdefault(r.doc_id, set()).update(
            range(r.token_start, r.token_start + r.n_tokens)
        )
    for doc_id, text in corpus:
        assert covered[doc_id] == set(range(len(text.split())))


@given(corpus=_corpora, seq_len=st.integers(8, 64), seed=st.integers(0, 3))
@settings(**_SETTINGS)
def test_packing_tiles_each_shard_exactly(spark, corpus, seq_len, seed):
    """Per shard, in pos order, each doc starts exactly where the
    previous one ended (seq_index*seq_len + seq_offset is a running
    token total), and no document is lost or duplicated."""
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    rows = pack_documents(
        df, seq_len=seq_len, seed=seed, n_shards=4
    ).collect()
    assert sorted(r.doc_id for r in rows) == [i for i, _ in corpus]
    streams = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.pos_in_shard)):
        expect = streams.get(r.shard, 0)
        assert r.seq_index * seq_len + r.seq_offset == expect
        streams[r.shard] = expect + r.n_tokens
    for (doc_id, text), r in zip(
        sorted(corpus), sorted(rows, key=lambda r: r.doc_id)
    ):
        assert r.n_tokens == len(text.split())


# corpora WITH duplicate spans: tokens drawn from a tiny alphabet so
# 4-token chunks repeat across docs often
_dup_corpora = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=20),
    min_size=1,
    max_size=6,
).map(
    lambda docs: [(i, " ".join(toks)) for i, toks in enumerate(docs)]
)


@given(corpus=_dup_corpora)
@settings(**_SETTINGS)
def test_drop_duplicate_chunks_matches_reference_model(spark, corpus):
    """Checked against a sequential python model of the C4 span rule:
    scanning docs in (doc_id, chunk_index) order and keeping only
    first-seen chunks reproduces clean_text, n_chunks and n_dropped
    exactly — i.e. the distributed first-occurrence election equals
    the sequential-scan semantics."""
    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        drop_duplicate_chunks,
    )

    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           drop_duplicate_chunks(df, chunk_tokens=4).collect()}

    seen: set[str] = set()
    for doc_id, text in sorted(corpus):
        toks = text.split(" ")
        chunks = [" ".join(toks[s:s + 4]) for s in range(0, len(toks), 4)]
        kept = []
        for ch in chunks:
            if ch not in seen:
                seen.add(ch)
                kept.append(ch)
        r = out[doc_id]
        assert r.n_chunks == len(chunks)
        assert r.n_dropped == len(chunks) - len(kept)
        assert r.clean_text == " ".join(kept)


# TINY vocabulary (3 symbols) so duplicated windows are dense and
# overlapping — the adversarial case for the gaps-and-islands merge
_dense_corpora = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=1, max_size=24
    ),
    min_size=2,
    max_size=5,
).map(
    lambda docs: [(i, " ".join(ts)) for i, ts in enumerate(docs)]
)


@given(
    corpus=_dense_corpora,
    w=st.integers(2, 6),
    min_docs=st.integers(2, 3),
)
@settings(**_SETTINGS)
def test_span_dedup_matches_brute_force(spark, corpus, w, min_docs):
    """remove_duplicate_spans reproduces the brute-force reference
    (dict of windows, interval merge, excision) on dense tiny-vocab
    corpora where nearly every window duplicates and islands overlap
    heavily."""
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        r.doc_id: (r.clean_text, r.n_spans, r.tokens_removed)
        for r in remove_duplicate_spans(
            df, window_tokens=w, min_docs=min_docs
        ).collect()
    }
    assert got == _reference_span_dedup(corpus, w, min_docs)
