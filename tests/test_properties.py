"""Property-based tests (hypothesis) for the semantics the golden
fixtures pin pointwise: sliding-window duplication/conservation,
rollup consistency, and dedup idempotence hold for ARBITRARY inputs,
not just the pinned examples."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.dedup import dedup_transactions
from kafka_sparkstreaming_sbt_spark.operators.rollup import (
    daily_rollup_deterministic,
    daily_spending_direct,
)
from kafka_sparkstreaming_sbt_spark.operators.windows import windowed_spending

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# amounts in cents -> exact doubles; timestamps within one day, whole
# seconds (away from midnight so both sliding windows share the date)
txn_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=99),     # customer
        st.integers(min_value=3600, max_value=82800),  # second of day
        st.integers(min_value=1, max_value=100_000),   # cents
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, rows):
    base = dt.datetime(2025, 3, 10)
    data = [
        (
            f"t{i}",
            str(cust),
            base + dt.timedelta(seconds=sec),
            cents / 100.0,
        )
        for i, (cust, sec, cents) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "transaction_id string, customer_id string, "
        "timestamp timestamp, amount double",
    )


@_slow
@given(rows=txn_strategy)
def test_sliding_window_duplicates_each_event_twice(spark, rows):
    """A1 semantics: every event lands in exactly ceil(10/5)=2 windows
    with its FULL amount, so the windowed total is exactly 2x the
    input total (the invariant behind the golden 6-row fixture)."""
    df = _df(spark, rows)
    out = windowed_spending(df, per_transaction=True).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("window_total_spent"), 2).alias("total"),
    ).first()
    assert out.n == 2 * len(rows)
    assert out.total == round(
        2 * sum(c for _, _, c in rows) / 100.0, 2
    )


@_slow
@given(rows=txn_strategy)
def test_rollup_equals_direct_daily(spark, rows):
    """The windowed-then-deduped rollup and the commented-out 'direct'
    semantics (A4) agree on every (customer, date) total — the
    equivalence the reference's golden test asserts for one input."""
    df = _df(spark, rows)
    via_window = daily_rollup_deterministic(
        windowed_spending(df, per_transaction=True)
    )
    direct = daily_spending_direct(df)
    a = {
        (r.customer_id, str(r.transaction_date)): round(r.total_spent, 2)
        for r in via_window.collect()
    }
    b = {
        (r.customer_id, str(r.transaction_date)): round(r.total_spent, 2)
        for r in direct.collect()
    }
    assert a == b


@_slow
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # txn id (collisions!)
            st.integers(min_value=0, max_value=99),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_dedup_idempotent_and_exact(spark, rows):
    """D1: one surviving row per transaction_id; reapplying is a
    no-op."""
    base = dt.datetime(2025, 3, 10, 12)
    df = spark.createDataFrame(
        [
            (f"t{tid}", str(cust), base, 1.0)
            for tid, cust in rows
        ],
        "transaction_id string, customer_id string, "
        "timestamp timestamp, amount double",
    )
    once = dedup_transactions(df)
    assert once.count() == len({tid for tid, _ in rows})
    assert dedup_transactions(once).count() == once.count()


vec_groups_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # group
        st.lists(
            st.integers(min_value=-3, max_value=3),
            min_size=4,
            max_size=4,
        ),
    ),
    min_size=0,
    max_size=20,
)


@_slow
@given(rows=vec_groups_strategy)
def test_blockwise_group_pair_scan_matches_brute_force(spark, rows):
    """The BLAS per-group pair scan (_group_pairs_numpy) and SemDeDup
    drop scan (_group_dropped_numpy) run blockwise; block=3 forces
    every boundary case (pairs inside one block, across blocks, in the
    never-a-left-row first slot).  Reference model: python brute force
    over all in-group pairs with the same 6-dp rounding; zero-norm
    vectors never pair (NaN cosine compares False on the numpy tier).
    """
    import math as m

    from kafka_sparkstreaming_sbt_spark.operators.similarity import (
        _group_dropped_numpy,
        _group_pairs_numpy,
    )

    threshold = 0.5
    df = spark.createDataFrame(
        [(i, g, [float(x) for x in v]) for i, (g, v) in enumerate(rows)],
        "vec_id long, grp long, embedding array<double>",
    )

    expect_pairs = {}
    expect_dropped = set()
    for a, (ga, va) in enumerate(rows):
        for b in range(a + 1, len(rows)):
            gb, vb = rows[b]
            if ga != gb:
                continue
            na = m.sqrt(sum(x * x for x in va))
            nb = m.sqrt(sum(x * x for x in vb))
            if na == 0.0 or nb == 0.0:
                continue
            cos = round(sum(x * y for x, y in zip(va, vb)) / (na * nb), 6)
            if cos >= threshold:
                expect_pairs[(a, b)] = cos
                expect_dropped.add(b)

    got_pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in _group_pairs_numpy(
            df, "grp", threshold, "embedding", "vec_id", block=3
        ).collect()
    }
    assert set(got_pairs) == set(expect_pairs)
    for k, v in expect_pairs.items():
        assert abs(got_pairs[k] - v) <= 2e-6

    got_dropped = {
        r.vec_id
        for r in _group_dropped_numpy(
            df, "grp", threshold, "embedding", "vec_id", block=3
        ).collect()
    }
    assert got_dropped == expect_dropped


# ---------------------------------------------------------------- avro --

_AVRO_PROP_SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "a_long", "type": "long"},
        {"name": "a_str", "type": ["null", "string"]},
        {"name": "a_double", "type": "double"},
        {"name": "a_bool", "type": ["null", "boolean"]},
        {"name": "a_bytes", "type": "bytes"},
        {"name": "an_int", "type": ["null", "int"]},
        # null-SECOND union: the wire index is positional, so this
        # branch order must round-trip too (regression: reader/writer
        # once hard-coded null as branch 0)
        {"name": "b_str", "type": ["string", "null"]},
        # ONE-branch union: the spec still encodes a branch-index
        # varint (always 0) — decoding it as a bare primitive
        # misaligns every following field (regression: _field_type
        # once normalized ["long"] to plain "long")
        {"name": "c_one", "type": ["long"]},
    ],
}

_avro_record = st.fixed_dictionaries(
    {
        "a_long": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "a_str": st.none() | st.text(max_size=40),
        "a_double": st.floats(allow_nan=False),
        "a_bool": st.none() | st.booleans(),
        "a_bytes": st.binary(max_size=30),
        "an_int": st.none()
        | st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "b_str": st.none() | st.text(max_size=20),
        "c_one": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    }
)


def test_avro_one_branch_union_wire_format():
    """A ["string"] union field carries a leading branch-index 0 on
    the wire per the Avro spec — byte-compatible with standard Avro
    writers, and nulls in it are rejected (no null branch)."""
    import io

    import pytest

    from kafka_sparkstreaming_sbt_spark.sources.avro_ocf import (
        _record_reader,
        encode_record_bytes,
    )

    schema = {
        "type": "record",
        "name": "one",
        "fields": [{"name": "s", "type": ["string"]}],
    }
    body = encode_record_bytes({"s": "hi"}, schema)
    # zigzag varint 0, then length-2 string
    assert body == b"\x00\x04hi"
    assert _record_reader(schema)(io.BytesIO(body)) == {"s": "hi"}
    # a nonzero branch index is corrupt data, not a silent misread
    with pytest.raises(ValueError, match="union index"):
        _record_reader(schema)(io.BytesIO(b"\x02\x04hi"))
    with pytest.raises(ValueError, match="non-nullable"):
        encode_record_bytes({"s": None}, schema)


@given(st.lists(_avro_record, max_size=30))
@settings(deadline=None, max_examples=60)
def test_avro_record_body_roundtrip(records):
    """Pure-Python Avro codec property: encode_record_bytes ->
    _record_reader is the identity for every supported primitive /
    nullable-union value, INCLUDING the full int64/float range and
    concatenated bodies (records must be self-delimiting — a length
    bug in one field corrupts every later record in a Kafka batch or
    OCF block)."""
    import io

    from kafka_sparkstreaming_sbt_spark.sources.avro_ocf import (
        _record_reader,
        encode_record_bytes,
    )

    blob = b"".join(
        encode_record_bytes(r, _AVRO_PROP_SCHEMA) for r in records
    )
    buf = io.BytesIO(blob)
    read = _record_reader(_AVRO_PROP_SCHEMA)
    for rec in records:
        assert read(buf) == rec
    assert not buf.read(1)  # fully consumed, no trailing bytes


@given(st.lists(_avro_record, min_size=1, max_size=25))
@settings(deadline=None, max_examples=30)
def test_avro_ocf_container_roundtrip(records):
    """Container-level property: write_ocf_bytes -> iter_ocf_records
    is the identity across block boundaries and both codecs."""
    from kafka_sparkstreaming_sbt_spark.sources.avro_ocf import (
        iter_ocf_records,
        write_ocf_bytes,
    )

    for codec in ("null", "deflate"):
        data = write_ocf_bytes(
            records, _AVRO_PROP_SCHEMA, codec=codec, rows_per_block=7
        )
        assert list(iter_ocf_records(data)) == records


# ---- integer PageRank: Spark == pure-Python recurrence ------------

edge_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=11),
        st.integers(min_value=0, max_value=11),
    ).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=20,
    unique=True,
)


@given(edges=edge_strategy)
@_slow
def test_pagerank_matches_recurrence_on_arbitrary_graphs(spark, edges):
    from kafka_sparkstreaming_sbt_spark.operators.graph import pagerank

    from tests.test_graph import _pr_expected

    nodes = list(range(12))
    ndf = spark.createDataFrame([(i,) for i in nodes], "doc_id long")
    if edges:
        edf = spark.createDataFrame(edges, "doc_a long, doc_b long")
    else:
        edf = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {
        r.doc_id: r.rank_pico
        for r in pagerank(ndf, edf, n_iter=2).collect()
    }
    assert got == _pr_expected(nodes, edges, 2)


# ---- RRF fusion: Spark == closed form -----------------------------

leg_strategy = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=30),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    min_size=1,
    max_size=3,
)


@given(legs=leg_strategy)
@_slow
def test_rrf_fuse_matches_closed_form_on_arbitrary_legs(spark, legs):
    from kafka_sparkstreaming_sbt_spark.operators.retrieval import (
        rrf_fuse,
    )

    dfs = [
        spark.createDataFrame(
            [(d, i + 1) for i, d in enumerate(leg)],
            "doc_id long, rank long",
        )
        for leg in legs
    ]
    expected: dict[int, list[int]] = {}
    for leg in legs:
        for i, d in enumerate(leg):
            expected.setdefault(d, []).append(i + 1)
    scores = {
        d: sum(1_000_000_000 // (60 + r) for r in rs)
        for d, rs in expected.items()
    }
    k = len(scores)  # no cut: check every fused row
    got = {
        r.doc_id: (r.rrf_nano, r.n_legs)
        for r in rrf_fuse(dfs, k=k).collect()
    }
    assert {d: s for d, (s, _) in got.items()} == scores
    assert {d: n for d, (_, n) in got.items()} == {
        d: len(rs) for d, rs in expected.items()
    }
