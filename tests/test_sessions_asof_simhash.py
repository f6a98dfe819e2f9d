"""Unit tests for the round-2 extension operators: session windows,
as-of join, SimHash, and exact n-gram Jaccard — small controlled
fixtures pinning the semantics the DuckDB oracle then re-checks at
sf0.01."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.asof import (
    asof_join,
    purchases_with_last_click,
)
from kafka_sparkstreaming_sbt_spark.operators.dedup_fuzzy import (
    ngram_jaccard_pairs,
)
from kafka_sparkstreaming_sbt_spark.operators.sessions import user_sessions
from kafka_sparkstreaming_sbt_spark.operators.simhash import (
    hamming,
    simhash_fingerprints,
    simhash_near_dup_pairs,
    with_simhash,
)


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 12, minute, second, micro)


# ------------------------------------------------------------------ sessions


def test_session_window_gap_split(spark):
    """Events within the gap merge; a gap-sized pause starts a new
    session; session_end = last event + gap."""
    rows = [
        (1, _ts(0), 1.0),
        (1, _ts(10), 2.0),   # 10 min later -> same session (gap 30m)
        (1, _ts(50), 4.0),   # 40 min after last -> NEW session
        (2, _ts(5), 8.0),    # other user independent
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = user_sessions(df, gap="30 minutes").orderBy("user_id", "session_start")
    got = [
        (r.user_id, r.session_start.minute, r.session_end.minute,
         r.n_events, r.total_value)
        for r in out.collect()
    ]
    assert got == [
        (1, 0, 40, 2, 3.0),   # [12:00, 12:10+30m)
        (1, 50, 20, 1, 4.0),  # [12:50, 13:20)
        (2, 5, 35, 1, 8.0),
    ]


# ------------------------------------------------------------------ as-of


def test_asof_join_picks_most_recent_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(30), "p2"), (2, _ts(5), "p3")],
        "user_id long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 100.0), (1, _ts(10), 200.0), (1, _ts(20), 300.0)],
        "user_id long, ts timestamp, ref double",
    )
    out = asof_join(left, right, on="user_id", right_cols=["ref"])
    got = {r.name: r.ref_asof for r in out.collect()}
    # p1 at 12:10 matches the 12:10 ref (inclusive "at or before");
    # p2 matches the latest earlier ref; p3's user has no refs -> NULL
    assert got == {"p1": 200.0, "p2": 300.0, "p3": None}


def test_purchase_attribution_on_events(spark, sf_small):
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    events = read_table(spark, sf_small, "events")
    out = purchases_with_last_click(events)
    rows = out.collect()
    n_purchases = events.filter(F.col("event_type") == "purchase").count()
    assert len(rows) == n_purchases  # left-join keeps clickless purchases
    matched = [r for r in rows if r.last_click_ts is not None]
    assert matched, "expected at least one attributed purchase"
    assert all(r.wait_us >= 0 for r in matched)
    assert all(r.last_click_ts <= r.ts for r in matched)


# ------------------------------------------------------------------ simhash


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # identical
            (3, "the quick brown fox jumps over the lazy cat"),  # 1 token off
            (4, "completely different text about spark engines here"),
        ],
        "doc_id long, text string",
    )
    out = with_simhash(df).select("doc_id", "simhash")
    fps = {r.doc_id: r.simhash for r in out.collect()}
    assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in fps.values())
    assert fps[1] == fps[2]  # identical text -> identical fingerprint

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    # near-identical docs are closer than unrelated ones
    assert ham(fps[1], fps[3]) < ham(fps[1], fps[4])

    # the codegen fast path computes the identical bit family
    fast = {
        r.doc_id: r.simhash for r in simhash_fingerprints(df).collect()
    }
    assert fast == fps


def test_simhash_near_dup_pairs_finds_duplicates(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "unrelated words entirely disjoint vocabulary set here now"),
        ],
        "doc_id long, text string",
    )
    out = simhash_near_dup_pairs(df, n_bands=4, max_hamming=3)
    got = {(r.doc_a, r.doc_b): r.hamming for r in out.collect()}
    assert got == {(1, 2): 0}
    # result is banding-independent: any complete banding yields
    # exactly the hamming-ball pairs
    out8 = simhash_near_dup_pairs(df, n_bands=8, max_hamming=3)
    assert {(r.doc_a, r.doc_b): r.hamming for r in out8.collect()} == got


def test_simhash_hot_bucket_cap(spark):
    """Boilerplate guard parity with minhash (VERDICT r2 #2): identical
    template docs share EVERY band bucket; capping drops those buckets
    before the quadratic join while pairs in cold buckets survive."""
    template = "terms of service apply to every page of this site always"
    rows = [(i, template) for i in range(20)]
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    rows += [
        (200 + i, " ".join(f"w{i}q{j}" for j in range(8))) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_dup_pairs(df).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_dup_pairs(df, max_bucket_size=10).collect()
    }
    template_pairs = {(a, b) for a in range(20) for b in range(20) if a < b}
    assert template_pairs <= uncapped and (100, 101) in uncapped
    assert capped & template_pairs == set()
    assert (100, 101) in capped
    assert capped <= uncapped


def test_hamming_column(spark):
    df = spark.createDataFrame([("1100", "1001")], "a string, b string")
    assert df.select(hamming(F.col("a"), F.col("b"), 4).alias("h")).first().h == 2


# ------------------------------------------------------------------ n-gram


def test_ngram_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),     # shingles: abc bcd cde
            (2, "a b c d e"),     # identical -> J = 1.0
            (3, "a b c x y"),     # shares only 'a b c' -> J = 1/5
            (4, "q r s t u"),     # disjoint
        ],
        "doc_id long, text string",
    )
    # threshold=0 keeps EVERY candidate the prefix filter can emit
    # (prefix = whole set), i.e. all pairs sharing any shingle
    out = ngram_jaccard_pairs(df, n=3, threshold=0.0)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in out.collect()}
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == 0.2
    assert got[(2, 3)] == 0.2
    assert (1, 4) not in got  # no shared shingle -> no candidate row
    out_t = ngram_jaccard_pairs(df, n=3, threshold=0.6)
    assert {(r.doc_a, r.doc_b) for r in out_t.collect()} == {(1, 2)}


def test_ngram_jaccard_prefix_filter_is_complete(spark):
    # docs built so the only shared shingles are FREQUENT (sort to the
    # suffix): prefix filtering must still find every pair >= t, per
    # the completeness theorem — high-J pairs always overlap prefixes
    rows = [
        (1, "x y z a b c d"),
        (2, "x y z a b c e"),   # J(1,2) = 4/6 = 0.667 >= 0.6
        (3, "x y z q r s t"),   # shares only the common 'x y z'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(df, n=3, threshold=0.6)
    assert {(r.doc_a, r.doc_b) for r in out.collect()} == {(1, 2)}


def test_asof_tolerance_and_forward(spark):
    """merge_asof semantics: tolerance nulls stale matches (never
    falls back to an older row); forward picks the next at-or-after
    reference row."""
    import datetime as dt

    from kafka_sparkstreaming_sbt_spark.operators.asof import asof_join

    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    left = spark.createDataFrame(
        [(1, ts(100), "a"), (1, ts(500), "b"), (2, ts(50), "c")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, ts(90), "r90"), (1, ts(480), "r480"), (2, ts(60), "r60")],
        ["k", "ts", "ref"],
    )
    back = {
        r.tag: r.ref_asof
        for r in asof_join(left, right, on="k").collect()
    }
    assert back == {"a": "r90", "b": "r480", "c": None}
    # tolerance 15 s: b's match at 480 (gap 20 s) is nulled, NOT
    # replaced by r90
    tol = {
        r.tag: r.ref_asof
        for r in asof_join(
            left, right, on="k", tolerance_seconds=15
        ).collect()
    }
    assert tol == {"a": "r90", "b": None, "c": None}
    fwd = {
        r.tag: r.ref_asof
        for r in asof_join(
            left, right, on="k", direction="forward"
        ).collect()
    }
    assert fwd == {"a": "r480", "b": None, "c": "r60"}


def test_asof_match_is_atomic_null_payload_stays_null(spark):
    """merge_asof contract: all payload columns come from the SAME
    best-matching right row.  A NULL field in the newest match is
    carried as NULL — never back-filled from an older right row —
    and with a tolerance the gap is judged against that same row."""
    import datetime as dt

    from kafka_sparkstreaming_sbt_spark.operators.asof import asof_join

    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    left = spark.createDataFrame([(1, ts(100), "p")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, ts(10), "old", 1.0), (1, ts(95), None, None)],
        "k long, ts timestamp, label string, score double",
    )
    row = asof_join(left, right, on="k").collect()[0]
    # newest match (ts=95) has NULL label+score: both stay NULL
    assert row.label_asof is None and row.score_asof is None
    # tolerance 10 s: the 95 s match (gap 5 s) is in tolerance even
    # though its payload is NULL; the old in-tolerance-looking row
    # (gap 90 s) must NOT leak through
    row = asof_join(left, right, on="k", tolerance_seconds=10).collect()[0]
    assert row.label_asof is None and row.score_asof is None
    # forward direction: no right row at-or-after 100 s — left-join
    # semantics keep the row with a NULL match
    row = asof_join(left, right, on="k", direction="forward").collect()[0]
    assert row.tag == "p" and row.label_asof is None and row.score_asof is None


def test_asof_salt_buckets_output_invariant(spark):
    """salt_buckets must be a pure physical-plan knob: identical
    output to the unsalted join on a hot key, for both directions
    and with tolerance."""
    import datetime as dt

    from kafka_sparkstreaming_sbt_spark.operators.asof import asof_join

    t0 = dt.datetime(2025, 3, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=int(sec))

    # one hot key (most rows) + two normal keys; unique ts per key so
    # the match is deterministic
    left_rows = [(1, ts(7 * i + 3), f"h{i}") for i in range(200)]
    left_rows += [(2, ts(50), "a"), (2, ts(9000), "b"), (3, ts(5), "c")]
    right_rows = [(1, ts(11 * i), float(i)) for i in range(130)]
    right_rows += [(2, ts(40), 900.0), (3, ts(9999), 901.0)]
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, tag string")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, ref double")

    for kwargs in (
        {},
        {"direction": "forward"},
        {"tolerance_seconds": 25},
        {"direction": "forward", "tolerance_seconds": 25},
    ):
        base = {
            (r.k, r.tag): r.ref_asof
            for r in asof_join(left, right, on="k", **kwargs).collect()
        }
        for n in (2, 8, 64):
            salted = {
                (r.k, r.tag): r.ref_asof
                for r in asof_join(
                    left, right, on="k", salt_buckets=n, **kwargs
                ).collect()
            }
            assert salted == base, f"salt_buckets={n} kwargs={kwargs}"
    # degenerate right range (single ts) falls back to unsalted
    tiny = spark.createDataFrame([(1, ts(3), 7.0)], "k long, ts timestamp, ref double")
    out = asof_join(left, tiny, on="k", salt_buckets=16).collect()
    assert all(r.ref_asof == (7.0 if r.k == 1 else None) for r in out)
