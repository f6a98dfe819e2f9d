"""CCNet/C4-style normalization before hashing: the equivalence
classes the dedup keys rely on, plus the toggles."""

from __future__ import annotations

from kafka_sparkstreaming_sbt_spark.operators.text import (
    normalize_for_dedup,
)


def _norm(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r.doc_id: r.norm_text
        for r in normalize_for_dedup(df, **kw).collect()
    }


def test_normalization_equivalence_classes(spark):
    """Case, punctuation, digit values, and whitespace runs all
    collapse — the pairs a raw-text exact-dup key misses become
    identical norm keys."""
    out = _norm(
        spark,
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "v2.1 released; see §4"),
            (4, "V3.4 released    see  7"),
            (5, "  trimmed \t ends\n"),
        ],
    )
    assert out[1] == out[2] == "hello world"
    # digits all map to 0, punctuation to space: versions collapse
    assert out[3] == out[4] == "v0 0 released see 0"
    assert out[5] == "trimmed ends"


def test_normalization_toggles(spark):
    rows = [(1, "Ab 12, x")]
    assert _norm(spark, rows) == {1: "ab 00 x"}
    assert _norm(spark, rows, lowercase=False) == {1: "Ab 00 x"}
    assert _norm(spark, rows, digits_to_zero=False) == {1: "ab 12 x"}
    assert _norm(spark, rows, strip_punct=False) == {1: "ab 00, x"}


def test_normalization_keeps_raw_text(spark):
    df = spark.createDataFrame([(1, "A  b!")], ["doc_id", "text"])
    row = normalize_for_dedup(df).collect()[0]
    assert row.text == "A  b!"  # raw column untouched
    assert row.norm_text == "a b"
