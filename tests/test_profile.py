"""Column profiling (operators/profile.py): exact semantics on a
hand-built frame (nulls, distincts, native-typed min/max), the approx
variant's single-scan plan, and input validation.  The gate query
``table_profile`` hash-matches a per-column UNION ALL DuckDB oracle
in the registry sweep."""

from __future__ import annotations

import pytest

from kafka_sparkstreaming_sbt_spark.operators.profile import (
    profile_columns,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.5),
            (2, "b", 2.0),
            (2, None, None),
            (None, "b", -3.25),
        ],
        "k long, s string, v double",
    )


def test_profile_exact(frame):
    out = {r.column: r for r in profile_columns(frame).collect()}
    assert set(out) == {"k", "s", "v"}
    assert all(r.n_rows == 4 for r in out.values())
    assert (out["k"].n_null, out["k"].n_distinct) == (1, 2)
    assert (out["s"].n_null, out["s"].n_distinct) == (1, 2)
    assert (out["v"].n_null, out["v"].n_distinct) == (1, 3)
    # min/max in NATIVE order (numeric, not lexicographic), then cast
    assert (out["v"].min_value, out["v"].max_value) == ("-3.25", "10.5")
    assert (out["k"].min_value, out["k"].max_value) == ("1", "2")


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "k long, z string")
    out = {r.column: r for r in profile_columns(df, ["z"]).collect()}
    assert out["z"].n_null == 2
    assert out["z"].n_distinct == 0
    assert out["z"].min_value is None


def test_profile_validation(frame):
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(frame, ["nope"])
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(frame, [])


def test_approx_variant_is_single_scan_no_expand(frame):
    """exact=False folds HLL distincts into ONE aggregate: no Expand
    operator (the count-distinct scan-replay) and no join in the
    plan."""
    plan = (
        profile_columns(frame, exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan
    out = {r.column: r for r in profile_columns(frame, exact=False).collect()}
    # HLL is exact at these cardinalities
    assert out["k"].n_distinct == 2


def test_profile_drift_flags_fire(spark):
    from kafka_sparkstreaming_sbt_spark.operators.profile import (
        profile_drift,
    )

    schema = (
        "column string, n_rows long, n_null long, n_distinct long, "
        "min_value string, max_value string"
    )
    old = spark.createDataFrame(
        [
            ("a", 100, 0, 50, "1", "9"),
            ("gone", 100, 0, 10, "x", "y"),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            ("a", 100, 10, 20, "1", "9"),
            ("fresh", 100, 0, 3, "p", "q"),
        ],
        schema,
    )
    rows = {r.column: r for r in profile_drift(old, new).collect()}
    a = rows["a"]
    assert a.status == "present"
    assert a.null_jump_flag == 1  # 0.0 -> 0.1 > 0.02
    assert a.distinct_ratio == 0.4 and a.distinct_collapse_flag == 1
    assert a.range_changed == 0
    assert rows["gone"].status == "removed"
    assert rows["fresh"].status == "added"
    # missing-side metrics stay NULL (natural SQL propagation)
    assert rows["fresh"].null_rate_old is None
    assert rows["fresh"].range_changed is None


def test_profile_drift_composes_with_profile_columns(spark):
    from kafka_sparkstreaming_sbt_spark.operators.profile import (
        profile_columns,
        profile_drift,
    )

    old = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, v string"
    )
    new = spark.createDataFrame(
        [(1, "x"), (2, None), (9, "x")], "id long, v string"
    )
    rows = {
        r.column: r
        for r in profile_drift(
            profile_columns(old), profile_columns(new)
        ).collect()
    }
    assert rows["v"].null_jump_flag == 1  # 0 -> 1/3
    assert rows["id"].range_changed == 1  # max 3 -> 9
    assert rows["id"].null_jump_flag == 0
