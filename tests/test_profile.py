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
