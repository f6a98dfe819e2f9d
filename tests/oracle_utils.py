"""Local replica of the driver's DuckDB-oracle comparison: run a
``queries()`` entry and its ``oracle_sql()`` twin on the same parquet
tables, normalize (sort columns by name, canonicalize cell values),
and compare order-insensitively."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd

from kafka_sparkstreaming_sbt_spark.sources.batch import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6f}"
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, (dt.datetime,)):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    actual = normalize(spark_df.toPandas())
    expected = normalize(run_oracle(oracle_sql, sf_dir))
    assert len(actual) == len(expected), (
        f"row count {len(actual)} != oracle {len(expected)}"
    )
    mismatches = [
        (a, e) for a, e in zip(actual, expected) if a != e
    ]
    assert not mismatches, f"first mismatches: {mismatches[:5]}"
