"""Targeted driver-sim: verify NAMED queries against the DuckDB oracle
at a chosen scale factor (default sf0.01; the optimization round runs
it at sf0.1 too, so equivalence is proven at the bench scale before a
rewritten query ships).  Mirrors .claude/skills/verify/driver_sim.py's
canonicalization exactly.

Usage: python scripts/sim_subset.py [--sf SFDIR] query [query ...]
"""

import datetime as dt
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

args = sys.argv[1:]
SF = "/root/testdata/sf0.01"
if args and args[0] == "--sf":
    SF = args[1]
    args = args[2:]

spark = (
    SparkSession.builder.master("local[8]")
    .appName("sim-subset")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as m  # noqa: E402

con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def canon(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


qs, os_ = m.queries(), m.oracle_sql()
ok = True
for name in args:
    fn = qs[name]
    if name not in os_:
        print(f"{name}: rows-only rows={fn(spark, SF).count()}")
        continue
    a = fn(spark, SF).toPandas()
    e = con.execute(os_[name]).df()
    an = sorted(
        tuple(canon(v) for v in r)
        for r in a[sorted(a.columns)].itertuples(index=False, name=None)
    )
    en = sorted(
        tuple(canon(v) for v in r)
        for r in e[sorted(e.columns)].itertuples(index=False, name=None)
    )
    match = an == en
    ok &= match
    print(f"{name}: spark={len(an)} oracle={len(en)} match={match}")
    if not match:
        print("   first diffs:", [(x, y) for x, y in zip(an, en) if x != y][:3])
print("ALL MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
