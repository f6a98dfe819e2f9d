"""Byte-equality harness: md5 over the SORTED collected output of
named queries — run on two code states (e.g. git stash A/B) and diff
the printed hashes to prove a restructure changed nothing.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/hash_queries.py q [q ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from kafka_sparkstreaming_sbt_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(
        app_name="hash_queries",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry_mod.queries()
    for name in sys.argv[1:]:
        df = qs[name](spark, SF_DIR)
        rows = df.collect()
        canon = sorted(repr(tuple(r)) for r in rows)
        h = hashlib.md5("\n".join(canon).encode()).hexdigest()
        print(f"{name:32s} rows={len(rows):8d} md5={h}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
