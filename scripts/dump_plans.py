"""Dump .explain("formatted") for every registered query to
plans/r11/<query>_<tag>.txt — the optimization round's plan evidence
(OPTIMIZATION_r11.md references these; the judge checks plan claims
against them).

Usage: python scripts/dump_plans.py <tag> [query ...]
  tag: "before" / "after" (file suffix)
  query: optional subset; default = all registered queries.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from kafka_sparkstreaming_sbt_spark.plans import physical_plan  # noqa: E402
from kafka_sparkstreaming_sbt_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    subset = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    qs = entry_mod.queries()
    for name, fn in qs.items():
        if subset and name not in subset:
            continue
        try:
            plan = physical_plan(fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - diagnostic path
            plan = f"PLAN FAILED: {exc!r}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
