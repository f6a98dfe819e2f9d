"""Time NAMED queries exactly as bench.py does (untimed warm-up +
min-of-3 noop runs, clearCache between runs) — the targeted
re-measure loop of the optimization round.

Usage: python scripts/time_queries.py query [query ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from kafka_sparkstreaming_sbt_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    spark = get_spark(
        app_name="time_queries",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    qs = entry_mod.queries()
    total = 0.0
    for name in sys.argv[1:]:
        fn = qs[name]
        best = float("inf")
        for i in range(RUNS + 1):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            if i:
                best = min(best, dt)
        # bench.py's driver hygiene: py4j refs from large bounded
        # collects (the PQ family) degrade later queries ~3x once the
        # old gen fills — measured, see bench.py:_measure_once
        import gc

        gc.collect()
        spark._jvm.System.gc()
        total += best
        print(f"{name:36s} {best:7.3f}s", flush=True)
    print(f"{'TOTAL':36s} {total:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
