"""Interleaved eager-vs-lazy A/B of the k-means Lloyd checkpoints
(VERDICT r11 #1): both shapes run rep-by-rep in ONE session so they
see the same load window; min-of-N per shape decides.  The eager
variant monkeypatches kmeans_centroids with the r10 shape (eager
localCheckpoint per round); everything else is the live code.

Usage: python scripts/ab_kmeans_r12.py [reps]
"""

from __future__ import annotations

import math
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafka_sparkstreaming_sbt_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def kmeans_centroids_eager(
    corpus,
    n_cells=None,
    n_iter=3,
    seed=42,
    vec_col="embedding",
    id_col="vec_id",
    assign_method="numpy",
):
    """The r10 shape: EAGER localCheckpoint per Lloyd round."""
    import kafka_sparkstreaming_sbt_spark.operators.similarity as sim
    from kafka_sparkstreaming_sbt_spark.operators.topk import topk_cut
    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    if n_cells is None:
        n_rows = sim._metadata_row_count(corpus)
        if n_rows is None:
            n_rows = corpus.count()
        n_cells = max(2, int(math.isqrt(n_rows)))
    hashed = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"),
    )
    seeds = topk_cut(
        hashed, [("_h", "asc"), (id_col, "asc")], n_cells
    ).withColumn(
        "rank",
        F.row_number().over(Window.orderBy("_h", id_col)),
    )
    cent = seeds.select(
        (F.col("rank") - 1).cast("long").alias("cell_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "c_vec"
        ),
    ).localCheckpoint(eager=True)
    body = parallelize_for_compute(corpus).select(
        F.col(id_col), F.col(vec_col)
    )
    for _ in range(n_iter):
        cent = sim._kmeans_round_numpy(
            body, cent, vec_col, id_col
        ).localCheckpoint(eager=True)
    return cent


def main() -> None:
    import kafka_sparkstreaming_sbt_spark.operators.similarity as sim
    import kafka_sparkstreaming_sbt_spark.operators.quantize as qz
    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="ab_kmeans_r12",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    qs = entry_mod.queries()
    lazy_fn = sim.kmeans_centroids

    def run(qname: str) -> float:
        t0 = time.perf_counter()
        qs[qname](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        import gc

        gc.collect()
        return dt

    for qname in ("ivf_pq_topk", "ivf_kmeans_topk"):
        # warm-ups, one per shape
        run(qname)
        sim.kmeans_centroids = kmeans_centroids_eager
        qz.kmeans_centroids = kmeans_centroids_eager
        run(qname)
        sim.kmeans_centroids = lazy_fn
        qz.kmeans_centroids = lazy_fn
        lazy, eager = [], []
        for rep in range(REPS):
            lazy.append(run(qname))
            sim.kmeans_centroids = kmeans_centroids_eager
            qz.kmeans_centroids = kmeans_centroids_eager
            eager.append(run(qname))
            sim.kmeans_centroids = lazy_fn
            qz.kmeans_centroids = lazy_fn
            print(
                f"{qname} rep{rep}: lazy={lazy[-1]:.3f}s "
                f"eager={eager[-1]:.3f}s",
                flush=True,
            )
        print(
            f"== {qname}: lazy min={min(lazy):.3f} med={sorted(lazy)[len(lazy)//2]:.3f} | "
            f"eager min={min(eager):.3f} med={sorted(eager)[len(eager)//2]:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
