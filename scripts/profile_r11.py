"""Stage-level profiling for the r11 optimization round (guide §1):
time each sub-stage of the most expensive query families in isolation
with the noop sink, so changes target measured cost, not guesses.

Each probe builds the SAME lineage the query uses, but stops at an
intermediate stage.  Timings are min-of-N (default 3) after one
untimed warm-up, mirroring bench.py methodology.

Usage: python scripts/profile_r11.py [probe ...]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from kafka_sparkstreaming_sbt_spark.session import get_spark  # noqa: E402
from kafka_sparkstreaming_sbt_spark.sources.batch import read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name: str, build) -> float:
    """min-of-RUNS wall of `_noop(build())`, one untimed warm-up."""
    spark.sparkContext.setJobDescription(f"profile:{name}")
    best = float("inf")
    for i in range(RUNS + 1):
        t0 = time.perf_counter()
        _noop(build())
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        if i:  # skip warm-up
            best = min(best, dt)
    print(f"{name:48s} {best:8.3f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def probe_chain(spark) -> None:
    """MinHash chain stages (shared by 6 gate queries)."""
    from kafka_sparkstreaming_sbt_spark.operators.dedup_fuzzy import (
        minhash_near_dup_pairs,
        minhash_signatures,
        with_shingles,
    )
    from kafka_sparkstreaming_sbt_spark.operators.graph import (
        near_dup_groups,
    )
    from kafka_sparkstreaming_sbt_spark.plans import (
        parallelize_for_compute,
    )

    docs = read_table(spark, SF_DIR, "documents")

    def shingled():
        return with_shingles(
            parallelize_for_compute(docs), "text", 3
        ).select("doc_id", "shingles")

    timed(spark, "chain.0_read_docs", lambda: docs)
    timed(spark, "chain.1_shingles", shingled)
    timed(
        spark,
        "chain.2_signatures",
        lambda: minhash_signatures(shingled(), 8).select(
            "doc_id", F.xxhash64("band", "sig").alias("bs")
        ),
    )

    def cand():
        sigs = minhash_signatures(shingled(), 8).select(
            "doc_id", F.xxhash64("band", "sig").alias("bs")
        )
        return (
            sigs.alias("x")
            .join(
                sigs.alias("y"),
                (F.col("x.bs") == F.col("y.bs"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
            )
            .distinct()
        )

    timed(spark, "chain.3_candidates_nopersist", cand)
    timed(
        spark,
        "chain.4_pairs_full",
        lambda: minhash_near_dup_pairs(
            docs, shingle_n=3, n_bands=8, threshold=0.5
        ),
    )
    pairs = minhash_near_dup_pairs(
        docs, shingle_n=3, n_bands=8, threshold=0.5
    ).select("doc_a", "doc_b")
    n_pairs = pairs.count()
    print(f"{'chain.n_pairs':48s} {n_pairs:8d}", flush=True)
    timed(
        spark,
        "chain.5_near_dup_groups",
        lambda: near_dup_groups(docs, pairs),
    )
    timed(
        spark,
        "chain.6_groups_end_to_end",
        lambda: near_dup_groups(
            docs,
            minhash_near_dup_pairs(
                docs, shingle_n=3, n_bands=8, threshold=0.5
            ).select("doc_a", "doc_b"),
        ),
    )


def probe_ivfpq(spark) -> None:
    """ivf_pq_topk stages."""
    from kafka_sparkstreaming_sbt_spark.operators.quantize import (
        _scale_value,
        ivf_pq_topk,
        pq_codebooks,
        pq_encode,
        pq_rerank,
        quantization_scale,
        quantize_embeddings,
    )
    from kafka_sparkstreaming_sbt_spark.operators.similarity import (
        kmeans_centroids,
    )

    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)

    timed(spark, "ivfpq.0_read_emb", lambda: emb)
    timed(
        spark,
        "ivfpq.1_quantize",
        lambda: quantize_embeddings(emb, method="numpy"),
    )
    timed(
        spark,
        "ivfpq.2_kmeans_cent",
        lambda: kmeans_centroids(emb, None, 3, 42),
    )

    def books():
        scale = _scale_value(quantization_scale(emb))
        return pq_codebooks(
            emb, 8, 64, method="kmeans", seed=42, scale=scale
        )

    timed(spark, "ivfpq.3_codebooks_kmeans", books)

    def enc():
        scale = _scale_value(quantization_scale(emb))
        b = pq_codebooks(
            emb, 8, 64, method="kmeans", seed=42, scale=scale
        )
        return pq_encode(emb, b, scale=scale, method="numpy")

    timed(spark, "ivfpq.4_encode", enc)
    timed(
        spark,
        "ivfpq.5_full",
        lambda: pq_rerank(
            ivf_pq_topk(
                emb, queries, k=100, n_subspaces=8, n_codes=64, seed=42
            ),
            emb,
            queries,
            k=10,
        ),
    )


def probe_nb_dsir(spark) -> None:
    """nb_quality_scores + dsir stages."""
    from kafka_sparkstreaming_sbt_spark.operators.classify import (
        nb_score,
        nb_train,
    )
    from kafka_sparkstreaming_sbt_spark.operators.dsir import (
        bucket_log_ratio,
        dsir_log_weights,
        dsir_select,
        hashed_ngram_counts,
    )

    docs = read_table(spark, SF_DIR, "documents")
    labeled = docs.withColumn(
        "label", (F.col("lang") == "en").cast("int")
    )
    timed(
        spark,
        "nb.1_features",
        lambda: hashed_ngram_counts(docs, n_buckets=512),
    )
    timed(
        spark,
        "nb.2_train",
        lambda: nb_train(labeled, "label", n_buckets=512),
    )
    timed(
        spark,
        "nb.3_train_and_score",
        lambda: nb_score(
            docs, nb_train(labeled, "label", n_buckets=512),
            n_buckets=512,
        ),
    )
    raw = docs.filter(F.col("source") != "src0")
    target = docs.filter(F.col("source") == "src0")
    timed(
        spark,
        "dsir.1_weights",
        lambda: dsir_log_weights(
            hashed_ngram_counts(raw, n_buckets=512),
            bucket_log_ratio(
                hashed_ngram_counts(target, n_buckets=512),
                hashed_ngram_counts(raw, n_buckets=512),
                512,
            ),
        ),
    )
    timed(
        spark,
        "dsir.2_select",
        lambda: dsir_select(raw, target, 100, n_buckets=512),
    )


def probe_simhash(spark) -> None:
    from kafka_sparkstreaming_sbt_spark.operators.simhash import (
        simhash_fingerprints,
        simhash_near_dup_pairs,
    )

    docs = read_table(spark, SF_DIR, "documents")
    timed(
        spark,
        "simhash.1_fingerprints",
        lambda: simhash_fingerprints(docs),
    )
    timed(
        spark,
        "simhash.2_pairs",
        lambda: simhash_near_dup_pairs(docs),
    )


def probe_ivfkmeans(spark) -> None:
    from kafka_sparkstreaming_sbt_spark.operators.similarity import (
        _ivf_search,
        ivf_kmeans_topk,
        kmeans_centroids,
    )

    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 100)
    timed(
        spark,
        "ivfk.1_kmeans_3iter",
        lambda: kmeans_centroids(emb, None, 3, 42),
    )
    timed(
        spark,
        "ivfk.2_full",
        lambda: ivf_kmeans_topk(emb, queries, k=10),
    )

    def search_only():
        cent = kmeans_centroids(emb, None, 3, 42)
        import math

        n_cells = cent.count()
        n_probe = max(4, math.ceil(2 / 3 * n_cells))
        return _ivf_search(
            emb, queries, cent, 10, n_probe, "embedding", "vec_id",
            assign_method="numpy", search_method="sql",
        )

    timed(spark, "ivfk.3_kmeans_plus_search", search_only)


PROBES = {
    "chain": probe_chain,
    "ivfpq": probe_ivfpq,
    "nb_dsir": probe_nb_dsir,
    "simhash": probe_simhash,
    "ivfkmeans": probe_ivfkmeans,
}


def main() -> None:
    names = sys.argv[1:] or list(PROBES)
    spark = get_spark(
        app_name="profile_r11",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # same warm-up as bench.py so the first probe isn't charged
    # session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    read_table(spark, SF_DIR, "region").count()
    for n in names:
        PROBES[n](spark)
    spark.stop()


if __name__ == "__main__":
    main()
