"""Weak supervision at corpus scale — expand a small labeled seed
set into corpus-wide labels over the embedding kNN graph, then use
the propagated labels to train the broadcast-bounded NB model and
screen the corpus:

    embeddings ──> kNN graph (cell-blocked cogroup BLAS — the Q=N
                   every-vector-is-a-query shape)
    seed labels ─> label propagation (majority vote, integer counts,
                   seeds clamped, bit-deterministic rounds)
    documents ──> join propagated labels ──> nb_train ──> the
                  model screens the FULL corpus (including
                  never-reached rows — the model generalizes where
                  the graph's label diameter ends)

This is the standard bootstrap when labeling budget is tiny and the
corpus is not: a few hundred human labels + an embedding space where
neighbors share classes beats training on the seeds alone, because
the propagated training set is 100-1000x larger.  Every stage is a
library DataFrame transform; nothing collects to the driver beyond
the bounded centroid/model tables; the plan is lazy to the single
write.  Deterministic end to end (hash-spread k-means init, integer
votes, aggregation-only NB training).

    python examples/weak_supervision.py \
        --docs /data/documents.parquet \
        --embeddings /data/embeddings.parquet \
        --seeds /data/seed_labels.parquet \
        --output /tmp/screened [--keep-label 1]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.classify import (
    nb_score,
    nb_train,
)
from kafka_sparkstreaming_sbt_spark.operators.graph import (
    label_propagation,
)
from kafka_sparkstreaming_sbt_spark.operators.similarity import knn_graph


def weak_supervise(
    spark: SparkSession,
    docs: DataFrame,
    embeddings: DataFrame,
    seeds: DataFrame,
    output: str | None = None,
    keep_label: int = 1,
    k: int = 10,
    n_probe: int = 2,
    n_rounds: int = 3,
    n_buckets: int = 1024,
) -> dict:
    """Run the chain; returns the one-line JSON report dict.

    ``docs``: (doc_id, text, ...); ``embeddings``: (vec_id,
    embedding) with vec_id == doc_id; ``seeds``: (vec_id, label) —
    the human-labeled rows (label ``keep_label`` = keep-worthy).
    ``output=None`` skips the write (report only)."""
    # 1. kNN graph over the embedding corpus (blocked: k-means cells
    #    ~ sqrt N, per-cell cogroup, nothing broadcast but centroids)
    edges = knn_graph(embeddings, k=k, n_probe=n_probe)

    # 2. seed labels spread over the graph — integer votes, clamped
    #    seeds, fixed rounds (the label diameter we trust)
    labels = label_propagation(edges, seeds, n_rounds=n_rounds)
    n_labeled = labels.count()
    n_seeds = seeds.count()

    # 3. propagated labels become NB training data: text evidence
    #    takes over where graph reach ends, and the model is a
    #    <= n_buckets+1-row broadcast artifact however big the
    #    corpus is
    train = docs.join(
        labels.select(
            F.col("vec_id").alias("doc_id"),
            (F.col("label") == keep_label).cast("int").alias("label"),
        ),
        "doc_id",
    )
    model = nb_train(train, "label", n_buckets=n_buckets)

    # 4. the model screens the FULL corpus (reached or not)
    scored = nb_score(docs, model, n_buckets=n_buckets)
    kept = docs.join(
        scored.filter(F.col("predicted") == 1).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    n_docs = docs.count()
    n_kept = kept.count()
    if output is not None:
        kept.write.mode("overwrite").parquet(output)
    return {
        "n_docs": n_docs,
        "n_seeds": n_seeds,
        "n_labeled": n_labeled,
        "label_coverage": round(n_labeled / max(n_docs, 1), 4),
        "n_kept": n_kept,
        "keep_rate": round(n_kept / max(n_docs, 1), 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True)
    ap.add_argument("--embeddings", required=True)
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--keep-label", type=int, default=1)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    from kafka_sparkstreaming_sbt_spark.session import get_spark

    spark = get_spark("weak_supervision")
    report = weak_supervise(
        spark,
        spark.read.parquet(args.docs),
        spark.read.parquet(args.embeddings),
        spark.read.parquet(args.seeds),
        output=args.output,
        keep_label=args.keep_label,
        k=args.k,
        n_rounds=args.rounds,
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
