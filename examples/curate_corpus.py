"""End-to-end training-data curation pipeline — the user-facing chain
of this engine's LLM-data operators over a documents parquet table:

    quality scoring -> language ID -> PII redaction -> exact dedup ->
    MinHash near-dup groups (transitive) -> keep the LONGEST doc per
    group (canonical election) -> [optional] SemDeDup semantic dedup
    over the documents' embeddings (k-means cells, 2-probe boundary
    recovery, BLAS tier) -> [optional] per-language relative quality
    cut (keep the top fraction WITHIN each detected language) ->
    [optional] cluster-balanced diversity cap (at most k docs per
    embedding cell) -> deterministic train/valid/test split
    -> partitioned parquet lake write + one-line JSON report.

Every stage is a DataFrame transform from the library (zero driver
loops, zero Python row-UDFs); the whole pipeline is lazy until the
single write at the end, so Catalyst prunes/pushes across stage
boundaries.  Deterministic end to end: re-running on the same input
produces byte-identical output (content-hash splits, no RNG).

    python examples/curate_corpus.py \
        --input /root/testdata/sf0.01 --output /tmp/curated \
        [--jaccard-threshold 0.5] [--min-quality 0.3] \
        [--semantic-threshold 0.9]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.dedup_fuzzy import (
    minhash_near_dup_pairs,
)
from kafka_sparkstreaming_sbt_spark.operators.graph import select_canonical
from kafka_sparkstreaming_sbt_spark.operators.similarity import (
    diverse_sample,
    kmeans_centroids,
    semantic_dedup,
)
from kafka_sparkstreaming_sbt_spark.operators.sampling import (
    group_quantile_filter,
    with_split,
)
from kafka_sparkstreaming_sbt_spark.operators.text import (
    exact_dedup_groups,
    lang_id,
    quality_score,
    redact_pii,
)
from kafka_sparkstreaming_sbt_spark.session import get_spark
from kafka_sparkstreaming_sbt_spark.sources.batch import read_table


def curate(
    spark,
    input_dir: str,
    output_dir: str,
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.3,
    semantic_threshold: float | None = None,
    quality_quantile: float | None = None,
    diversity_k: int | None = None,
) -> dict:
    """Run the curation chain; returns the per-stage count report.

    ``semantic_threshold`` (e.g. 0.9) adds SemDeDup semantic dedup:
    the corpus ``embeddings`` table (``vec_id`` == ``doc_id``) is
    quantized with seeded k-means and near-duplicate embeddings are
    pruned within each row's two nearest cells (the 2-probe BLAS
    configuration the scale harness gates — collapse holds 0.95+
    where single-probe degrades to 0.62 at 1M vectors).  Textual
    near-dup dedup catches lexical copies; the semantic stage
    additionally drops paraphrases and re-encodings the shingle
    space cannot see.

    ``quality_quantile`` (e.g. 0.6) replaces the absolute
    ``min_quality`` bar with a RELATIVE one: keep the top fraction of
    every DETECTED LANGUAGE by quality score (an absolute bar guts
    low-resource languages whose score distributions sit lower).
    ``diversity_k`` caps every embedding cell at k surviving docs
    (cluster-balanced subset — dominant topics can't monopolize the
    training mix); reuses the semantic stage's k-means cells when
    both stages run."""
    docs = read_table(spark, input_dir, "documents")
    n_input = docs.count()

    # annotate: quality + language (pure per-row maps, no shuffle)
    scored = quality_score(docs).select(
        "doc_id", "quality_score"
    )
    langs = lang_id(docs).select("doc_id", "detected_lang")

    # exact dedup: keep the minimum doc_id per identical content
    exact_keep = exact_dedup_groups(docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )

    # near-dup dedup: transitive MinHash groups, then elect the
    # LONGEST doc per group as the canonical survivor (ties -> lowest
    # id) — the curation policy, not the positional group minimum
    pairs = minhash_near_dup_pairs(
        docs, shingle_n=3, n_bands=8, threshold=jaccard_threshold
    ).select("doc_a", "doc_b")
    near_keep = select_canonical(docs, pairs, score_col="n_chars").filter(
        F.col("keep")
    ).select("doc_id")

    sem_keep = None
    emb = cents = None
    if semantic_threshold is not None or diversity_k is not None:
        emb = read_table(spark, input_dir, "embeddings")
        cents = kmeans_centroids(emb, n_iter=2)
    if semantic_threshold is not None:
        sem_keep = (
            semantic_dedup(
                emb,
                cents,
                threshold=semantic_threshold,
                method="numpy",
                n_probe_cells=2,
            )
            .filter(F.col("kept"))
            .select(F.col("vec_id").alias("doc_id"))
        )

    kept = (
        docs.join(exact_keep, "doc_id", "left_semi")
        .join(near_keep, "doc_id", "left_semi")
        .join(scored, "doc_id")
        .join(langs, "doc_id")
    )
    if quality_quantile is not None:
        # relative cut WITHIN each detected language — the absolute
        # bar would gut low-resource languages
        kept = group_quantile_filter(
            kept, "detected_lang", "quality_score", quality_quantile
        )
    else:
        kept = kept.filter(F.col("quality_score") >= min_quality)
    if sem_keep is not None:
        kept = kept.join(sem_keep, "doc_id", "left_semi")
    if diversity_k is not None:
        # sample from the SURVIVORS, not the raw table: a draw-winner
        # already dropped by dedup/quality would otherwise consume one
        # of the cell's k slots without contributing a row, silently
        # under-filling cells (up to emptying one whose top-k draws
        # were all dups)
        emb_kept = emb.join(
            kept.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        )
        div_keep = diverse_sample(
            emb_kept, cents, k_per_cell=diversity_k, method="numpy"
        ).select(F.col("vec_id").alias("doc_id"))
        kept = kept.join(div_keep, "doc_id", "left_semi")

    # redact AFTER dedup (why scrub text you are about to drop), then
    # attach the deterministic split and write the curated lake
    redacted = redact_pii(kept).select(
        "doc_id", "redacted", "n_emails", "n_ips", "n_phones"
    )
    curated = (
        kept.select(
            "doc_id", "lang", "source", "quality_score", "detected_lang"
        )
        .join(redacted, "doc_id")
        .withColumnRenamed("redacted", "text")
    )
    final = with_split(curated.withColumn("n_chars", F.length("text")), "doc_id")
    final.write.mode("overwrite").partitionBy("split").parquet(output_dir)

    out = spark.read.parquet(output_dir)
    report = {
        "input_docs": n_input,
        "curated_docs": out.count(),
        "by_split": {
            r.split: r.n
            for r in out.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        },
        "pii_redactions": out.agg(
            F.sum(
                F.col("n_emails") + F.col("n_ips") + F.col("n_phones")
            ).alias("s")
        ).first().s,
    }
    return report


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="dir with documents.parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--jaccard-threshold", type=float, default=0.5)
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument(
        "--semantic-threshold",
        type=float,
        default=None,
        help="enable SemDeDup semantic dedup at this cosine threshold",
    )
    p.add_argument(
        "--quality-quantile",
        type=float,
        default=None,
        help="keep the top FRACTION of each detected language by "
        "quality score (replaces the absolute --min-quality bar)",
    )
    p.add_argument(
        "--diversity-k",
        type=int,
        default=None,
        help="cap every embedding cell at k surviving docs",
    )
    args = p.parse_args()
    spark = get_spark(app_name="curate-corpus")
    report = curate(
        spark,
        args.input,
        args.output,
        args.jaccard_threshold,
        args.min_quality,
        args.semantic_threshold,
        args.quality_quantile,
        args.diversity_k,
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
