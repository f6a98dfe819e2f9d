"""Web-crawl curation pipeline — the Common Crawl-shaped flow, from
raw WET archives to a selected, deduplicated corpus:

    WET archives (gzip, Content-Length framed)
      -> parse (binaryFile + mapInPandas, dead-letter error rows)
      -> language ID (n-gram marker heuristic, keep target lang)
      -> NB quality filter (fastText-recipe model trained from a
         labeled seed set — broadcast-bounded scoring)
      -> boilerplate removal (RefinedWeb frequency rule: spans in
         >= min_docs distinct pages stripped everywhere)
      -> [optional] exact duplicated-span excision (Lee et al.
         ExactSubstr: verbatim text shared at ANY alignment by >= 2
         pages — syndicated paragraphs, mirrored licence blocks —
         that the chunk-grid frequency rule misses when copies
         drift or sit below its min_docs)
      -> MinHash near-dup screen (banded LSH + exact-Jaccard verify,
         canonical survivor per transitive group)
      -> [optional] DSIR selection toward a target domain corpus
      -> parquet lake write + one-line JSON report

Every stage is a DataFrame transform from the library; the plan stays
lazy until the single write, so column pruning and predicate pushdown
cross stage boundaries, and nothing collects to the driver beyond the
broadcast-bounded model/ratio tables.  Deterministic end to end.

    python examples/wet_curation.py \
        --wet-glob '/data/*.warc.wet.gz' --output /tmp/curated \
        [--lang en] [--target-parquet /data/target] [--n-keep 100000]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.chunking import (
    remove_common_chunks,
    remove_duplicate_spans,
)
from kafka_sparkstreaming_sbt_spark.operators.classify import (
    nb_train,
    quality_filter,
)
from kafka_sparkstreaming_sbt_spark.operators.dedup_fuzzy import (
    minhash_near_dup_pairs,
)
from kafka_sparkstreaming_sbt_spark.operators.dsir import dsir_select
from kafka_sparkstreaming_sbt_spark.operators.graph import select_canonical
from kafka_sparkstreaming_sbt_spark.operators.text import lang_id
from kafka_sparkstreaming_sbt_spark.sources.warc import read_wet


def curate_wet(
    spark: SparkSession,
    wet_glob: str,
    output: str,
    quality_seed_docs: DataFrame,
    lang: str = "en",
    target_docs: DataFrame | None = None,
    n_keep: int | None = None,
    jaccard_threshold: float = 0.5,
    boiler_min_docs: int = 3,
    n_buckets: int = 1024,
    span_window: int | None = None,
) -> dict:
    """Run the chain; returns the one-line JSON report dict.

    ``quality_seed_docs``: labeled ``(doc_id, text, label)`` seed for
    the NB quality model (label 1 = keep-worthy).  ``target_docs`` +
    ``n_keep``: enable the DSIR stage (select ``n_keep`` pages whose
    hashed-ngram profile matches ``target_docs``).  ``span_window``:
    enable ExactSubstr-style duplicated-span excision at that window
    width (None = off; 16 is the usual setting — pair it with
    corpora whose pages are individually distinct, since ANY
    >= window run shared by two pages is excised from both)."""
    # 1. parse — record identity is (archive, position): stable
    #    across reruns, unique across archives
    recs = read_wet(spark, wet_glob)
    docs = recs.select(
        F.xxhash64("path", "record_idx").alias("doc_id"),
        "url",
        "text",
    )
    n_parsed = docs.count()

    # 2. language ID (cheap, zero-shuffle — runs first)
    lang_scored = lang_id(docs)
    docs = docs.join(
        lang_scored.filter(F.col("detected_lang") == lang).select(
            "doc_id"
        ),
        "doc_id",
        "left_semi",
    )

    # 3. model-based quality screen (broadcast-bounded)
    model = nb_train(quality_seed_docs, "label", n_buckets=n_buckets)
    docs = quality_filter(docs, model, n_buckets=n_buckets)

    # 4. boilerplate removal (site chrome shared across pages)
    cleaned = remove_common_chunks(
        docs, chunk_tokens=8, min_docs=boiler_min_docs
    )
    docs = docs.select("doc_id", "url").join(
        cleaned.select(
            "doc_id", F.col("clean_text").alias("text")
        ),
        "doc_id",
    ).filter(F.length("text") > 0)

    # 4b. optional exact duplicated-span excision: catches the
    #     verbatim-but-drifted duplication the fixed chunk grid
    #     structurally misses (and pairs below boiler_min_docs)
    if span_window is not None:
        despanned = remove_duplicate_spans(
            docs, window_tokens=span_window, min_docs=2
        )
        docs = (
            docs.select("doc_id", "url")
            .join(
                despanned.select(
                    "doc_id", F.col("clean_text").alias("text")
                ),
                "doc_id",
            )
            .filter(F.length("text") > 0)
        )
    n_screened = docs.count()

    # 5. near-dup screen, canonical survivor per transitive group
    pairs = minhash_near_dup_pairs(
        docs, shingle_n=3, n_bands=8, threshold=jaccard_threshold
    )
    docs = docs.withColumn("n_chars", F.length("text"))
    near_keep = (
        select_canonical(
            docs, pairs.select("doc_a", "doc_b"), score_col="n_chars"
        )
        .filter(F.col("keep"))
        .select("doc_id")
    )
    docs = docs.join(near_keep, "doc_id", "left_semi").select(
        "doc_id", "url", "text"
    )

    # 6. optional DSIR selection toward the target domain
    if target_docs is not None and n_keep is not None:
        picked = dsir_select(
            docs, target_docs, n_keep, n_buckets=n_buckets
        )
        docs = docs.join(
            picked.select("doc_id"), "doc_id", "left_semi"
        )

    docs.write.mode("overwrite").parquet(output)
    out = spark.read.parquet(output)
    report = {
        "parsed_pages": n_parsed,
        "post_screen_pages": n_screened,
        "curated_pages": out.count(),
        "output": output,
    }
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wet-glob", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--seed-parquet", required=True,
                    help="labeled (doc_id, text, label) quality seed")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--target-parquet", default=None)
    ap.add_argument("--n-keep", type=int, default=None)
    ap.add_argument(
        "--span-window", type=int, default=None,
        help="enable ExactSubstr duplicated-span excision at this "
        "window width (e.g. 16); off by default",
    )
    args = ap.parse_args()

    from kafka_sparkstreaming_sbt_spark.session import get_spark

    spark = get_spark(app_name="wet-curation")
    seed = spark.read.parquet(args.seed_parquet)
    target = (
        spark.read.parquet(args.target_parquet)
        if args.target_parquet
        else None
    )
    report = curate_wet(
        spark,
        args.wet_glob,
        args.output,
        seed,
        lang=args.lang,
        target_docs=target,
        n_keep=args.n_keep,
        span_window=args.span_window,
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
