"""Streaming dedup-on-ingest: the incremental near-dup screen
(``operators.dedup_fuzzy.incremental_near_dup``) run per micro-batch
against a static corpus PLUS everything accepted by earlier batches —
the continuous form of the daily-ingest example
(``examples/incremental_ingest.py``), and the production pattern for
"don't let duplicates into the lake in the first place".

Design for the micro-batch engine:

- **foreachBatch, not custom state**: the dedup decision needs joins
  against an unbounded, growing corpus — exactly what the state store
  is wrong for (per-key state, not relational screens).  foreachBatch
  gives every micro-batch full batch-DataFrame semantics, so the
  screen IS the batch operator, unchanged.
- **accepted rows accumulate in the lake, partitioned by batch id**
  (``accepted_dir/batch_id=N``): batch N screens against the static
  corpus UNION partitions ``batch_id < N``.  The strict inequality is
  the restart-correctness contract — on checkpoint replay of batch N,
  its own half-written output is EXCLUDED from the corpus side, and
  the ``mode("overwrite")`` per-partition write makes the replay
  idempotent (the standard foreachBatch exactly-once recipe).
- **within-batch dups** are dropped by the keep-smallest-id rule over
  the batch's own near-dup pairs, so two copies arriving in one
  trigger can't both slip in.

Scale shape: per-trigger cost is |batch| x local-neighborhood (the
incremental screen's contract — bucket-join vs corpus signatures,
candidate-only corpus re-shingle), never corpus x corpus.  With
``signature_dir`` set the corpus-side banded keys are a MATERIALIZED
lake artifact: the static corpus's table is built once at pipeline
start (``materialize_corpus_signatures``) and every batch appends only
its accepted rows' keys — the append-only maintenance discipline
``banded_signature_table`` documents, under the same ``batch_id=N``
partition layout and strict-inequality replay contract as the accepted
rows themselves.  Without it the signatures are recomputed per batch
(self-containment for toy corpora).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException


def _prior_partitions(
    spark, path: str, before_batch: int
) -> DataFrame | None:
    """Partitions of a ``batch_id=N``-layout parquet dir STRICTLY
    before ``before_batch`` (replay safety), None when nothing exists
    yet."""
    try:
        prior = spark.read.parquet(path)
    except AnalysisException:
        return None
    if "batch_id" not in prior.columns:  # empty dir edge
        return None
    return prior.filter(F.col("batch_id") < before_batch).drop("batch_id")


def materialize_corpus_signatures(
    corpus_docs: DataFrame,
    signature_dir: str,
    shingle_n: int = 3,
    n_bands: int = 8,
) -> None:
    """One-time base artifact for the streaming screen: the static
    corpus's banded MinHash keys at ``signature_dir/base``.  Runs
    once per pipeline deployment (skipped if present) — after this,
    no micro-batch ever re-shingles the static corpus."""
    from kafka_sparkstreaming_sbt_spark.operators.dedup_fuzzy import (
        banded_signature_table,
    )

    spark = corpus_docs.sparkSession
    base = f"{signature_dir}/base"
    try:
        spark.read.parquet(base).limit(1).collect()
        return  # already materialized by an earlier deployment
    except AnalysisException:
        pass
    banded_signature_table(
        corpus_docs, shingle_n=shingle_n, n_bands=n_bands
    ).write.mode("overwrite").parquet(base)


def screen_micro_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_docs: DataFrame,
    accepted_dir: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    n_bands: int = 8,
    signature_dir: str | None = None,
) -> tuple[int, int]:
    """One micro-batch of the ingest screen (the foreachBatch body,
    exposed for direct testing of the replay contract): screen
    ``batch_df`` against the static corpus + accepted partitions
    STRICTLY before ``batch_id``, write survivors idempotently to
    ``accepted_dir/batch_id=N``.  Returns (n_batch, n_accepted).

    With ``signature_dir`` (see :func:`materialize_corpus_signatures`)
    the corpus side of the bucket join reads MATERIALIZED banded keys
    — ``signature_dir/base`` for the static corpus plus
    ``signature_dir/incr/batch_id<N`` for earlier accepted batches —
    and each batch appends its own accepted rows' signatures, so
    per-trigger cost never includes re-shingling the corpus.  Corpus
    TEXT is still consulted, but only for candidate pairs (the
    operator's semi-join prune)."""
    from kafka_sparkstreaming_sbt_spark.operators.dedup_fuzzy import (
        banded_signature_table,
        incremental_near_dup,
        minhash_near_dup_pairs,
    )

    spark = batch_df.sparkSession
    batch_df = batch_df.select("doc_id", "text")
    corpus = corpus_docs.select("doc_id", "text")
    prior = _prior_partitions(spark, accepted_dir, batch_id)
    if prior is not None:
        corpus = corpus.unionByName(prior.select("doc_id", "text"))
    corpus_sigs = None
    if signature_dir is not None:
        corpus_sigs = spark.read.parquet(f"{signature_dir}/base")
        prior_sigs = _prior_partitions(
            spark, f"{signature_dir}/incr", batch_id
        )
        if prior_sigs is not None:
            corpus_sigs = corpus_sigs.unionByName(
                prior_sigs.select("doc_id", "bs")
            )
    # the batch feeds three consumers (corpus screen, self-pair
    # screen, final anti-join); micro-batches are small by
    # construction, so materialize once
    batch_df = batch_df.localCheckpoint(eager=True)
    vs_corpus = (
        incremental_near_dup(
            batch_df,
            corpus,
            shingle_n=shingle_n,
            n_bands=n_bands,
            threshold=threshold,
            corpus_signatures=corpus_sigs,
        )
        .select(F.col("new_doc_id").alias("doc_id"))
        .distinct()
    )
    # within-batch: keep the smallest id of every near-dup pair.
    # persist_shingles=False: this runs once per TRIGGER in a
    # long-lived query, and the operator's internal cache can never
    # be unpersisted from here — each call would leak a dead cache
    # entry; the batch is small and checkpointed, so the re-shingle
    # per branch is bounded.
    self_pairs = minhash_near_dup_pairs(
        batch_df,
        shingle_n=shingle_n,
        n_bands=n_bands,
        threshold=threshold,
        persist_shingles=False,
    ).select(F.col("doc_b").alias("doc_id")).distinct()
    accepted = batch_df.join(
        vs_corpus.unionByName(self_pairs).distinct(),
        "doc_id",
        "left_anti",
    )
    # idempotent per-batch write: replaying batch N overwrites its
    # own partition, never touches earlier ones
    accepted_path = f"{accepted_dir}/batch_id={batch_id}"
    accepted.write.mode("overwrite").parquet(accepted_path)
    if signature_dir is not None:
        # append-only signature maintenance: the accepted rows'
        # banded keys, same idempotent per-partition layout
        banded_signature_table(
            spark.read.parquet(accepted_path),
            shingle_n=shingle_n,
            n_bands=n_bands,
        ).write.mode("overwrite").parquet(
            f"{signature_dir}/incr/batch_id={batch_id}"
        )
    # count the PARTITION JUST WRITTEN, not `accepted` — a second
    # action on the lazy screen plan would re-run the whole bucket
    # join + verify, doubling every trigger's cost; the parquet count
    # resolves from footer metadata
    return batch_df.count(), spark.read.parquet(accepted_path).count()


def run_dedup_ingest_pipeline(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    accepted_dir: str,
    checkpoint_location: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    n_bands: int = 8,
    on_batch: Callable[[int, int, int], None] | None = None,
    signature_dir: str | None = None,
) -> StreamingQuery:
    """Start the streaming ingest screen.

    ``stream_docs``: streaming DataFrame with ``doc_id`` and ``text``.
    ``corpus_docs``: static (batch) corpus with the same columns.
    ``accepted_dir``: lake path where accepted rows accumulate,
    partitioned ``batch_id=N`` — readable as one parquet table, and
    the corpus side of every later batch's screen.
    ``signature_dir`` (recommended for any non-toy corpus): lake path
    for the materialized banded-key tables — the static corpus's keys
    are built ONCE at pipeline start and each batch appends only its
    accepted rows' keys, so no trigger ever re-shingles the corpus.
    ``on_batch(batch_id, n_batch, n_accepted)`` is an observability
    hook (counts only, no data)."""
    if signature_dir is not None:
        materialize_corpus_signatures(
            corpus_docs, signature_dir, shingle_n, n_bands
        )

    def screen(batch_df: DataFrame, batch_id: int) -> None:
        n, a = screen_micro_batch(
            batch_df, batch_id, corpus_docs, accepted_dir,
            threshold, shingle_n, n_bands,
            signature_dir=signature_dir,
        )
        if on_batch is not None:
            on_batch(batch_id, n, a)

    return (
        stream_docs.writeStream.foreachBatch(screen)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_location)
        .start()
    )
