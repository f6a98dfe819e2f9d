"""Keep the scale-stress harness (scripts/scalecheck.py) honest at
test speed: the committed SCALECHECK.md numbers come from the full
50K/500K-doc run; this pins the harness's GENERATORS and probe logic
at tiny scale so a refactor can't silently invalidate the report's
premises (clone clusters really are near-dups, the boilerplate header
really creates hot buckets, the skew key really is hot)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from scalecheck import (  # noqa: E402
    BODY_TOKENS,
    HEADER_TOKENS,
    synth_documents,
    synth_events,
)

from kafka_sparkstreaming_sbt_spark.operators.dedup_fuzzy import (  # noqa: E402
    jaccard,
    minhash_near_dup_pairs,
    with_shingles,
)


def test_clone_clusters_are_true_near_dups(spark):
    """Every intra-cluster pair's EXACT 3-shingle Jaccard clears the
    0.5 threshold (the harness's recall denominator is real), and
    boilerplate/unique docs never do (the false-positive check is
    meaningful)."""
    docs = synth_documents(spark, 400)  # 100 clone docs = 33 clusters
    sh = with_shingles(docs, "text", 3).select("doc_id", "shingles")
    a = sh.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sb"))
    pairs = (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", jaccard(F.col("sa"), F.col("sb")).alias("j"))
    )
    same_cluster = (F.col("a") < 100) & (F.col("b") < 100) & (
        (F.col("a") / 3).cast("long") == (F.col("b") / 3).cast("long")
    )
    intra = pairs.filter(same_cluster)
    assert intra.filter(F.col("j") < 0.5).count() == 0
    # 100 clone docs = 33 full triples (3 pairs each) + a trailing
    # singleton (no pair) — the same formula run_doc_scale uses
    assert intra.count() == 33 * 3
    assert pairs.filter(~same_cluster).filter(F.col("j") >= 0.5).count() == 0


def test_boilerplate_header_creates_hot_buckets(spark):
    """The shared header must actually concentrate LSH buckets —
    otherwise the report's 'uncapped candidates' column measures
    nothing.  At 2000 docs the hottest bucket held ~357 docs in the
    committed run; assert the order of magnitude survives."""
    from scalecheck import bucket_profile

    docs = synth_documents(spark, 2000)
    prof = bucket_profile(spark, docs)
    assert prof["max_bucket"] > 100
    assert prof["candidates_in_hot_buckets"] > 10 * 2000


def test_capped_pipeline_finds_exactly_clone_pairs(spark):
    docs = synth_documents(spark, 600)
    pairs = minhash_near_dup_pairs(
        docs, shingle_n=3, n_bands=8, threshold=0.5, max_bucket_size=50
    ).select("doc_a", "doc_b")
    n_clone = 600 // 4
    got = pairs.count()
    intra = pairs.filter(
        (F.col("doc_a") < n_clone)
        & (F.col("doc_b") < n_clone)
        & (
            (F.col("doc_a") / 3).cast("long")
            == (F.col("doc_b") / 3).cast("long")
        )
    ).count()
    assert got == intra == 150  # 50 clusters of 3

def test_document_layout_constants(spark):
    """The doc text really has the documented token layout (the
    Jaccard arithmetic in the report derives from these)."""
    docs = synth_documents(spark, 100).withColumn(
        "n_tok", F.size(F.split("text", " "))
    )
    # clone + unique docs: BODY_TOKENS; boilerplate: header + body
    assert (
        docs.filter(
            (F.col("doc_id") >= 25) & (F.col("doc_id") < 45)
        )
        .filter(F.col("n_tok") != HEADER_TOKENS + BODY_TOKENS)
        .count()
        == 0
    )
    assert (
        docs.filter((F.col("doc_id") < 25) | (F.col("doc_id") >= 45))
        .filter(F.col("n_tok") != BODY_TOKENS)
        .count()
        == 0
    )


def test_event_skew_shape(spark):
    ev = synth_events(spark, 10_000)
    hot = ev.filter(F.col("user_id") == 0).count()
    assert hot == 3000  # exactly 30% by construction (event_id % 10 < 3)
