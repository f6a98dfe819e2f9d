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


def test_embedding_corpus_geometry(spark):
    """The embed phase's premises hold at tiny scale: intra-cluster
    cosine clears the 0.9 threshold, blob pairs clear it too (every
    blob pair is a TRUE near-dup), and isotropic/unique pairs never
    reach it (the false-drop check is meaningful)."""
    import numpy as np

    from scalecheck import EMB_THRESHOLD, synth_embeddings

    n = 400
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in synth_embeddings(spark, n).collect()
    }
    assert all(len(v) == 64 for v in vecs.values())

    def cos(a, b):
        return float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))

    n_clone, n_blob = n // 4, n // 5
    # every intra-cluster pair is above threshold
    for c in range(n_clone // 3):
        ids = [3 * c, 3 * c + 1, 3 * c + 2]
        for i in range(3):
            for j in range(i + 1, 3):
                assert cos(vecs[ids[i]], vecs[ids[j]]) >= EMB_THRESHOLD
    # blob pairs are above threshold (sampled)
    blob = list(range(n_clone, n_clone + n_blob))
    for i in range(0, len(blob) - 1, 7):
        assert cos(vecs[blob[i]], vecs[blob[i + 1]]) >= EMB_THRESHOLD
    # unique x unique and unique x clone stay far below (all pairs of
    # a sample)
    uniq = list(range(n_clone + n_blob, n))[:40]
    worst = max(
        cos(vecs[a], vecs[b])
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
    )
    assert worst < 0.7


def test_embedding_corpus_is_deterministic(spark):
    from scalecheck import synth_embeddings

    a = synth_embeddings(spark, 200).collect()
    b = synth_embeddings(spark, 200).collect()
    assert {(r["vec_id"], tuple(r["embedding"])) for r in a} == {
        (r["vec_id"], tuple(r["embedding"])) for r in b
    }


def test_clustered_corpus_geometry(spark):
    """The auto-probe demonstration corpus must really be clustered:
    intra-cluster cosine ~0.99 (neighbors live at home), cross-cluster
    cosine well below — otherwise the 'auto tunes below the default'
    check would measure noise, not structure."""
    from scalecheck import synth_clustered_embeddings

    from kafka_sparkstreaming_sbt_spark.operators.similarity import (
        cosine_topk,
    )

    emb = synth_clustered_embeddings(spark, 120, n_clusters=10)
    q = emb.filter(F.col("vec_id") < 10)  # one query per cluster
    top = cosine_topk(emb, q, k=5).collect()
    # every neighbor of query c shares cluster c (= vec_id % 10)
    for r in top:
        assert r.neighbor_id % 10 == r.query_id % 10, r
        assert r.cosine > 0.95, r
    # determinism: hash-derived, identical across builds
    a = {(r.vec_id, tuple(r.embedding)) for r in emb.collect()}
    b = {
        (r.vec_id, tuple(r.embedding))
        for r in synth_clustered_embeddings(
            spark, 120, n_clusters=10
        ).collect()
    }
    assert a == b


def test_selection_scale_section_gates_at_tiny_scale(spark, tmp_path):
    """run_selection_scale's quality gates must hold on the same
    synthetic layout at test speed: the boilerplate 'domain' seed
    pulls the remaining boilerplate docs to the top of the DSIR
    ranking, and NB separates boilerplate-ness near-perfectly."""
    from scalecheck import run_selection_scale

    n = 4000
    synth_documents(spark, n).repartition(4).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"docs_{n}"))
    d = run_selection_scale(spark, n, str(tmp_path))
    assert d["dsir_on_domain_frac"] >= 0.95, d
    assert d["nb_accuracy"] >= 0.999, d
    assert d["dsir_n_selected"] > 0
