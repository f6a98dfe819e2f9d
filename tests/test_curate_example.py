"""End-to-end curation example: the full LLM-data chain (quality ->
lang-id -> exact dedup -> MinHash transitive dedup -> PII redaction ->
deterministic split -> partitioned lake write) over driver testdata."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"),
)

from curate_corpus import curate  # noqa: E402


def test_curate_corpus_end_to_end(spark, sf_small):
    out = tempfile.mkdtemp()
    report = curate(spark, sf_small, out)
    assert 0 < report["curated_docs"] <= report["input_docs"]
    # dedup stages must actually drop something on this corpus (it
    # contains planted exact and near duplicates)
    assert report["curated_docs"] < report["input_docs"]
    assert set(report["by_split"]) <= {"train", "valid", "test"}
    # deterministic: a second run over the same input is identical
    out2 = tempfile.mkdtemp()
    report2 = curate(spark, sf_small, out2)
    assert report == report2
    a = spark.read.parquet(out).orderBy("doc_id").collect()
    b = spark.read.parquet(out2).orderBy("doc_id").collect()
    assert a == b


def test_curate_with_semantic_stage(spark, sf_small):
    """--semantic-threshold composes SemDeDup into the chain: the
    semantic-kept set can only shrink the curated corpus (it is one
    more left-semi join), the pipeline stays deterministic, and a
    permissive threshold (1.01 > any cosine) drops nothing."""
    import tempfile

    out_base = tempfile.mkdtemp()
    base = curate(spark, sf_small, out_base)
    out_sem = tempfile.mkdtemp()
    sem = curate(spark, sf_small, out_sem, semantic_threshold=0.8)
    assert sem["curated_docs"] <= base["curated_docs"]
    out_sem2 = tempfile.mkdtemp()
    assert curate(spark, sf_small, out_sem2, semantic_threshold=0.8) == sem
    # impossible threshold -> semantic stage is a no-op
    out_noop = tempfile.mkdtemp()
    noop = curate(spark, sf_small, out_noop, semantic_threshold=1.01)
    assert noop["curated_docs"] == base["curated_docs"]


def test_curate_with_relative_quality_and_diversity(spark, sf_small):
    """--quality-quantile and --diversity-k compose into the chain:
    the relative cut keeps every language represented (the absolute
    bar's failure mode), the diversity cap can only shrink, and the
    pipeline stays deterministic end to end."""
    import tempfile

    from pyspark.sql import functions as F

    out_base = tempfile.mkdtemp()
    base = curate(spark, sf_small, out_base)
    out_q = tempfile.mkdtemp()
    rel = curate(spark, sf_small, out_q, quality_quantile=0.5)
    # every language that entered the corpus survives the relative cut
    langs_in = {
        r.detected_lang
        for r in spark.read.parquet(out_base)
        .select("detected_lang").distinct().collect()
    }
    langs_out = {
        r.detected_lang
        for r in spark.read.parquet(out_q)
        .select("detected_lang").distinct().collect()
    }
    # a language with any surviving doc keeps its top-50% (>= 1 doc:
    # the per-group percentile of one value is that value, kept by >=)
    # — the absolute bar has no such guarantee
    assert langs_in <= langs_out
    assert langs_out  # non-degenerate
    # top-50%-per-language keeps roughly half of what the permissive
    # absolute bar kept (ties can push it over)
    assert rel["curated_docs"] < base["curated_docs"]

    out_d = tempfile.mkdtemp()
    div = curate(spark, sf_small, out_d, diversity_k=3)
    assert div["curated_docs"] <= base["curated_docs"]
    # determinism of the full composition
    out_all = tempfile.mkdtemp()
    both = curate(
        spark, sf_small, out_all, quality_quantile=0.5, diversity_k=3
    )
    out_all2 = tempfile.mkdtemp()
    assert curate(
        spark, sf_small, out_all2, quality_quantile=0.5, diversity_k=3
    ) == both
    assert both["curated_docs"] <= rel["curated_docs"]


def test_diversity_cap_counts_survivors_not_raw_docs(spark, sf_small):
    """Regression: the per-cell cap must be computed over SURVIVING
    docs — drawing from the raw table lets already-dropped docs
    consume cell slots, silently under-filling cells.  Every cell must
    contribute exactly min(k, survivors-in-cell)."""
    import tempfile

    from pyspark.sql import functions as F

    from kafka_sparkstreaming_sbt_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
    )
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    out_base = tempfile.mkdtemp()
    curate(spark, sf_small, out_base)
    base_ids = spark.read.parquet(out_base).select("doc_id")
    k = 3
    out_d = tempfile.mkdtemp()
    curate(spark, sf_small, out_d, diversity_k=k)
    div_ids = {r.doc_id for r in spark.read.parquet(out_d).collect()}

    emb = read_table(spark, sf_small, "embeddings")
    cents = kmeans_centroids(emb, n_iter=2)
    surv_cells = ivf_assign(
        emb.join(
            base_ids.select(F.col("doc_id").alias("vec_id")), "vec_id",
            "left_semi",
        ),
        cents,
        method="numpy",
    )
    expected = {
        r.cell_id: min(k, r.n)
        for r in surv_cells.groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r.cell_id: r.n
        for r in surv_cells.filter(
            F.col("vec_id").isin(list(div_ids))
        )
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected
