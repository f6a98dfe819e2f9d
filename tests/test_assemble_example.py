"""End-to-end training-set assembly example: chunk -> deterministic
epoch shuffle -> contiguous packing -> sharded manifest write."""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"),
)

from assemble_training_set import assemble  # noqa: E402


def test_assemble_end_to_end_and_determinism(spark, sf_small):
    out = tempfile.mkdtemp()
    report = assemble(spark, sf_small, out, seq_len=256, seed=0)
    assert report["chunks"] >= report["input_docs"] > 0
    assert report["sequences"] > 0
    # contiguous packing leaves slack only in per-shard tail sequences
    assert 0.5 < report["fill_ratio"] <= 1.0
    # identical rerun -> identical manifest (no RNG anywhere)
    out2 = tempfile.mkdtemp()
    assert assemble(spark, sf_small, out2, seq_len=256, seed=0) == report
    a = spark.read.parquet(out).orderBy("chunk_id").collect()
    b = spark.read.parquet(out2).orderBy("chunk_id").collect()
    assert a == b
    # a new seed is a different epoch permutation of the SAME chunks
    out3 = tempfile.mkdtemp()
    report3 = assemble(spark, sf_small, out3, seq_len=256, seed=1)
    assert report3["chunks"] == report["chunks"]
    c = spark.read.parquet(out3)
    placement = lambda df: {  # noqa: E731
        r.chunk_id: (r.shard, r.pos_in_shard)
        for r in df.select("chunk_id", "shard", "pos_in_shard").collect()
    }
    assert placement(spark.read.parquet(out)) != placement(c)


def test_manifest_offsets_are_renderable(spark, sf_small):
    """The contract a shard renderer relies on: within every shard,
    chunks in pos order have seq placements that exactly tile the
    token stream (next start = prev start + prev tokens)."""
    out = tempfile.mkdtemp()
    assemble(spark, sf_small, out, seq_len=128, seed=0)
    rows = (
        spark.read.parquet(out)
        .select("shard", "pos_in_shard", "n_tokens", "seq_index", "seq_offset")
        .withColumn("abs_start", F.col("seq_index") * 128 + F.col("seq_offset"))
        .orderBy("shard", "pos_in_shard")
        .collect()
    )
    prev = {}
    for r in rows:
        expect = prev.get(r.shard, 0)
        assert r.abs_start == expect, (r.shard, r.pos_in_shard)
        prev[r.shard] = expect + r.n_tokens
