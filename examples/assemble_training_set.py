"""Training-set assembly pipeline — the stage AFTER curation: turn a
cleaned document lake into packed, epoch-shuffled training sequences:

    sliding-window chunking (long docs -> bounded chunks) ->
    deterministic epoch shuffle (md5 shard/rank, no global sort) ->
    contiguous sequence packing (per-shard running token totals) ->
    partitioned parquet manifest + one-line JSON report.

The output is a MANIFEST (chunk text + its (shard, seq_index,
seq_offset) placement), not a tensor: the tokenizer/renderer consumes
it shard-by-shard, and every placement is closed-form so any shard
can be re-rendered independently — the property that matters when
1000 executors each materialize their own slice of an epoch.
Deterministic end to end: same input + same seed = byte-identical
manifest; a new --seed is a fresh epoch permutation.

    python examples/assemble_training_set.py \
        --input /root/testdata/sf0.01 --output /tmp/train_seqs \
        [--chunk-tokens 512] [--stride 512] [--seq-len 256]
        [--seed 0] [--n-shards 16]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.chunking import (
    chunk_documents,
    pack_documents,
)
from kafka_sparkstreaming_sbt_spark.session import get_spark
from kafka_sparkstreaming_sbt_spark.sources.batch import read_table


def assemble(
    spark,
    input_dir: str,
    output_dir: str,
    chunk_tokens: int = 512,
    stride: int = 512,
    seq_len: int = 256,
    seed: int = 0,
    n_shards: int = 16,
) -> dict:
    """Run the assembly chain; returns the packing report."""
    docs = read_table(spark, input_dir, "documents")

    # 1. bound every unit at chunk_tokens (stride == chunk_tokens ->
    #    disjoint chunks, the pretraining default; stride < chunk_tokens
    #    -> overlapping chunks for retrieval-style sets)
    chunks = chunk_documents(
        docs, chunk_tokens=chunk_tokens, stride=stride
    ).withColumn(
        "chunk_id",
        F.concat_ws("#", F.col("doc_id"), F.col("chunk_index")),
    )

    # 2+3. epoch shuffle + contiguous packing of the chunk stream
    packed = pack_documents(
        chunks,
        seq_len=seq_len,
        id_col="chunk_id",
        text_col="chunk_text",
        seed=seed,
        n_shards=n_shards,
    )
    manifest = packed.join(
        chunks.select("chunk_id", "doc_id", "chunk_index", "chunk_text"),
        "chunk_id",
    )
    manifest.write.mode("overwrite").partitionBy("shard").parquet(output_dir)

    out = spark.read.parquet(output_dir)
    stats = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("tokens"),
        (F.max("seq_index") + 1).alias("n_sequences"),
    )
    totals = stats.agg(
        F.sum("n_chunks").alias("chunks"),
        F.sum("tokens").alias("tokens"),
        F.sum("n_sequences").alias("sequences"),
    ).first()
    return {
        "input_docs": docs.count(),
        "chunks": totals.chunks,
        "tokens": int(totals.tokens),
        "sequences": int(totals.sequences),
        # packing efficiency: used tokens over sequence capacity (the
        # per-shard tail sequence may be partial — that's the only slack
        # contiguous packing leaves)
        "fill_ratio": round(
            totals.tokens / (totals.sequences * seq_len), 4
        ),
        "shards": stats.count(),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="dir with documents.parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--chunk-tokens", type=int, default=512)
    p.add_argument("--stride", type=int, default=512)
    p.add_argument("--seq-len", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-shards", type=int, default=16)
    args = p.parse_args()
    spark = get_spark(app_name="assemble-training-set")
    report = assemble(
        spark,
        args.input,
        args.output,
        args.chunk_tokens,
        args.stride,
        args.seq_len,
        args.seed,
        args.n_shards,
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
