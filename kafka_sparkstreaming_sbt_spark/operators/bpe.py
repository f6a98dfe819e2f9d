"""BPE merge training at corpus scale — the tokenizer-pipeline step
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"; the fastText/GPT-2 vocabulary recipe) re-expressed for
a distributed corpus.

The classic algorithm is a loop over WORD TYPES, not corpus tokens:
count each distinct word once (one corpus-sized shuffle, ever), then
every merge round runs over the vocabulary table weighted by word
frequency — cost independent of corpus size, exactly how the original
implementation batches by word frequency.  Each round is

    adjacent-pair explode (weighted)  ->  one partial->final SUM agg
    ->  argmax merge pair (TakeOrderedAndProject limit 1, total order
        (count DESC, left, right) so training is deterministic on any
        engine and partitioning)  ->  a one-ROW driver collect (the
        winning pair — bounded by construction)  ->  per-word greedy
        left-to-right merge application as a Catalyst ``aggregate``
        fold (no UDF, no Python in the loop).

The fold reproduces reference BPE's greedy scan exactly: ``a a a``
under merge ``(a, a)`` becomes ``[aa, a]``, never ``[a, aa]``.
Vocabulary lineage is localCheckpointed per round (the table is
vocabulary-sized — small by corpus standards) so the plan does not
deepen with the merge count, the ``kmeans``/connected-components
iterative pattern.

No end-of-word marker is appended (merges never cross word
boundaries here by construction; add a marker in ``text_col``
upstream if the downstream tokenizer needs one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_vocab(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, wcount): corpus word types with frequencies — the ONE
    corpus-sized shuffle of BPE training; everything after runs on
    this table."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wcount"))
    )


def _adjacent_pairs(syms) -> F.Column:
    """array<struct<left,right>> of adjacent symbol pairs; empty for
    single-symbol words (guarded — Spark ``sequence(2, 1)`` counts
    DOWN, it is not empty)."""
    n = F.size(syms)
    pairs = F.transform(
        F.sequence(F.lit(2), n),
        lambda i: F.struct(
            F.element_at(syms, i - 1).alias("left"),
            F.element_at(syms, i).alias("right"),
        ),
    )
    return F.when(n >= 2, pairs).otherwise(
        F.expr(
            "CAST(array() AS array<struct<left:string,right:string>>)"
        )
    )


def bpe_pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over a (syms, wcount) vocabulary
    table: map-side explode, one partial->final SUM keyed by the pair
    — a pair occurring in a million words combines map-side."""
    return (
        vocab_syms.select(
            F.explode(_adjacent_pairs(F.col("syms"))).alias("p"),
            "wcount",
        )
        .groupBy(
            F.col("p.left").alias("left"),
            F.col("p.right").alias("right"),
        )
        .agg(F.sum("wcount").cast("long").alias("pair_count"))
    )


def _apply_merge(syms, left: str, right: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (left, right) into
    left||right — a Catalyst ``aggregate`` fold with a (out, prev)
    accumulator, the exact reference-BPE scan ('a a a' + (a,a) ->
    [aa, a])."""
    merged = left + right
    init = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        take = acc.prev.isNotNull() & (acc.prev == left) & (s == right)
        return F.when(
            take,
            F.struct(
                F.concat(acc.out, F.array(F.lit(merged))).alias("out"),
                F.lit(None).cast("string").alias("prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc.prev.isNull(), acc.out
                ).otherwise(
                    F.concat(acc.out, F.array(acc.prev))
                ).alias("out"),
                s.alias("prev"),
            )
        )

    def finish(acc):
        return F.when(acc.prev.isNull(), acc.out).otherwise(
            F.concat(acc.out, F.array(acc.prev))
        )

    return F.aggregate(syms, init, step, finish)


def _word_symbols(eow_marker: str | None) -> F.Column:
    """Character symbols of ``word``, with the optional end-of-word
    marker appended as its own symbol (the Sennrich '</w>'
    convention — lets the trainer learn word-FINAL units distinct
    from word-internal ones; the caller guarantees the marker is not
    a character that occurs inside words)."""
    syms = F.split("word", "")
    if eow_marker is not None:
        syms = F.concat(syms, F.array(F.lit(eow_marker)))
    return syms


def bpe_train_merges(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    eow_marker: str | None = None,
) -> DataFrame:
    """Train ``n_merges`` BPE merges over the corpus; returns
    ``(merge_rank, left, right, pair_count)`` in training order.
    Stops early if no adjacent pair remains.  Each round's driver
    collect is the single winning pair row — bounded by construction;
    the vocabulary table is localCheckpointed per round so plan depth
    stays flat.  Ties break (pair_count DESC, left, right) — training
    is bit-deterministic on any engine or partitioning."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    vocab = (
        word_vocab(df, text_col)
        .select(_word_symbols(eow_marker).alias("syms"), "wcount")
        .localCheckpoint()
    )
    rows = []
    for rank in range(1, n_merges + 1):
        top = (
            bpe_pair_counts(vocab)
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        t = top[0]
        rows.append((rank, t.left, t.right, t.pair_count))
        vocab = vocab.select(
            _apply_merge(F.col("syms"), t.left, t.right).alias(
                "syms"
            ),
            "wcount",
        ).localCheckpoint()
    return spark.createDataFrame(
        rows,
        "merge_rank long, left string, right string, pair_count long",
    )


def bpe_vocab_tokens(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    eow_marker: str | None = None,
) -> DataFrame:
    """Tokenize the corpus VOCABULARY with a trained merge table:
    ``(word, tokens, wcount)`` — the artifact a tokenizer ships.
    Merges are collected once in rank order (n_merges rows — bounded:
    it is the model) and applied as chained codegen'd folds; pass the
    same ``eow_marker`` the trainer used.  Join the mapping to a
    token stream downstream for doc-level encoding
    (:func:`bpe_encode_docs`)."""
    ordered = [
        (r.left, r.right)
        for r in merges.orderBy("merge_rank").collect()
    ]
    vocab = word_vocab(df, text_col).select(
        "word", _word_symbols(eow_marker).alias("syms"), "wcount"
    )
    out = F.col("syms")
    for left, right in ordered:
        out = _apply_merge(out, left, right)
    return vocab.select(
        "word", out.alias("tokens"), "wcount"
    )


def bpe_encode_docs(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eow_marker: str | None = None,
) -> DataFrame:
    """Encode every document with a trained merge table:
    ``(id, bpe_tokens, n_bpe_tokens)``, subwords in document order.

    Scale shape: the expensive fold runs ONCE PER WORD TYPE
    (:func:`bpe_vocab_tokens`), never per token — the corpus side
    only explodes (word, position) pairs and equi-joins the mapping
    (vocabulary-sized; AQE broadcasts it when it fits), then one
    doc-keyed reassembly agg, the ``drop_duplicate_chunks`` pattern.
    Documents with no words come back with empty token arrays."""
    mapping = bpe_vocab_tokens(df, merges, text_col, eow_marker)
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word") != "")
    cells = F.array_sort(F.collect_list(F.struct("pos", "tokens")))
    encoded = (
        words.join(mapping.select("word", "tokens"), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(cells, lambda s: s.tokens)
            ).alias("bpe_tokens")
        )
    )
    return (
        df.select(id_col)
        .join(encoded, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.col("bpe_tokens"),
                F.expr("CAST(array() AS array<string>)"),
            ).alias("bpe_tokens"),
        )
        .withColumn(
            "n_bpe_tokens", F.size("bpe_tokens").cast("long")
        )
    )
