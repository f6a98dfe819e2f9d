"""SimHash document fingerprinting and near-duplicate detection
(extension surface, SURVEY.md §7.2 step 6 — the reference contains no
dedup beyond exact ``dropDuplicates``, CustomerSpendingAnalysis
.scala:71; this is the Charikar 2002 rounding-hash family).

Algorithm:

1. token hash: first 16 hex chars of ``md5(token)`` — 64 bits as 16
   nibbles.  The nibble values are recovered with ``ascii`` arithmetic
   so the bit family is byte-identical in any engine with md5
   (our DuckDB oracle mirrors it exactly).
2. per bit b in 0..63: weight_b = sum over the token MULTISET (term
   frequency = weight) of +1 if bit set else -1.
3. fingerprint: 64-char '0'/'1' string, '1' where weight_b > 0.
4. near-dup candidates: band the fingerprint into ``n_bands``
   contiguous substrings and equi-join on (band, substring) — by
   pigeonhole, any pair within hamming distance < n_bands shares at
   least one band, so candidate generation is COMPLETE for
   ``max_hamming < n_bands`` while costing only per-bucket-quadratic
   comparisons (the same N^2 -> sum |bucket|^2 reduction as MinHash
   banding).
5. verify: exact hamming distance over the full fingerprints,
   keep pairs <= max_hamming.

Everything is Catalyst ``transform``/``aggregate`` expressions — one
projection pass per doc, no shuffle until the (tiny) band join; at
100 TB the fingerprint step is embarrassingly parallel and the join
keys are 8-char strings, not documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

N_BITS = 64
_NIBBLES = N_BITS // 4


def _nibble(ch: F.Column) -> F.Column:
    """Hex char -> 0..15 ('0'-'9' ascii 48-57, 'a'-'f' ascii 97-102)."""
    v = F.ascii(ch)
    return F.when(v <= 57, v - 48).otherwise(v - 87)


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a 64-char '0'/'1' ``simhash`` column over the whitespace
    token multiset of ``text_col``.

    One pass per document: each token expands to its 64 +-1 bit
    contributions (bit b of a token = bit ``b % 4`` of the md5 hex
    nibble at position ``b // 4``), and a single ``aggregate`` folds
    them into the 64-weight vector with ``zip_with`` — a compact
    expression tree that stays inside whole-stage codegen (the naive
    64-separate-aggregates formulation is ~10x slower)."""
    toks = F.split(F.col(text_col), " ")
    # md5 hashed ONCE per token (an inner lambda would recompute it
    # per nibble — measured 2x slower), then each prefix expands to
    # its 64 +-1 bit contributions, nibble bits unpacked with literal
    # shifts in b order (pos = b//4 + 1, shift = b%4)
    hashes = F.transform(toks, lambda t: F.substring(F.md5(t), 1, _NIBBLES))
    contribs = F.transform(
        hashes,
        lambda h: F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.lit(_NIBBLES)),
                lambda i: _nibble_signs(
                    _nibble(F.substring(h, i, F.lit(1)))
                ),
            )
        ),
    )
    weights = F.aggregate(
        contribs,
        F.array_repeat(F.lit(0), N_BITS),
        lambda acc, x: F.zip_with(acc, x, lambda a, v: a + v),
    )
    simhash = F.array_join(
        F.transform(
            weights,
            lambda w: F.when(w > 0, F.lit("1")).otherwise(F.lit("0")),
        ),
        "",
    )
    return df.withColumn("simhash", simhash)


def _nibble_signs(n: F.Column) -> F.Column:
    """A nibble's 4 bit contributions as +-1, LSB first."""
    return F.array(
        *[
            F.shiftright(n, s).bitwiseAND(F.lit(1)) * 2 - 1
            for s in range(4)
        ]
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash) fingerprints via explode -> 64-column hash
    aggregate — same bit family as :func:`with_simhash`, but all flat
    expressions: Spark's higher-order array functions (transform /
    aggregate) are interpreted, while this shape stays inside
    whole-stage codegen with map-side partial aggregation (measured
    ~4x faster).  The shuffle carries 64 ints per doc, nothing more.

    Prefer this when an id column exists (always, for corpus dedup);
    ``with_simhash`` remains for adding the column in-place to
    arbitrary rows.  (A dictionary-encoded variant — hash each
    DISTINCT token once, join contributions back — was measured
    SLOWER here: the 64-int-wide join rows cost more than recomputing
    bit contributions inline from the 16-char hash prefix.)"""
    ex = (
        # the md5 decode per token is compute-bound and the byte-small
        # doc table arrives as one scan partition: rebalance BEFORE
        # the heavy projection or it runs single-threaded
        parallelize_for_compute(df)
        .select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
        )
        .withColumn("_h", F.substring(F.md5(F.col("_tok")), 1, _NIBBLES))
        # decode the 16 hex chars as TWO 32-bit conv()s (ANSI-safe:
        # 8 hex chars < 2^32); the 64 aggregates below then extract
        # bits with long shifts — measured ~10% faster than decoding
        # 16 separate substring+ascii nibble columns, with the
        # identical bit family (nibble i = hex char i MSB-first,
        # bit b of a token = bit b%4 of nibble b//4)
        .select(
            F.col(id_col),
            F.conv(F.substring("_h", 1, 8), 16, 10)
            .cast("long")
            .alias("_hi"),
            F.conv(F.substring("_h", 9, 8), 16, 10)
            .cast("long")
            .alias("_lo"),
        )
    )
    aggs = []
    for b in range(N_BITS):
        pos, shift = b // 4 + 1, b % 4
        word = F.col("_hi") if pos <= 8 else F.col("_lo")
        wpos = pos if pos <= 8 else pos - 8  # nibble within word, MSB-first
        contrib = (
            F.shiftright(word, (8 - wpos) * 4 + shift).bitwiseAND(F.lit(1))
            * 2
            - 1
        )
        aggs.append(F.sum(contrib).alias(f"_w{b}"))
    weights = ex.groupBy(id_col).agg(*aggs)
    bits = [
        F.when(F.col(f"_w{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for b in range(N_BITS)
    ]
    return weights.select(F.col(id_col), F.concat(*bits).alias("simhash"))


def hamming(a: F.Column, b: F.Column, n_bits: int = N_BITS) -> F.Column:
    """Hamming distance between two equal-length '0'/'1' strings."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(n_bits)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(F.substring(a, i, F.lit(1)) == F.substring(b, i, F.lit(1)), 0)
        .otherwise(1),
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    n_bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, hamming <= max_hamming) via banded
    fingerprint join.  Complete for ``max_hamming < n_bands`` — and the
    RESULT is banding-independent (exactly the hamming-ball pairs);
    banding only shapes the candidate cost.

    Band width matters at scale: 4 bands of 16 bits give 65,536
    distinct chunk values per band, vs only 256 for 8 bands of 8 bits
    — real corpora concentrate fingerprint bits, so narrow chunks
    create quadratic hot buckets (measured: OOM at sf0.1 with 8-bit
    chunks).  Widest bands that still satisfy max_hamming < n_bands is
    the right default.

    The candidate set's size is data-dependent (boilerplate-heavy
    corpora collide more), so nothing here forces a broadcast — the
    verify join carries only 65-byte fingerprints and AQE picks the
    strategy from actual sizes.

    ``max_bucket_size`` caps (band, chunk) bucket fan-out before the
    quadratic candidate join — same guard rail and recall tradeoff as
    ``dedup_fuzzy.cap_hot_buckets`` (a banding-completeness caveat on
    top: a pair surviving only via a capped band is lost, so the
    capped result is a subset of the exact hamming ball).
    """
    from kafka_sparkstreaming_sbt_spark.operators.dedup_fuzzy import (
        cap_hot_buckets,
    )

    assert max_hamming < n_bands, "banding completeness needs hamming < bands"
    band_w = N_BITS // n_bands
    # simhash_fingerprints rebalances its input itself — wrapping the
    # argument in parallelize_for_compute too cost a second
    # back-to-back full repartition shuffle of the corpus (r11)
    fp = simhash_fingerprints(df, text_col, id_col).withColumnRenamed(
        id_col, "doc_id"
    )
    # the fingerprint table feeds the band explode AND both verify
    # sides; 65 bytes/doc, so persisting it is cheap at any scale
    fp = fp.persist()
    bands = fp.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.substring(
                            "simhash", i * band_w + 1, band_w
                        ).alias("chunk"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bc"),
    ).select(
        # hashed 64-bit bucket key (band, chunk) — same join-key
        # discipline as the minhash path (8 bytes vs a 17-char string)
        "doc_id", F.xxhash64("bc.band", "bc.chunk").alias("bucket")
    )
    bands = cap_hot_buckets(bands, "bucket", max_bucket_size)
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"))
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            hamming(F.col("fp_a"), F.col("fp_b")).alias("hamming"),
        )
    )
    return verified.filter(F.col("hamming") <= max_hamming)
