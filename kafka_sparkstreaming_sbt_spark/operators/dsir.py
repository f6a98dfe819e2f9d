"""DSIR-style data selection: importance resampling on hashed n-gram
features (extension surface, SURVEY §2.12 — the reference has no
selection ops; this is the "pick pretraining data that looks like the
target domain" leg of the curation pipeline).

Method (public: Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling"): fit two bag-of-hashed-ngrams generative
models — one on a small TARGET corpus (the domain you want more of),
one on the RAW pool — and resample raw documents with Gumbel-perturbed
log importance weights ``log p_target(x) - log p_raw(x)``.  Hashed
unigram+bigram buckets make both models a B-bucket multinomial, so the
whole fit is two aggregations and scoring is a broadcast join.

Cross-engine determinism (the oracle contract): every per-bucket log
term is quantized to integer MICRO-NATS (``round(ln(p)*1e6)`` as a
long — the :func:`text.unigram_lm_scores` trick), so per-document
weights are INTEGER sums (order-independent), and the Gumbel
perturbation is derived from an md5 draw and also quantized — the
final selection key is a plain long and the top-k is replayable bit
for bit in SQL.  No RNG anywhere: reruns and other engines select the
SAME documents.

Scale shape at 100 TB: feature extraction is one explode + one
partial→final aggregation on (doc, bucket); both bucket distributions
aggregate to B rows (B ~ 2^10..2^20 — metadata-sized by construction,
THE point of feature hashing, so broadcasting the ratio table is safe
at any corpus size); scoring is one broadcast join + one doc-keyed
aggregation; selection is a global integer top-k, which Spark executes
as TakeOrderedAndProject (per-partition prune, no single-partition
sort of the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log terms quantized to integer micro-nats: integer sums are
#: order-independent, so per-doc scores never hit the float-summation
#: caveat (same contract as text.unigram_lm_scores).
_MICRO = 1_000_000


def _bucket(ng: F.Column, n_buckets: int, seed: int) -> F.Column:
    """Hash an n-gram string to a bucket id 0..n_buckets-1 via the
    first 4 md5 hex chars (uniform over 0..65535 — engine-portable,
    the house md5-draw discipline; n_buckets must divide nothing in
    particular but stay ≤ 65536 so the draw covers every bucket)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), ng)), 1, 4),
        16,
        10,
    ).cast("int")
    return F.pmod(h, F.lit(n_buckets)).cast("int")


def hashed_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    seed: int = 7,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document hashed unigram+bigram counts:
    ``(id, *carry_cols, bucket, cnt)`` — the DSIR feature map.

    Tokens are the single-space split (the corpus-wide tokenizer
    contract); bigrams join adjacent tokens with ``_``.  The n-gram
    arrays build per-row in codegen'd array expressions, ONE explode
    flattens them, and the md5 bucket hash runs on the flat rows
    (codegen) — then one partial→final count on (doc, bucket).  Shuffle
    volume is at most tokens-per-doc rows per doc, usually far less
    after map-side combine (buckets repeat within a doc).

    ``carry_cols`` ride through the explode and the grouping —
    per-document attributes (a label, a source) are functionally
    dependent on the id, so carrying them is free and spares the
    consumer an id-keyed join back to the corpus (measured: the NB
    trainer's label join was 8 sort-merge joins across re-executed
    branches before this)."""
    if not 2 <= n_buckets <= 65536:
        raise ValueError(
            f"n_buckets must be in [2, 65536], got {n_buckets}"
        )
    toks = F.split(F.col(text_col), " ")
    # adjacent-pair bigrams: zip the array against itself shifted by
    # one (slice is 1-based; n-1 pairs for n tokens)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    ngrams = F.concat(toks, bigrams)
    flat = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(ngrams).alias("_ng"),
    ).select(
        id_col,
        *carry_cols,
        _bucket(F.col("_ng"), n_buckets, seed).alias("bucket"),
    )
    return flat.groupBy(id_col, *carry_cols, "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def bucket_log_ratio(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    n_buckets: int,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-bucket importance log-ratio in integer micro-nats:
    ``(bucket, ratio_micro)`` with
    ``ratio_micro = round((ln p_target(b) - ln p_raw(b)) * 1e6)``,
    add-``alpha`` smoothed (``p(b) = (c_b + α) / (N + αB)``) so
    buckets unseen on either side stay finite.

    Both inputs are :func:`hashed_ngram_counts` frames.  Aggregation
    collapses them to ≤ B rows each; the complete ``spark.range``
    bucket spine keeps zero-count buckets in the table (they carry the
    strongest negative/positive evidence after smoothing).  The result
    is metadata-sized by construction — safe to broadcast regardless
    of corpus size (this bound comes from ``n_buckets``, not the
    data, unlike the data-dependent intermediates the house rules
    forbid forcing)."""
    spark = target_feats.sparkSession
    spine = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )

    def totals(feats: DataFrame, name: str) -> DataFrame:
        # the per-bucket table is ≤ B rows BY CONSTRUCTION (the
        # feature-hashing bound) but its lineage is the corpus
        # explode; it feeds both the spine join and the grand total
        # below, so materialize it once (r11 — the same bounded-
        # artifact contract as nb_train's model checkpoint; eager so
        # two consumers in one plan can never race it into computing
        # the explode twice)
        per_b = feats.groupBy("bucket").agg(
            F.sum("cnt").alias(f"c_{name}")
        )
        return per_b.localCheckpoint(eager=True)

    t = totals(target_feats, "t")
    r = totals(raw_feats, "r")
    joined = (
        spine.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
            F.coalesce("c_r", F.lit(0)).alias("c_r"),
        )
    )
    # coalesce: an empty side must degrade to the pure-smoothing
    # uniform (sum over zero rows is NULL, which would null every
    # ratio and silently select arbitrary documents).  Grand totals
    # re-aggregate the ≤B-row checkpointed tables, NOT the corpus —
    # before r11 each total re-executed the full explode+count
    # featurization a second time per side (the lesson nb_train's
    # totals already encoded).
    nt = t.agg(F.coalesce(F.sum("c_t"), F.lit(0)).alias("n_t"))
    nr = r.agg(F.coalesce(F.sum("c_r"), F.lit(0)).alias("n_r"))
    a, b = float(alpha), float(n_buckets)
    lp_t = F.ln((F.col("c_t") + a) / (F.col("n_t") + a * b))
    lp_r = F.ln((F.col("c_r") + a) / (F.col("n_r") + a * b))
    return (
        joined.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "bucket",
            F.round((lp_t - lp_r) * _MICRO).cast("long").alias(
                "ratio_micro"
            ),
        )
    )


def dsir_log_weights(
    raw_feats: DataFrame, ratio: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document importance weight ``(id, w_micro, log_weight)``:
    ``w_micro = Σ_b cnt_b · ratio_micro(b)`` — an integer sum, so
    accumulation order is irrelevant — and ``log_weight`` its 6-dp
    nat form for human consumption.  One broadcast join against the
    B-row ratio table + one doc-keyed aggregation."""
    return (
        raw_feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("ratio_micro")).alias("w_micro"))
        .select(
            id_col,
            "w_micro",
            F.round(F.col("w_micro") / _MICRO, 6).alias("log_weight"),
        )
    )


def _gumbel_micro(key: F.Column, seed: int) -> F.Column:
    """Deterministic Gumbel(0,1) draw in integer micro-nats: u from
    the first 8 md5 hex chars (uniform over 2^32 levels, offset by
    0.5 so u ∈ (0,1) strictly), then ``round(-ln(-ln u) * 1e6)``.
    md5 → exact integer → two lns → one round: every engine computes
    ln of the SAME double, and the quantized result joins the integer
    ranking path."""
    u32 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), key)), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (u32.cast("double") + 0.5) / F.lit(float(1 << 32))
    return F.round(-F.ln(-F.ln(u)) * _MICRO).cast("long")


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n_keep: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    seed: int = 7,
) -> DataFrame:
    """End-to-end DSIR selection: keep the ``n_keep`` raw documents
    with the largest Gumbel-perturbed importance weights
    (Gumbel-top-k IS sampling-without-replacement proportional to
    ``exp(log_weight)`` — the resampling step of the paper, made
    deterministic by the md5 Gumbel draw).  Returns
    ``(id, log_weight, sel_micro)`` for the selected documents.

    The ranking key ``sel_micro = w_micro + gumbel_micro`` is a plain
    long, ties broken by id — the global top-k runs as
    TakeOrderedAndProject (per-partition prune), never a full sort."""
    if n_keep < 1:
        raise ValueError(f"n_keep must be >= 1, got {n_keep}")
    # the raw featurization feeds the ratio's per-bucket counts AND
    # the per-doc weight sum — materialize it once (r11; eager, so the
    # two consumers can never independently re-run the explode).  The
    # blocks die with the RDD, no cache-entry leak.
    raw_feats = hashed_ngram_counts(
        raw, text_col, id_col, n_buckets, seed
    ).localCheckpoint(eager=True)
    target_feats = hashed_ngram_counts(
        target, text_col, id_col, n_buckets, seed
    )
    ratio = bucket_log_ratio(target_feats, raw_feats, n_buckets, alpha)
    w = dsir_log_weights(raw_feats, ratio, id_col)
    sel = w.select(
        id_col,
        "log_weight",
        (
            F.col("w_micro")
            + _gumbel_micro(F.col(id_col).cast("string"), seed)
        ).alias("sel_micro"),
    )
    return sel.orderBy(F.desc("sel_micro"), F.col(id_col)).limit(n_keep)
