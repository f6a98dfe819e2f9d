"""Model-based quality filtering: a multinomial Naive Bayes classifier
over hashed unigram+bigram features, trained and scored entirely in
DataFrame aggregations (extension surface, SURVEY §2.12 — the
reference has no classifier ops).

Why this shape: production pretraining pipelines filter with a cheap
linear text classifier (the CCNet / LLaMA "fastText quality filter"
recipe — public: Joulin et al. 2016, Wenzek et al. 2019): a seed set
of "good" documents (wiki/books) vs a random crawl slice, bag of word
+ bigram features, linear scores.  Multinomial NB IS that linear
scorer with counts for weights — and unlike SGD training it reduces to
two aggregations, so the TRAINING itself is a deterministic,
oracle-replicable Spark job that scales to any corpus: no driver-side
optimizer, no iteration, one shuffle on (class, bucket).

Cross-engine determinism: per-bucket log-likelihood ratios and the
class prior quantize to integer MICRO-NATS (the
:func:`text.unigram_lm_scores` trick), so per-document scores are
integer sums — order-independent, hash-gateable, and the decision
boundary (``score > 0``) is exact.

Scale shape at 100 TB: the model is ≤ B+1 rows by construction
(``n_buckets`` bounds it, not the data) — broadcast-safe at any corpus
size.  Training: one explode + partial→final count on (class, bucket).
Scoring: one broadcast join + one doc-keyed aggregation.  The corpus
is never shuffled on a data-dependent key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.dsir import (
    _MICRO,
    hashed_ngram_counts,
)

#: model row carrying the class-prior log-odds (a bucket id outside
#: the feature range, so one broadcastable frame holds the whole model
#: — storable as a tiny lake artifact like the PQ codebooks)
PRIOR_BUCKET = -1


def nb_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    seed: int = 7,
    features: DataFrame | None = None,
) -> DataFrame:
    """Train the NB quality model: ``(bucket, w_micro)`` where
    ``w_micro = round((ln p(b|pos) - ln p(b|neg)) * 1e6)`` with
    add-``alpha`` smoothing over ``n_buckets`` buckets, plus the
    ``PRIOR_BUCKET`` row holding ``round(ln(n_pos/n_neg) * 1e6)``
    (document-count prior; add-1 smoothed so a single-class corpus
    still trains).  ``label_col`` must be 1 (positive / keep-worthy)
    or 0 — the scored log-odds are positive-class-is-larger.

    The complete ``spark.range`` bucket spine keeps unseen buckets in
    the model: absence of evidence IS evidence under smoothing.

    ``features`` (optional, r11): a precomputed
    ``hashed_ngram_counts(df.withColumn('_y', label), carry_cols=
    ('_y',))`` frame.  A pipeline that trains AND scores the same
    corpus featurizes it once and passes the frame to both (the
    scorer takes the same frame minus ``_y``) — the corpus explode is
    the dominant cost of both stages and is identical in each."""
    # the label rides through the featurizer's explode/grouping (it is
    # functionally dependent on the doc id) — no id-keyed join back to
    # the corpus — and BOTH class count columns come out of ONE
    # conditional aggregation: a pivot/filter-per-class formulation
    # re-executed the explode subtree once per branch (measured 17.6 s
    # at 50K docs for what is one scan's worth of work)
    labeled = (
        features
        if features is not None
        else hashed_ngram_counts(
            df.withColumn("_y", F.col(label_col).cast("int")),
            text_col,
            id_col,
            n_buckets,
            seed,
            carry_cols=("_y",),
        )
    )
    per_b = labeled.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("_y") == 1, F.col("cnt")).otherwise(0)
        ).alias("c_p"),
        F.sum(
            F.when(F.col("_y") == 0, F.col("cnt")).otherwise(0)
        ).alias("c_n"),
    )
    # totals re-aggregate the ≤B-row per-bucket table, not the corpus
    totals = per_b.agg(
        F.coalesce(F.sum("c_p"), F.lit(0)).alias("n_p"),
        F.coalesce(F.sum("c_n"), F.lit(0)).alias("n_n"),
    )
    n_docs = df.groupBy().agg(
        F.coalesce(
            F.sum(F.col(label_col).cast("long")), F.lit(0)
        ).alias("d_p"),
        F.coalesce(
            F.sum(F.lit(1) - F.col(label_col).cast("long")), F.lit(0)
        ).alias("d_n"),
    )
    spark = df.sparkSession
    spine = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    a, b = float(alpha), float(n_buckets)
    lp = F.ln(
        (F.coalesce("c_p", F.lit(0)) + a) / (F.col("n_p") + a * b)
    )
    ln_ = F.ln(
        (F.coalesce("c_n", F.lit(0)) + a) / (F.col("n_n") + a * b)
    )
    weights = (
        spine.join(per_b, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round((lp - ln_) * _MICRO).cast("long").alias("w_micro"),
        )
    )
    prior = n_docs.select(
        F.lit(PRIOR_BUCKET).cast("int").alias("bucket"),
        F.round(
            F.ln((F.col("d_p") + 1.0) / (F.col("d_n") + 1.0)) * _MICRO
        )
        .cast("long")
        .alias("w_micro"),
    )
    # the model is ≤ n_buckets+1 rows BY CONSTRUCTION (the bounded-
    # broadcast contract): pin it so every consumer (w + prior in
    # nb_score, multiple scoring calls) reads the materialized rows
    # instead of re-running the training aggregation
    return weights.unionByName(prior).localCheckpoint(eager=False)


def nb_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    seed: int = 7,
    features: DataFrame | None = None,
) -> DataFrame:
    """Score documents under a :func:`nb_train` model:
    ``(id, score_micro, log_odds, predicted)`` with
    ``score_micro = prior + Σ_b cnt_b · w_micro(b)`` (an integer sum),
    ``log_odds`` its 6-dp nat form, and ``predicted`` the 0/1 decision
    (``score_micro > 0``; ints, not booleans — the gate's value hash
    has only ever seen int/str/float/timestamp columns).

    ``n_buckets``/``seed`` must match training — the model's feature
    space is positional.  ``features`` (optional, r11): a precomputed
    ``hashed_ngram_counts`` frame for exactly ``df``'s rows, so a
    train-and-score pipeline featurizes the corpus once (see
    :func:`nb_train`)."""
    feats = (
        features
        if features is not None
        else hashed_ngram_counts(df, text_col, id_col, n_buckets, seed)
    )
    w = model.filter(F.col("bucket") != PRIOR_BUCKET)
    prior = model.filter(F.col("bucket") == PRIOR_BUCKET).select(
        F.col("w_micro").alias("_prior")
    )
    scored = (
        feats.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("w_micro")).alias("_evidence"))
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            (F.col("_evidence") + F.col("_prior")).alias("score_micro"),
        )
    )
    return scored.select(
        id_col,
        "score_micro",
        F.round(F.col("score_micro") / _MICRO, 6).alias("log_odds"),
        (F.col("score_micro") > 0).cast("int").alias("predicted"),
    )


def quality_filter(
    df: DataFrame,
    model: DataFrame,
    threshold_nats: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Keep documents the model scores above ``threshold_nats``
    log-odds — the deployment composition (score + semi-join back to
    the full rows; the corpus pays one scan for features and an
    id-keyed join, the model rides along broadcast)."""
    keep = nb_score(df, model, text_col, id_col, n_buckets, seed).filter(
        F.col("score_micro") > F.lit(int(threshold_nats * _MICRO))
    )
    return df.join(keep.select(id_col), id_col, "left_semi")
