"""Deterministic content-hash sampling and split assignment
(extension surface — training-data pipelines need REPRODUCIBLE
sampling: rerunning the pipeline, on any engine, must pick the same
rows, which rules out RNG-based ``sample()``/``sampleBy()``).

The sampling key is the first md5 nibble of the row's id — uniform
over 16 buckets, stable across engines (same ascii-arithmetic family
as operators.simhash, mirrored by the DuckDB oracle), and independent
of row order/partitioning.  Filtering happens BEFORE any shuffle, so
a 1/16 sample reads the full scan but pays 1/16 of everything
downstream — at 100 TB the sample predicate belongs as close to the
scan as possible, and a deterministic function of an id column is
exactly what the optimizer can push."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _id_nibble(id_col: str) -> Column:
    """First hex nibble (0..15) of md5(id) — the sampling key.

    Decoded with ``conv`` (ANSI-safe for <= 8 hex chars): one
    expression instead of substring+ascii+CASE chains, which the
    codegen does not common-subexpression-eliminate (the old two-nib
    byte decode duplicated the md5 in the filter tree — measured ~3x
    slower).  The VALUE is unchanged, so the DuckDB oracles keep their
    ascii-arithmetic mirror."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1), 16, 10
    ).cast("int")


def deterministic_sample(
    df: DataFrame, id_col: str, sixteenths: int = 2
) -> DataFrame:
    """Keep rows whose id-nibble < ``sixteenths`` — a stable
    ``sixteenths``/16 sample (2 -> 12.5%)."""
    return df.filter(_id_nibble(id_col) < sixteenths)


def with_split(
    df: DataFrame,
    id_col: str,
    train_upto: int = 13,
    valid_upto: int = 15,
) -> DataFrame:
    """Assign each row a reproducible train/valid/test split from its
    id-nibble: [0, train_upto) -> train, [train_upto, valid_upto) ->
    valid, rest -> test (defaults 13/2/1 sixteenths ~ 81/12/6%)."""
    nib = _id_nibble(id_col)
    return df.withColumn(
        "split",
        F.when(nib < train_upto, F.lit("train"))
        .when(nib < valid_upto, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def _key_byte(key: Column) -> Column:
    """First md5 byte (0..255) of an arbitrary key expression — the
    256-level uniform draw for weighted sampling (same conv decode
    rationale as :func:`_id_nibble`; value identical to the two-nibble
    arithmetic the oracles mirror)."""
    return F.conv(F.substring(F.md5(key), 1, 2), 16, 10).cast("int")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    max_weight: float,
) -> DataFrame:
    """Deterministic weight-proportional sampling: keep each row with
    probability ``weight / max_weight``, decided by comparing the
    row's md5 byte (uniform over 0..255) against the scaled weight —
    RNG-free, so reruns and other engines draw the SAME rows, and
    rows with twice the weight are twice as likely to survive (the
    standard importance-sampling primitive for mixing training-data
    sources at different rates).

    Probabilities quantize to 1/256 (``floor(256*p)`` levels); the
    comparison is a scan-pushable per-row predicate — zero shuffle,
    same discipline as :func:`deterministic_sample`."""
    p = F.floor(256 * F.col(weight_col) / F.lit(max_weight))
    return df.filter(_key_byte(F.col(id_col).cast("string")) < p)


def mixture_rates(
    df: DataFrame, group_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-group keep rates realizing a TEMPERATURE-smoothed training
    mixture by pure downsampling: target share per group is
    ``n_g^alpha / sum(n^alpha)`` (alpha=1 keeps the natural mix,
    alpha->0 flattens toward uniform — the multilingual-corpus
    smoothing from the XLM-R / mT5 lineage), realized with keep rate
    ``rate_g = n_g^(alpha-1) / max_h(n_h^(alpha-1))`` so the most
    up-weighted (smallest) group is kept whole and no group ever needs
    up-sampling.  Returns ``(group, n, rate)``.

    Two tiny aggregations — a partial->final count per group and a
    1-row global max — then everything joins back broadcast; the
    corpus itself is never shuffled.  The rate is rounded to 6 dp so
    the later ``floor(256 * rate)`` quantization can't straddle a
    libm-ulp difference across engines."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("n"))
    w = F.pow(F.col("n").cast("double"), F.lit(alpha - 1.0))
    weighted = counts.select(group_col, "n", w.alias("_w"))
    mx = weighted.agg(F.max("_w").alias("_mx"))
    return weighted.crossJoin(F.broadcast(mx)).select(
        group_col,
        "n",
        F.round(F.col("_w") / F.col("_mx"), 6).alias("rate"),
    )


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Deterministic temperature resampling of a multi-source corpus:
    keep each row with its group's :func:`mixture_rates` probability,
    decided by the row's group-salted md5 byte — RNG-free (reruns and
    other engines keep the SAME rows), per-group independent (the
    stratum-salted key of :func:`stratified_sample`), and the rate
    table is group-cardinality-small so Catalyst broadcasts it: the
    corpus pays one scan, zero shuffles.

    This is the standard "don't let the biggest source drown the
    mixture" curation step (alpha ~ 0.3-0.7 in practice); rates
    quantize to 1/256 like :func:`weighted_sample`."""
    rates = mixture_rates(df, group_col, alpha).select(group_col, "rate")
    key = F.concat(
        F.col(group_col).cast("string"),
        F.lit("|"),
        F.col(id_col).cast("string"),
    )
    return df.join(F.broadcast(rates), group_col).filter(
        _key_byte(key) < F.floor(256 * F.col("rate"))
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    sixteenths: int = 2,
) -> DataFrame:
    """Per-stratum deterministic sample: the hash key is SALTED with
    the stratum value (md5 of ``group|id``), so each group's selection
    is an independent ``sixteenths``/16 draw — a group's members don't
    share the global sample's nibble bias, and adding a new stratum
    never changes which rows of existing strata are picked.  Same
    scan-pushable, RNG-free discipline as :func:`deterministic_
    sample`."""
    key = F.concat(
        F.col(group_col).cast("string"),
        F.lit("|"),
        F.col(id_col).cast("string"),
    )
    nib = F.conv(F.substring(F.md5(key), 1, 1), 16, 10).cast("int")
    return df.filter(nib < sixteenths)


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """EXACTLY min(k, |group|) rows per group, chosen by md5 rank —
    the deterministic replacement for per-group reservoir sampling
    (fractional :func:`stratified_sample` can't promise a count;
    training mixtures often need "at most k docs per source").

    The rank key is md5 of the stratum-salted id — the same
    independent-per-group draw as :func:`stratified_sample` — and the
    cut reuses ``grouped_topk``'s bounded-heap plan: Catalyst's
    ``InferWindowGroupLimit`` pre-prunes each map task to its local
    per-group top-k BEFORE the exchange, so the shuffle carries at
    most k rows per (group, input partition) — never the group.

    Deterministic and engine-stable: rerunning, repartitioning, or
    mirroring in another engine selects the SAME rows (md5 ties are
    impossible for distinct salted ids only if ids are unique per
    group — the contract; the id tie-break below keeps even violations
    deterministic)."""
    from kafka_sparkstreaming_sbt_spark.operators.topk import grouped_topk

    key = F.md5(
        F.concat(
            F.col(group_col).cast("string"),
            F.lit("|"),
            F.col(id_col).cast("string"),
        )
    )
    ranked = grouped_topk(
        df.withColumn("_draw", key),
        [group_col],
        [("_draw", "asc"), (id_col, "asc")],
        k,
        rank_col="draw_rank",
    )
    return ranked.drop("_draw")


def group_quantile_filter(
    df: DataFrame,
    group_col: str,
    score_col: str,
    keep_frac: float,
) -> DataFrame:
    """Keep the TOP ``keep_frac`` of every group by ``score_col`` —
    the per-language / per-source relative quality cut every curation
    pipeline applies ("top 60% by quality score WITHIN each
    language"), where an absolute threshold would gut low-resource
    groups whose score distributions sit lower.

    Rows at exactly the per-group threshold are kept (>=), so the
    kept fraction can exceed ``keep_frac`` under score ties — the
    deterministic choice (a strict cut would make membership depend
    on which tied row the engine sees first).  NULL scores are
    ignored by the percentile AND never kept (NULL >= t is NULL):
    unscored rows don't distort the threshold and don't ride along —
    score them or route them separately before this cut.  A NULL
    GROUP key is a real group (null-safe join back, matching
    ``groupBy``'s null handling): rows with an undetected language
    get their own within-group cut instead of silently vanishing.

    Scale design: the threshold is the per-group EXACT interpolated
    percentile — a partial-aggregatable ``percentile`` over (group,
    score), so the corpus shuffles nothing and only tiny (group,
    threshold) rows move; the filter is then an equi-join back whose
    strategy is LEFT TO AQE — the threshold table has one row per
    group, a data-dependent cardinality, so a forced broadcast hint
    would bet the driver's memory on ``group_col`` staying
    low-cardinality (languages: fine; URLs: OOM).  AQE sees the
    actual post-agg size at runtime and broadcasts exactly when it
    is safe.  Deliberately NOT a ``percent_rank`` window: that would
    globally sort every group's rows just to throw most of them away.
    Exact (not approx_percentile) because the threshold is part of the
    correctness contract and `F.percentile` matches DuckDB's
    ``quantile_cont`` bit-for-bit; swap to ``percentile_approx`` only
    when groups are so large the exact partial state matters."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    thresholds = df.groupBy(group_col).agg(
        F.percentile(F.col(score_col).cast("double"), 1.0 - keep_frac)
        .alias("_thresh")
    ).withColumnRenamed(group_col, "_grp")
    return (
        df.join(
            thresholds,
            F.col(group_col).eqNullSafe(F.col("_grp")),
        )
        .filter(F.col(score_col).cast("double") >= F.col("_thresh"))
        .drop("_grp", "_thresh")
    )


def leakage_safe_split(
    documents: DataFrame,
    groups: DataFrame,
    id_col: str = "doc_id",
    train_upto: int = 13,
    valid_upto: int = 15,
) -> DataFrame:
    """Train/valid/test assignment WITHOUT near-duplicate leakage:
    the split nibble is drawn from the md5 of the GROUP representative
    (``near_dup_groups`` label), not the document's own id, so every
    member of a near-dup component lands in the SAME split — the
    per-doc draw silently puts one copy of a duplicated page in train
    and another in test, and the eval set is contaminated before any
    decontamination pass runs.

    Singletons are their own representative, so their assignment is
    identical to :func:`with_split`; only grouped docs move (to their
    representative's split).  Cost on top of the labels: one
    co-partitioned join on the id key — the draw itself is a
    zero-shuffle projection.
    """
    labeled = documents.join(groups, id_col)
    return with_split(
        labeled, "group_id", train_upto=train_upto, valid_upto=valid_upto
    )


def select_to_token_budget(
    df: DataFrame,
    budget: int,
    weight_col: str,
    order_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Greedy budget fill: take rows in (``order_col`` DESC,
    ``id_col`` ASC) order until their cumulative ``weight_col``
    reaches ``budget`` — "fill a 100 B-token training budget from the
    highest-quality documents down", the selection step every
    fixed-compute training run ends with.  A row is kept iff the
    cumulative weight STRICTLY BEFORE it is < ``budget`` (so the
    straddling row is included and the selection is never empty while
    budget > 0 and rows exist).

    Scale design — the textbook ``SUM() OVER (ORDER BY ...)`` is a
    single-partition global window (one task sees every row); this
    implementation never builds one:

    1. one aggregate for (min, max) of ``order_col`` (2 scalars);
    2. rows map to ``n_buckets`` contiguous RANGE buckets of the
       order key (bucket is a pure function of ``order_col``, so the
       bucket order refines the total order and ties never split);
    3. one partial->final agg gives per-bucket (sum, count) —
       ``n_buckets`` rows collected, prefix offsets computed on the
       driver (bounded by construction);
    4. buckets whose offset already exceeds the budget are filtered
       BEFORE any window (at 100 TB that is most of the corpus —
       pruned map-side);
    5. the surviving buckets run the windowed cumsum PARTITIONED BY
       bucket (offset + within-bucket running sum == the global
       running sum) — every window task is bounded by one bucket's
       width, never the corpus, and the survivor set is itself
       budget-bounded.

    Output: the selected rows with ``run_before`` (cumulative weight
    before the row under the global order) — callers can re-derive
    the exact fill level as ``max(run_before + weight)``.

    Determinism: output depends only on the total order and weights,
    never on the bucketing — any engine replays it with a plain
    global window (the oracle form).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from pyspark.sql import Window

    mm = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).collect()[0]
    if mm.lo is None:
        return df.select(
            F.col(id_col),
            F.col(order_col),
            F.col(weight_col),
            F.lit(0).cast("long").alias("run_before"),
        ).limit(0)
    lo, hi = float(mm.lo), float(mm.hi)
    width = (hi - lo) / n_buckets if hi > lo else 1.0
    # descending order: bucket 0 holds the LARGEST order keys.
    bucket = F.least(
        F.floor((F.lit(hi) - F.col(order_col).cast("double")) / width),
        F.lit(n_buckets - 1),
    ).cast("int")
    with_b = df.select(
        F.col(id_col), F.col(order_col), F.col(weight_col),
        bucket.alias("_bucket"),
    )
    stats = (
        with_b.groupBy("_bucket")
        .agg(
            F.sum(F.col(weight_col).cast("long")).alias("w"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    offset: dict[int, int] = {}
    acc = 0
    for row in sorted(stats, key=lambda r: r._bucket):
        offset[row._bucket] = acc
        acc += row.w
    # buckets whose prefix offset is already past the budget can
    # never contribute a selected row — pruned before the window.
    alive = [b for b, off in offset.items() if off < budget]
    if not alive:
        return with_b.select(
            id_col, order_col, weight_col,
            F.lit(0).cast("long").alias("run_before"),
        ).limit(0)
    cand = with_b.filter(F.col("_bucket").isin(alive))
    off_expr = F.create_map(
        *[x for b in offset for x in (F.lit(b), F.lit(offset[b]))]
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy(F.col(order_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = off_expr[F.col("_bucket")] + F.sum(
        F.col(weight_col).cast("long")
    ).over(w)
    out = cand.select(
        id_col, order_col, weight_col,
        (run - F.col(weight_col).cast("long")).alias("run_before"),
    )
    return out.filter(F.col("run_before") < budget)


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_stages: int = 4,
    id_col: str = "doc_id",
    seed: int = 7,
    exact: bool = True,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Curriculum staging: assign every row to one of ``n_stages``
    difficulty stages by exact score quantile (stage 0 = lowest
    scores, fed first in easy-first curricula), with a deterministic
    md5 shuffle key WITHIN each stage — the "order the corpus by
    difficulty, shuffle within difficulty" prep step of curriculum
    training (Bengio et al. 2009).  Consumers sort by (stage, draw)
    to stream the corpus in curriculum order.

    Output: ``(id, score, stage, draw)``; ``draw`` is the md5 hex of
    ``seed:stage:id`` — uniform, engine-portable, and independent of
    input partitioning (same determinism contract as
    :func:`deterministic_sample`).

    Scale: one percentile aggregate collects ``n_stages - 1``
    threshold scalars; stage assignment and the draw are then
    zero-shuffle codegen'd maps.  No global sort happens here — the
    (stage, draw) key IS the curriculum order, and writers
    range-partition on it only when materializing (the sort is the
    consumer's one unavoidable exchange, not this operator's).

    **Memory hazard of the exact tier**: exact ``F.percentile``
    (which matches DuckDB ``quantile_cont`` bit-for-bit on
    6-dp-rounded inputs — the oracle gate stays on it) buffers every
    DISTINCT score value in the aggregation state.  At 100 TB a
    double-valued score column has ~billions of distinct values —
    unlike every other full-corpus aggregate here (sums/counts),
    that state does not stay scalar.  Pass ``exact=False`` at corpus
    scale to route to ``approx_percentile`` (bounded GK-sketch
    state, ``approx_accuracy`` controls the rank error at
    ~1/accuracy) — stage boundaries shift by at most the sketch's
    rank error; within-stage determinism (the md5 draw) is
    unaffected.  The same exact/approx split as ``profile``'s
    ``exact=False`` HLL tier; tolerance pinned in
    tests/test_sampling.py.
    """
    if n_stages < 2:
        raise ValueError(f"n_stages must be >= 2, got {n_stages}")
    fracs = [i / n_stages for i in range(1, n_stages)]
    frac_arr = F.array(*[F.lit(f) for f in fracs])
    pct = (
        F.percentile(F.col(score_col), frac_arr)
        if exact
        else F.percentile_approx(
            F.col(score_col), frac_arr, F.lit(approx_accuracy)
        )
    )
    row = df.agg(pct.alias("t")).collect()[0]
    if row.t is None:
        return df.select(
            F.col(id_col),
            F.col(score_col),
            F.lit(0).cast("int").alias("stage"),
            F.lit(None).cast("string").alias("draw"),
        ).limit(0)
    # 6-dp rounding keeps the comparison identical cross-engine
    thresholds = [round(float(v), 6) for v in row.t]
    stage = F.lit(0)
    for t in thresholds:
        stage = stage + F.when(
            F.round(F.col(score_col), 6) > F.lit(t), 1
        ).otherwise(0)
    return df.select(
        F.col(id_col),
        F.col(score_col),
        stage.cast("int").alias("stage"),
    ).withColumn(
        "draw",
        F.md5(
            F.concat_ws(
                ":",
                F.lit(seed),
                F.col("stage"),
                F.col(id_col).cast("string"),
            )
        ),
    )
