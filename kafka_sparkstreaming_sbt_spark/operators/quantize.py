"""Compressed-domain vector search: int8 scalar quantization and
product quantization (extension surface, SURVEY §2.12 — the reference
has no vector ops; this is the storage/memory leg of the embedding
pipeline that :mod:`similarity` leaves in float32).

Why this exists at 100 TB: a 64-dim float32 embedding is 256 bytes;
the same vector is 64 bytes as int8 codes and **8 bytes** as an
M=8/K=256 product-quantization code — a 4× / 32× reduction in scan
bytes, shuffle bytes, and executor cache footprint.  At 100 TB of raw
embeddings that is the difference between "the candidate scan is
I/O-bound on the lake" and "the whole coded corpus fits in the
cluster's page cache".  Quantized search is how production ANN
(faiss IVF-PQ, ScaNN) actually runs at this scale — the float tiers
in :mod:`similarity` are the re-rank stage, not the scan stage.

Exactness contract (what makes these oracle-gatable when nothing
else about ANN is): after the one float step — unit-normalize, pick
a single global grid scale, ``floor(x*qmax/scale + 0.5)`` — every
downstream comparison is **integer arithmetic**: int dot products,
int squared L2, int ADC lookup sums.  Integer sums are
associative, so no engine/summation-order caveat applies anywhere in
the ranking path; ties break on explicit id/code order.  The SQL
tier and the BLAS tier agree bit-for-bit (not "modulo float ties"
like the float ANN tiers), and the DuckDB oracles replay the whole
pipeline including the encode step.

Tiers mirror the house pattern: ``method="sql"`` keeps the ranking
arithmetic in codegen'd array expressions (the oracle twin);
``method="numpy"`` runs the same integer math as BLAS/bulk-indexed
NumPy inside Arrow ``mapInPandas`` for large Q — bit-identical
output, unlike the float tiers, because integers don't reorder.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_sparkstreaming_sbt_spark.operators.similarity import (
    with_unit_vectors,
)


def _qmax(bits: int) -> int:
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    return (1 << (bits - 1)) - 1


def quantization_scale(
    corpus: DataFrame, vec_col: str = "embedding", method: str = "numpy"
) -> DataFrame:
    """The global symmetric grid scale: max |component| over the
    corpus's UNIT vectors (≤ 1 by construction, usually ≪ 1 for
    high-dim data — using the realized max tightens the grid vs the
    naive ``scale=1``).  One scalar aggregate — callers cross-join the
    single row back (the broadcast-scalar pattern used throughout).

    ``method="sql"`` is the oracle twin: per-row
    ``array_max(transform(abs))`` then a plain ``max`` —
    partial-aggregatable, one scan, shuffle carries one double per
    task.  ``method="numpy"`` (the default) computes the same values
    inside Arrow batches — norm in the same sequential per-dimension
    order as :func:`_quantize_numpy`, divide/abs/max all exact IEEE —
    so the result is BIT-identical while skipping the interpreted
    higher-order folds (measured 1.26 s → 0.4 s per call at 64 dims;
    the scale feeds up to 6 consumers per PQ pipeline)."""
    if method == "numpy":
        schema = T.StructType([T.StructField("q_scale", T.DoubleType())])

        def partial(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            best = -np.inf
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                acc = np.zeros(len(v), dtype=np.float64)
                for d in range(v.shape[1]):  # sequential, like the fold
                    acc = acc + v[:, d] * v[:, d]
                nrm = np.sqrt(acc)
                ok = nrm > 0
                if ok.any():
                    with np.errstate(invalid="ignore", divide="ignore"):
                        unit = np.abs(v[ok] / nrm[ok, None])
                    best = max(best, float(unit.max()))
            if np.isfinite(best):
                yield pd.DataFrame({"q_scale": [best]})

        from kafka_sparkstreaming_sbt_spark.plans import (
            parallelize_for_compute,
        )

        partials = (
            parallelize_for_compute(corpus)
            .select(vec_col)
            .mapInPandas(partial, schema)
        )
        return partials.agg(F.max("q_scale").alias("q_scale"))
    unit = with_unit_vectors(corpus, vec_col)
    return unit.filter(F.col("unit").isNotNull()).agg(
        F.max(F.array_max(F.transform(F.col("unit"), F.abs))).alias(
            "q_scale"
        )
    )


def _scale_value(scale: DataFrame | float) -> float:
    """The grid scale as a plain double.  ``quantization_scale``
    returns a 1-ROW aggregate; collecting it driver-side is the same
    fits-in-memory contract its broadcast-join form imposes, and it
    stops every downstream consumer (codebook build, encode, lut,
    both join sides) re-executing the scan+agg subquery — the scale
    plan is referenced up to 6× per PQ pipeline."""
    if isinstance(scale, DataFrame):
        row = scale.first()
        if row is None or row["q_scale"] is None:
            raise ValueError("quantization scale is empty (no vectors)")
        return float(row["q_scale"])
    return float(scale)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    scale: DataFrame | float | None = None,
    method: str = "sql",
) -> DataFrame:
    """Symmetric scalar quantization of unit vectors onto a
    ``[-qmax, qmax]`` integer grid (qmax = 2^(bits-1) - 1; 127 for
    int8).  Returns ``(id, codes: array<int>, int_norm: bigint)``.

    ``scale`` is the 1-row frame from :func:`quantization_scale` —
    pass the CORPUS's scale when encoding queries so both sides share
    one grid and integer dot products rank like cosine (codes whose
    components exceed the corpus grid clamp to ±qmax, same as the
    oracle).  Omitted, the scale is computed from ``df`` itself.

    ``floor(x*qmax/scale + 0.5)`` is round-half-up — engine-portable
    (Spark ``round`` is half-even, DuckDB's is half-away; ``floor``
    agrees everywhere).  Zero-norm vectors quantize to NULL codes
    (no direction to encode) — the search operators drop them, same
    as the float tiers' NaN handling.

    Per-row codegen over a broadcast scalar: no shuffle, no Python.
    ``int_norm = Σ code²`` rides along so consumers can reconstruct
    approximate cosine (``int_dot / sqrt(na*nb)``) without a second
    pass.

    ``method="numpy"`` (:func:`_quantize_numpy`) is BIT-identical:
    the norm accumulates dimension-by-dimension in the same sequential
    order as the SQL fold (vectorized ACROSS the batch, ordered WITHIN
    the row), and divide/floor/clip are correctly-rounded IEEE either
    way — so any tier can feed the oracle.  Higher-order array
    expressions are interpreted, which makes the SQL tier ~3× slower
    already at 64 dims."""
    qmax = _qmax(bits)
    if scale is None:
        scale = quantization_scale(df, vec_col)
    s = _scale_value(scale)
    if method == "numpy":
        return _quantize_numpy(df, vec_col, id_col, qmax, s)
    unit = with_unit_vectors(df, vec_col)

    def code(x):
        snapped = F.floor(x * F.lit(float(qmax)) / F.lit(s) + F.lit(0.5))
        return F.greatest(
            F.lit(-qmax), F.least(F.lit(qmax), snapped)
        ).cast("int")

    codes = F.transform(F.col("unit"), code)
    return unit.select(
        F.col(id_col),
        codes.alias("codes"),
        F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, c: acc + c.cast("long") * c.cast("long"),
        ).alias("int_norm"),
    )


def _quantize_rows_kernel(v: "np.ndarray", qmax: int, s: float):
    """The per-batch arithmetic of :func:`_quantize_numpy`, extracted
    (r12) so the driver-side ADC-lut fusion runs the SAME math on
    collected query vectors: sequential per-dim norm accumulation
    (bit-identical to the SQL fold), exact IEEE divide/floor/clip —
    all per-row ops, so batch boundaries cannot change any value.
    Returns (codes int64 (B, dim), ok bool (B,)); rows with
    ``not ok`` (zero norm) quantize to NULL in the DataFrame tiers."""
    acc = np.zeros(len(v), dtype=np.float64)
    for d in range(v.shape[1]):  # sequential, like the fold
        acc = acc + v[:, d] * v[:, d]
    nrm = np.sqrt(acc)
    ok = nrm > 0
    with np.errstate(invalid="ignore", divide="ignore"):
        unit = v / nrm[:, None]
    codes = np.clip(
        np.floor(unit * float(qmax) / s + 0.5), -qmax, qmax
    ).astype(np.int64)
    return codes, ok


def _quantize_numpy(
    df: DataFrame, vec_col: str, id_col: str, qmax: int, s: float
) -> DataFrame:
    """Arrow tier of :func:`quantize_embeddings`.  Exactness note:
    ``np.sum`` uses pairwise summation, which need NOT match the SQL
    fold's strict left-to-right order — so the norm accumulates in an
    explicit per-dimension loop (sequential within the row, vectorized
    across the batch), making every intermediate bit-identical to the
    SQL tier."""
    schema = T.StructType(
        [
            _id_field_of(df, id_col),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("int_norm", T.LongType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes, ok = _quantize_rows_kernel(v, qmax, s)
            inorm = (codes * codes).sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": [
                        c.astype(np.int32).tolist() if o else None
                        for c, o in zip(codes, ok)
                    ],
                    "int_norm": pd.array(
                        [int(n) if o else None for n, o in zip(inorm, ok)],
                        dtype="Int64",
                    ),
                }
            )

    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    return parallelize_for_compute(df).select(id_col, vec_col).mapInPandas(
        encode, schema
    )


def _int_dot(a: F.Column, b: F.Column) -> F.Column:
    """Exact integer dot product of two int-code arrays (long
    accumulator: |qmax|² × dim ≈ 10^6 at int8/64-dim, nowhere near
    overflow; associative, so no summation-order caveat)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _ranked(scored: DataFrame, k: int, score_col: str, asc: bool) -> DataFrame:
    """Per-query top-k with the exact total order (score, id) — the
    ``rank <= k`` filter over a partitioned row_number is rewritten by
    Catalyst into a MAP-SIDE partial WindowGroupLimit (same plan shape
    ``tests/test_plans.py`` pins for the float tiers), so the shuffle
    carries ≤ Q×k rows per map partition."""
    oc = F.col(score_col).asc() if asc else F.col(score_col).desc()
    w = Window.partitionBy("query_id").orderBy(oc, F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", score_col, "rank")
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "sql",
) -> DataFrame:
    """Brute-force top-k in the QUANTIZED domain: both sides encoded
    on the corpus grid, ranked by exact integer dot product (descending
    — on a shared symmetric grid of unit vectors, int_dot ∝ cosine up
    to quantization error; recall vs the float tier is the pytest
    gate).  Returns ``(query_id, neighbor_id, int_dot, rank)`` —
    self-matches excluded, ties on the smaller neighbor id.

    Scale shape is :func:`similarity.cosine_topk`'s: queries
    broadcast, corpus scanned once and never shuffled, map-side
    WindowGroupLimit prune — but each corpus row moves ``dim`` BYTES
    of codes instead of ``4×dim`` of floats, which is the whole point:
    the scan stage of a 100 TB ANN system runs on codes and float
    re-rank touches only the survivors.

    ``method="numpy"``: one int64 BLAS matmul per Arrow batch
    (:func:`_quantized_topk_numpy`) — BIT-IDENTICAL to the SQL tier
    (integer arithmetic has no summation-order tie caveat), so unlike
    the float tiers either tier can serve the oracle query."""
    scale = _scale_value(quantization_scale(corpus, vec_col))
    # both sides encoded on the Arrow tier — bit-identical to SQL
    cq = (
        quantize_embeddings(
            corpus, vec_col, id_col, bits, scale, method="numpy"
        )
        .filter(F.col("codes").isNotNull())
        .select(
            F.col(id_col).alias("neighbor_id"), F.col("codes").alias("c_codes")
        )
    )
    qq = (
        quantize_embeddings(
            queries, vec_col, id_col, bits, scale, method="numpy"
        )
        .filter(F.col("codes").isNotNull())
        .select(
            F.col(id_col).alias("query_id"), F.col("codes").alias("q_codes")
        )
    )
    if method == "numpy":
        return _quantized_topk_numpy(cq, qq, k)
    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    pairs = parallelize_for_compute(cq).join(
        F.broadcast(qq), F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        _int_dot(F.col("q_codes"), F.col("c_codes")).alias("int_dot"),
    )
    return _ranked(scored, k, "int_dot", asc=False)


def _quantized_topk_numpy(cq: DataFrame, qq: DataFrame, k: int) -> DataFrame:
    """BLAS tier of :func:`quantized_topk`: query codes collected
    driver-side (Q×dim ints — the broadcast fits-in-memory contract),
    one int64 matmul per corpus batch, per-batch local top-k with
    id-ascending stable tie-break, shared rank merge.  Integer math —
    bit-identical to the SQL tier."""
    qrows = sorted(qq.collect(), key=lambda r: r["query_id"])
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    qmat = (
        np.array([list(r["q_codes"]) for r in qrows], dtype=np.int64)
        if qrows
        else np.zeros((0, 0), dtype=np.int64)
    )
    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("int_dot", T.LongType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf) or not len(qids):
                continue
            pdf = pdf.sort_values("neighbor_id", kind="mergesort")
            nid = pdf["neighbor_id"].to_numpy()
            v = np.stack(pdf["c_codes"].to_numpy()).astype(np.int64)
            # integer matmul never hits BLAS; every partial sum is an
            # integer bounded by dim·max|v|·max|q|, so route through
            # sgemm/dgemm when that bound is exactly representable
            # (2^24 / 2^53) — bit-identical, ~4× faster (same
            # discipline as _pq_encode_numpy)
            m_v = int(np.abs(v).max()) if v.size else 0
            m_q = int(np.abs(qmat).max()) if qmat.size else 0
            bound = v.shape[1] * max(m_v, 1) * max(m_q, 1)
            if bound < (1 << 24):
                dot = (
                    v.astype(np.float32) @ qmat.T.astype(np.float32)
                ).astype(np.int64)
            elif bound < (1 << 53):
                dot = (
                    v.astype(np.float64) @ qmat.T.astype(np.float64)
                ).astype(np.int64)
            else:
                dot = v @ qmat.T  # (B, Q) exact int64
            mask = nid[:, None] == qids[None, :]
            kk = min(k, dot.shape[0])
            # floats only to host -inf sentinels; values stay integral
            dotf = np.where(mask, -np.inf, dot.astype(np.float64))
            order = np.argsort(-dotf, axis=0, kind="stable")[:kk]
            flat_q = np.tile(qids, kk)
            flat_n = nid[order].reshape(-1)
            flat_d = np.take_along_axis(dotf, order, axis=0).reshape(-1)
            keep = flat_d > -np.inf
            yield pd.DataFrame(
                {
                    "query_id": flat_q[keep],
                    "neighbor_id": flat_n[keep],
                    "int_dot": flat_d[keep].astype(np.int64),
                }
            )

    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    scored = parallelize_for_compute(cq).mapInPandas(score, schema)
    return _ranked(scored, k, "int_dot", asc=False)


# --------------------------------------------------------------------------
# Product quantization
# --------------------------------------------------------------------------


def _codebook_rows(codebooks: DataFrame):
    """The codebook table collected driver-side — M×K rows, the same
    fits-in-memory contract its broadcast join imposes.  Memoized on
    the DataFrame OBJECT (r12): one codebook build feeds geometry,
    the encode broadcast and the ADC lut, each of which used to
    re-collect as its own serial Spark job; the cache dies with the
    DataFrame instance (fresh per query invocation — nothing persists
    across runs)."""
    cached = getattr(codebooks, "_kfs_codebook_rows", None)
    if cached is not None:
        return cached
    rows = codebooks.collect()
    try:
        codebooks._kfs_codebook_rows = rows
    except Exception:  # noqa: BLE001 — never let memoization break math
        pass
    return rows


def _codebook_geometry(codebooks: DataFrame) -> tuple[int, int]:
    """(n_subspaces, sub_dim) off the codebook table — read from the
    memoized driver-side rows (the old 1-row agg was a separate Spark
    job per caller over the same bounded table)."""
    rows = _codebook_rows(codebooks)
    if not rows:
        raise ValueError("codebooks is empty")
    m = max(r["subspace"] for r in rows) + 1
    d = max(len(r["c_codes"]) for r in rows)
    return int(m), int(d)


def _subspace_slices(
    codes_df: DataFrame, n_subspaces: int, sub_dim: int, id_col: str
) -> DataFrame:
    """(id, subspace, sub_codes) fan-out — posexplode over a
    ``sequence`` literal + ``slice``: per-row codegen, rows grow ×M,
    no shuffle.  Rejects vectors whose length isn't M×sub_dim at
    runtime (a short tail subvector would silently encode garbage)."""
    fanned = codes_df.select(
        F.col(id_col),
        F.col("codes"),
        F.explode(
            F.sequence(F.lit(0), F.lit(n_subspaces - 1))
        ).alias("subspace"),
    )
    sub = F.slice(F.col("codes"), F.col("subspace") * sub_dim + 1, sub_dim)
    guard = F.when(
        F.size("codes") == n_subspaces * sub_dim, sub
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"pq: vector dim must be n_subspaces*sub_dim = "
                    f"{n_subspaces * sub_dim}, got "
                ),
                F.size("codes").cast("string"),
            )
        )
    )
    return fanned.select(id_col, "subspace", guard.alias("sub_codes"))


def pq_codebooks(
    corpus: DataFrame,
    n_subspaces: int = 4,
    n_codes: int = 16,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "deterministic",
    seed: int = 42,
    n_iter: int = 5,
    sample_per_subspace: int = 20_000,
    scale: DataFrame | float | None = None,
) -> DataFrame:
    """Per-subspace codebooks on the INT grid:
    ``(subspace, code, c_codes: array<int>)`` with M = ``n_subspaces``
    rows × K = ``n_codes`` codes each.  Entries live on the same
    integer grid as :func:`quantize_embeddings` output, so encode and
    ADC search downstream are exact integer arithmetic regardless of
    how the codebook was trained.

    ``method="deterministic"``: entry c of every subspace is the
    sliced codes of the corpus row with md5-rank c (the
    :func:`similarity.deterministic_centroids` analog — the
    oracle-replicable tier; DuckDB replays the md5 order exactly).

    ``method="kmeans"``: per-subspace L2 Lloyd — the quality tier.
    All M subspaces train in ONE job: a deterministic md5-ranked
    sample (≤ ``sample_per_subspace`` rows, so executor memory is
    bounded corpus-size-independently) fans out to (subspace,
    sub_codes) rows, and ``applyInPandas`` per subspace runs seeded
    NumPy Lloyd with md5-order init; means round back onto the int
    grid (floor(x+0.5)), keeping the exactness contract.  Sampled
    Lloyd is the faiss training recipe — codebooks are a K-point
    summary, they don't need every row.  Not SQL-replicable, so its
    consumers gate on pytest recall, like ``kmeans_centroids``.
    """
    if method not in ("deterministic", "kmeans"):
        raise ValueError(f"unknown method {method!r}")
    codes = quantize_embeddings(
        corpus, vec_col, id_col, bits, scale, method="numpy"
    ).filter(
        F.col("codes").isNotNull()
    )
    # dim from the RAW vector column (a limit-1 scan job) — probing
    # codes instead would execute the whole quantize lineage
    # (scale agg + Arrow encode) just to measure an array length
    dim_row = corpus.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        raise ValueError("corpus has no encodable vectors")
    dim = int(dim_row["d"])
    if dim % n_subspaces:
        raise ValueError(
            f"dim {dim} not divisible by n_subspaces {n_subspaces}"
        )
    sub_dim = dim // n_subspaces
    # md5 rank over a SLIM (id, hash) projection; only the first
    # n_codes (deterministic) / sample_per_subspace (kmeans) ranks
    # are ever consumed, so cut to the top-k FIRST with
    # ``orderBy().limit()`` (TakeOrderedAndProject: per-partition
    # bounded heap, k-row merge) and rank only the survivors.  The
    # previous shape ran the row_number window UNPARTITIONED over
    # every corpus row — one sort task holding the whole corpus at
    # scale (r11; Spark itself warns "No Partition Defined for
    # Window").  The window below still has no partition key, but
    # its input is ≤ k rows BY CONSTRUCTION (the limit), which is
    # the same bounded single-task contract as the codebook collect
    # itself.  Rank values for the selected rows are identical under
    # the total order (_h, id).  Selected ids join back for their
    # codes (one id-keyed shuffle of K / sample_n rows).
    from kafka_sparkstreaming_sbt_spark.operators.topk import topk_cut

    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed)))
    top = topk_cut(
        codes.select(id_col, h.alias("_h")),
        [("_h", "asc"), (id_col, "asc")],
        n_codes if method == "deterministic" else sample_per_subspace,
    )
    ranked = top.withColumn(
        "_rk", F.row_number().over(Window.orderBy("_h", id_col))
    ).drop("_h")
    if method == "deterministic":
        picked = (
            ranked.filter(F.col("_rk") <= n_codes)
            .join(codes, id_col)
            .select((F.col("_rk") - 1).cast("int").alias("_code"), "codes")
        )
        # M x K rows consumed by geometry + collect + join —
        # checkpoint cuts the re-execution of the rank/join lineage
        return (
            _subspace_slices(picked, n_subspaces, sub_dim, "_code")
            .select(
                "subspace",
                F.col("_code").alias("code"),
                F.col("sub_codes").alias("c_codes"),
            )
            .localCheckpoint(eager=False)
        )
    sampled = ranked.filter(F.col("_rk") <= sample_per_subspace).join(
        codes, id_col
    )
    slices = _subspace_slices(
        sampled.select(F.col("_rk").alias("_rk"), "codes"),
        n_subspaces,
        sub_dim,
        "_rk",
    )
    out_schema = T.StructType(
        [
            T.StructField("subspace", T.IntegerType()),
            T.StructField("code", T.IntegerType()),
            T.StructField("c_codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def lloyd(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        sub = int(key[0])
        pdf = pdf.sort_values("_rk", kind="mergesort")
        x = np.stack(pdf["sub_codes"].to_numpy()).astype(np.float64)
        kk = min(n_codes, len(x))
        cent = x[:kk].copy()  # md5-order init — seeded, deterministic
        for _ in range(n_iter):
            d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)  # ties -> smaller code
            for c in range(kk):
                m = x[assign == c]
                if len(m):
                    cent[c] = m.mean(axis=0)
        cent = np.floor(cent + 0.5).astype(np.int64)  # back on the grid
        return pd.DataFrame(
            {
                "subspace": sub,
                "code": np.arange(kk, dtype=np.int32),
                "c_codes": [c.astype(np.int32).tolist() for c in cent],
            }
        )

    # same multi-consumer contract as the deterministic tier, and
    # here the lineage holds a full Lloyd train — never re-run it
    return (
        slices.groupBy("subspace")
        .applyInPandas(lloyd, out_schema)
        .localCheckpoint(eager=False)
    )


def _sub_sqdist(a: F.Column, b: F.Column) -> F.Column:
    """Exact integer squared L2 between two int-code subvectors."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("long") - y.cast("long"))
            * (x.cast("long") - y.cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: DataFrame | float | None = None,
    method: str = "sql",
) -> DataFrame:
    """Encode vectors to PQ codes: ``(id, pq_codes: array<int>)`` —
    per subspace, the codebook entry with minimum integer squared L2
    (ties → smaller code, via struct-min: exact, engine-portable).

    SQL plan: quantize (codegen) → ×M subspace fan-out (codegen, no
    shuffle) → broadcast join against the M×K codebook → struct-min
    per (id, subspace) (partial-aggregatable: the N×M×K scored rows
    combine map-side, only N×M survivor rows shuffle) → one
    reassembly agg per id.  At M=8/K=256 the storage result is 8
    bytes a vector — the 32× compression that makes a 100 TB corpus
    scannable from memory.

    ``method="numpy"`` (:func:`_pq_encode_numpy`) computes the same
    argmin per Arrow batch with one einsum against the collected
    M×K×sub_dim codebook — no fan-out, no shuffle at all, and BIT-
    identical output (integer distances, argmin ties at the smaller
    code in both tiers), so either tier can feed the oracle gate; the
    interpreted N×M×K ``zip_with`` aggregates make the SQL tier ~10×
    slower already at sf0.1."""
    n_sub, sub_dim = _codebook_geometry(codebooks)
    codes = quantize_embeddings(
        df, vec_col, id_col, bits, scale, method="numpy"
    ).filter(F.col("codes").isNotNull())
    if method == "numpy":
        return _pq_encode_numpy(codes, codebooks, n_sub, sub_dim, id_col)
    slices = _subspace_slices(codes, n_sub, sub_dim, id_col)
    scored = slices.join(F.broadcast(codebooks), "subspace").select(
        id_col,
        "subspace",
        F.struct(
            _sub_sqdist(F.col("sub_codes"), F.col("c_codes")).alias("d"),
            F.col("code"),
        ).alias("_sc"),
    )
    best = scored.groupBy(id_col, "subspace").agg(
        F.min("_sc")["code"].alias("code")
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("subspace", "code"))
    )
    return best.groupBy(id_col).agg(
        F.transform(ordered, lambda s: s.code).alias("pq_codes")
    )


def _collect_codebooks(
    codebooks: DataFrame, n_sub: int, sub_dim: int
) -> np.ndarray:
    """(M, K, sub_dim) int64 array off the codebook table — M×K rows,
    the same fits-in-memory contract its broadcast join imposes."""
    rows = _codebook_rows(codebooks)
    n_codes = max(r["code"] for r in rows) + 1
    books = np.zeros((n_sub, n_codes, sub_dim), dtype=np.int64)
    for r in rows:
        books[r["subspace"], r["code"]] = r["c_codes"]
    return books


def _pq_encode_numpy(
    codes: DataFrame,
    codebooks: DataFrame,
    n_sub: int,
    sub_dim: int,
    id_col: str,
) -> DataFrame:
    """BLAS tier of :func:`pq_encode`: per Arrow batch, reshape the
    int codes to (B, M, sub_dim) and score all K entries per subspace
    with a real GEMM; ``np.argmin`` returns the FIRST minimum — the
    smaller code, the same tie-break as the SQL struct-min — and the
    distances are exact, so the tiers are bit-identical.

    Exactness-under-float note: NumPy integer matmul/einsum never
    hits BLAS (naive C loops — measured the 1M-vector encode at 243 s
    in SCALECHECK before this), but every intermediate here is an
    integer bounded by ``sub_dim·(2·qmax)²``, and floats represent
    integers exactly up to 2^24 (f32) / 2^53 (f64) — so computing the
    SAME integer arithmetic through sgemm/dgemm is bit-exact, ~4×
    faster per batch, and the tier contract is untouched."""
    books = _collect_codebooks(codebooks, n_sub, sub_dim)
    bnorm = (books * books).sum(axis=2)  # (M, K)
    schema = T.StructType(
        [
            _id_field_of(codes, id_col),
            T.StructField("pq_codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            best = _pq_encode_kernel(v, books, bnorm, n_sub, sub_dim)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "pq_codes": [r.tolist() for r in best],
                }
            )

    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    return parallelize_for_compute(codes).select(id_col, "codes").mapInPandas(
        encode, schema
    )


def _pq_encode_kernel(
    v: "np.ndarray",
    books: "np.ndarray",
    bnorm: "np.ndarray",
    n_sub: int,
    sub_dim: int,
) -> "np.ndarray":
    """The per-batch argmin of :func:`_pq_encode_numpy`, extracted
    (r12) so the fused assign+encode corpus pass in :func:`ivf_pq_topk`
    runs the SAME arithmetic.  Per-row results are batch-independent:
    the float-width pick is per batch, but every candidate dtype
    represents the bounded integer distances exactly, so the argmin is
    identical whichever width a batch lands on.  ``v`` is the (B, dim)
    int64 scalar-code matrix; returns (B, M) int32 codebook codes."""
    if v.shape[1] != n_sub * sub_dim:
        raise ValueError(
            f"pq: vector dim must be n_subspaces*sub_dim = "
            f"{n_sub * sub_dim}, got {v.shape[1]}"
        )
    sub = v.reshape(len(v), n_sub, sub_dim)
    # every |x-c| component is bounded by the batch's realized
    # magnitudes — pick the cheapest float wide enough to keep
    # the integer arithmetic exact
    m_abs = max(int(np.abs(sub).max()), int(np.abs(books).max()))
    bound = sub_dim * (2 * m_abs) ** 2
    dt = (
        np.float32
        if bound < (1 << 24)
        else np.float64
        if bound < (1 << 53)
        else None
    )
    # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2
    if dt is None:  # int64 fallback: exact but no BLAS
        cross = np.einsum("bmd,mkd->bmk", sub, books)
        dist = (
            (sub * sub).sum(axis=2)[:, :, None]
            - 2 * cross
            + bnorm[None, :, :]
        )
    else:
        subf = sub.astype(dt)
        booksf = books.astype(dt)
        cross = np.empty((len(v), n_sub, books.shape[1]), dt)
        for m in range(n_sub):  # sgemm/dgemm per subspace
            np.matmul(subf[:, m, :], booksf[m].T, out=cross[:, m, :])
        dist = (
            (subf * subf).sum(axis=2)[:, :, None]
            - 2 * cross
            + bnorm[None, :, :].astype(dt)
        )
    return np.argmin(dist, axis=2).astype(np.int32)  # (B, M)


def _assign_encode_numpy(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    n_sub: int,
    sub_dim: int,
    bits: int,
    scale: DataFrame | float,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """One corpus pass emitting ``(id, cell_id, pq_codes)`` — the
    fusion of :func:`similarity._assign_numpy` (nearest-cell argmax)
    and :func:`pq_encode`'s numpy tier (quantize + per-subspace
    argmin), sharing their exact per-batch kernels.  Zero-norm rows
    get NULL ``pq_codes`` (they have no quantization), matching the
    standalone encode's NotNull filter."""
    from kafka_sparkstreaming_sbt_spark.operators.similarity import (
        _argmax_cell_kernel,
        _centroid_arrays,
    )

    ids_c, mat_c, cn_c = _centroid_arrays(centroids)
    books = _collect_codebooks(codebooks, n_sub, sub_dim)
    bnorm = (books * books).sum(axis=2)
    qmax = _qmax(bits)
    s = _scale_value(scale)
    schema = T.StructType(
        [
            _id_field_of(corpus, id_col),
            T.StructField("cell_id", T.LongType()),
            T.StructField("pq_codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cell = _argmax_cell_kernel(v, ids_c, mat_c, cn_c)
            codes, ok = _quantize_rows_kernel(v, qmax, s)
            pq = [None] * len(pdf)
            if ok.any():
                best = _pq_encode_kernel(
                    codes[ok], books, bnorm, n_sub, sub_dim
                )
                for slot, row in zip(np.nonzero(ok)[0], best):
                    pq[slot] = row.tolist()
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell_id": cell,
                    "pq_codes": pq,
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(run, schema)


def _id_field_of(df: DataFrame, id_col: str) -> T.StructField:
    for f in df.schema.fields:
        if f.name == id_col:
            return f
    raise ValueError(f"missing id column {id_col!r}")


def _adc_lut(
    queries: DataFrame,
    codebooks: DataFrame,
    n_sub: int,
    sub_dim: int,
    bits: int,
    vec_col: str,
    id_col: str,
    scale: DataFrame | float | None,
) -> DataFrame:
    """Per-query ADC lookup table ``(query_id, subspace, code, d)``:
    the query's int codes against every codebook entry — Q×M×K rows
    of exact integer squared L2 (asymmetric: the query is NOT snapped
    to a codebook entry, only to the scalar grid — the standard ADC
    accuracy win over symmetric search)."""
    qcodes = quantize_embeddings(
        queries, vec_col, id_col, bits, scale, method="numpy"
    ).filter(F.col("codes").isNotNull())
    qslices = _subspace_slices(qcodes, n_sub, sub_dim, id_col).select(
        F.col(id_col).alias("query_id"), "subspace", "sub_codes"
    )
    return qslices.join(F.broadcast(codebooks), "subspace").select(
        "query_id",
        "subspace",
        "code",
        _sub_sqdist(F.col("sub_codes"), F.col("c_codes")).alias("d"),
    )


def pq_topk(
    corpus_pq: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    corpus_scale: DataFrame | float,
    k: int = 10,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "sql",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ-encoded corpus rows:
    ``(query_id, neighbor_id, pq_dist, rank)``, distance ascending,
    ties → smaller neighbor id, self-matches excluded.

    ADC: build the Q×M×K integer lookup table once
    (:func:`_adc_lut`), then every corpus code row costs M table
    lookups and an integer sum — the corpus's raw vectors are never
    read.  ``pq_dist`` approximates ``Σ‖q_m − x_m‖²`` on the int
    grid; integer SUM is order-free, so the grouped aggregation needs
    no pivot/sequencing tricks and the DuckDB oracle replays it
    exactly.

    SQL tier plan: corpus codes fan out ×M (codegen), join the
    broadcast lut on (subspace, code), partial-agg SUM per
    (query, id) — the N×M×Q intermediate combines map-side, the
    shuffle carries N×Q grouped rows pruned to Q×k map-side by the
    rank stage.  ``method="numpy"`` skips the fan-out entirely: the
    lut becomes a Q×M×K int64 array driver-side and each Arrow batch
    scores B×Q via bulk fancy-indexing — the scan tier for large Q.
    Both tiers are bit-identical (integer math)."""
    n_sub, sub_dim = _codebook_geometry(codebooks)
    corpus_scale = _scale_value(corpus_scale)
    if method == "numpy":
        # the lut is consumed driver-side anyway (_collect_lut):
        # collect the bounded query table once and build the (Q,M,K)
        # array directly — one job instead of a quantize+broadcast-
        # join lineage, bit-identical integers (r12)
        lut_arrays = _adc_lut_arrays(
            queries.select(id_col, vec_col).collect(),
            codebooks, n_sub, sub_dim, bits, corpus_scale,
        )
        return _pq_topk_numpy(corpus_pq, lut_arrays, n_sub, k, id_col)
    lut = _adc_lut(
        queries, codebooks, n_sub, sub_dim, bits, vec_col, id_col,
        corpus_scale,
    )
    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    exploded = parallelize_for_compute(corpus_pq).select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("pq_codes").alias("subspace", "code"),
    )
    scored = (
        exploded.join(F.broadcast(lut), ["subspace", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").alias("pq_dist"))
    )
    return _ranked(scored, k, "pq_dist", asc=True)


def _adc_lut_arrays(
    query_rows,
    codebooks: DataFrame,
    n_sub: int,
    sub_dim: int,
    bits: int,
    scale: DataFrame | float,
):
    """Driver-side twin of :func:`_adc_lut` + :func:`_collect_lut`
    over COLLECTED ``(id, vec)`` query rows (r12 — VERDICT r11 #3:
    the query-side assign and the lut build were two separate Spark
    jobs whose lineages each re-scanned the query table; both inputs
    are bounded driver artifacts already, so build the (Q, M, K)
    int64 table directly).  Bit-identical by construction: the
    quantization runs :func:`_quantize_rows_kernel` (the same
    arithmetic the Arrow tier runs per batch) and the squared-L2
    entries are exact integer math either way.  Returns
    ``(sorted query-id vector, (Q, M, K) int64 table)`` or None when
    no query survives the zero-norm filter."""
    if not query_rows:
        return None
    ids = np.array([r[0] for r in query_rows], dtype=np.int64)
    v = np.array([r[1] for r in query_rows], dtype=np.float64)
    codes, ok = _quantize_rows_kernel(v, _qmax(bits), _scale_value(scale))
    ids, codes = ids[ok], codes[ok]
    if not len(ids):
        return None
    if codes.shape[1] != n_sub * sub_dim:
        raise ValueError(
            f"pq: vector dim must be n_subspaces*sub_dim = "
            f"{n_sub * sub_dim}, got {codes.shape[1]}"
        )
    order = np.argsort(ids, kind="stable")  # _collect_lut sorts qids
    ids, codes = ids[order], codes[order]
    sub = codes.reshape(len(ids), n_sub, sub_dim)
    brows = _codebook_rows(codebooks)
    if not brows:
        return None
    n_codes = max(r["code"] for r in brows) + 1
    table = np.zeros((len(ids), n_sub, n_codes), dtype=np.int64)
    for r in brows:
        c = np.asarray(r["c_codes"], dtype=np.int64)
        d = sub[:, r["subspace"], :] - c[None, :]
        table[:, r["subspace"], r["code"]] = (d * d).sum(axis=1)
    return ids, table


def _collect_lut(lut, n_sub: int):
    """ADC lut rows → (sorted query-id vector, (Q, M, K) int64 array);
    Q×M×K×8 bytes driver-side — the same fits-in-memory contract the
    lut's broadcast join imposes.  None when there are no queries.
    A tuple (already-built arrays from :func:`_adc_lut_arrays`)
    passes straight through."""
    if lut is None or isinstance(lut, tuple):
        return lut
    lrows = lut.collect()
    if not lrows:
        return None
    qids = sorted({r["query_id"] for r in lrows})
    qpos = {q: i for i, q in enumerate(qids)}
    n_codes = max(r["code"] for r in lrows) + 1
    table = np.zeros((len(qids), n_sub, n_codes), dtype=np.int64)
    for r in lrows:
        table[qpos[r["query_id"]], r["subspace"], r["code"]] = r["d"]
    return np.array(qids, dtype=np.int64), table


def _pq_score_candidates_numpy(
    cand_codes: DataFrame, lut: DataFrame, n_sub: int
) -> DataFrame:
    """ADC-score an EXPLICIT candidate-pair set — the IVF-restricted
    scan tier: ``cand_codes`` is (query_id, neighbor_id, pq_codes)
    after the cell-prune join, each Arrow batch scores its rows with
    one bulk fancy-index into the (Q, M, K) lut.  Integer math —
    bit-identical to the SQL explode+join+SUM, minus its N×M fan-out
    exchange and interpreted aggregates."""
    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("pq_dist", T.LongType()),
        ]
    )
    collected = _collect_lut(lut, n_sub)
    if collected is None:
        return cand_codes.sparkSession.createDataFrame([], schema)
    qarr, table = collected
    qpos = {int(q): i for i, q in enumerate(qarr)}

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m_idx = np.arange(n_sub)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["pq_codes"].to_numpy()).astype(np.int64)
            qi = pdf["query_id"].map(qpos).to_numpy(dtype=np.int64)
            d = table[qi[:, None], m_idx[None, :], codes].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "pq_dist": d,
                }
            )

    return cand_codes.select(
        "query_id", "neighbor_id", "pq_codes"
    ).mapInPandas(score, schema)


def _pq_topk_numpy(
    corpus_pq: DataFrame, lut: DataFrame, n_sub: int, k: int, id_col: str
) -> DataFrame:
    """BLAS/bulk-index tier of :func:`pq_topk`: the lut collects to a
    (Q, M, K) int64 array (Q×M×K×8 bytes — the same fits-in-memory
    contract its broadcast imposes), each corpus batch's (B, M) code
    matrix scores all queries at once via fancy indexing, local
    top-k per batch, shared rank merge.  Bit-identical to SQL."""
    collected = _collect_lut(lut, n_sub)
    if collected is None:
        return corpus_pq.sparkSession.createDataFrame(
            [],
            "query_id long, neighbor_id long, pq_dist long, rank int",
        )
    qarr, table = collected
    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("pq_dist", T.LongType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m_idx = np.arange(n_sub)
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(id_col, kind="mergesort")
            nid = pdf[id_col].to_numpy()
            codes = np.stack(pdf["pq_codes"].to_numpy()).astype(np.int64)
            # (Q, B): for each query, sum of lut[q, m, codes[b, m]]
            d = table[:, m_idx[None, :], codes].sum(axis=2)
            dist = d.T.astype(np.float64)  # (B, Q); float only for inf
            dist[nid[:, None] == qarr[None, :]] = np.inf
            kk = min(k, dist.shape[0])
            order = np.argsort(dist, axis=0, kind="stable")[:kk]
            flat_q = np.tile(qarr, kk)
            flat_n = nid[order].reshape(-1)
            flat_d = np.take_along_axis(dist, order, axis=0).reshape(-1)
            keep = flat_d < np.inf
            yield pd.DataFrame(
                {
                    "query_id": flat_q[keep],
                    "neighbor_id": flat_n[keep],
                    "pq_dist": flat_d[keep].astype(np.int64),
                }
            )

    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    scored = parallelize_for_compute(corpus_pq).mapInPandas(score, schema)
    return _ranked(scored, k, "pq_dist", asc=True)


def pq_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact float re-rank of a coded-scan candidate set — the
    "refine" stage that makes PQ production-grade: ADC resolution
    caps raw PQ recall@small-k, so the standard composition (faiss
    ``IndexRefineFlat``) scans in the compressed domain for a
    candidate pool C ≫ k, then reads the RAW vectors of only those
    Q×C survivors and ranks exactly.  Measured here: M=8/K=256 ADC
    top-100 holds 0.885 of the true top-10 at sf0.1 — re-ranked,
    that is the final recall, vs 0.245 for raw ADC top-10.

    ``candidates`` is any ``(query_id, neighbor_id, ...)`` frame
    (:func:`pq_topk` / :func:`ivf_pq_topk` output).  Cost: the raw
    corpus is touched by an id-keyed join of Q×C rows — at 100 TB
    the coded scan reads 8-byte codes and this stage reads 256-byte
    vectors for a vanishing fraction, which is the whole economics
    of compressed-domain search.  Exact cosine at 6 dp, ties →
    smaller neighbor id; arithmetic is the same sequential-double
    path as :func:`similarity.cosine_topk`, so the pipeline stays
    oracle-replicable end to end when fed deterministic codebooks."""
    from kafka_sparkstreaming_sbt_spark.operators.similarity import (
        _dot,
        _norm,
    )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    scored = (
        candidates.select("query_id", "neighbor_id")
        .join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cosine"),
        )
    )
    return _ranked(scored, k, "cosine", asc=False)


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int | None = None,
    n_probe: int | None = None,
    n_subspaces: int = 4,
    n_codes: int = 16,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: coarse k-means cells prune the candidate set (probe
    the query's ``n_probe`` nearest cells), PQ ADC scores only the
    survivors — the faiss IVFADC composition, and the standard shape
    of a trillion-vector index: cells bound the scan, codes bound the
    bytes.  Returns ``(query_id, neighbor_id, pq_dist, rank)``.

    Composition of existing audited pieces: float-domain
    ``kmeans_centroids`` + BLAS ``ivf_assign`` for cells (the coarse
    stage works on raw vectors — it is trained once and is
    metadata-sized), int-domain codebooks/encode/ADC for the scan.
    The candidate restriction is an equi-join on ``cell_id`` — never
    all-pairs.  Quality gates on pytest recall vs the float
    brute-force tier (k-means is not SQL-replicable; same contract
    as ``ivf_kmeans_topk``)."""
    from kafka_sparkstreaming_sbt_spark.operators.similarity import (
        _centroid_arrays,
        _topn_cells_kernel,
        kmeans_centroids,
    )
    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    # kmeans_centroids already returns a (lazily) checkpointed frame;
    # re-checkpointing it eagerly here was one more tiny serial job
    # (r11) — the n_probe count / first assign collect materializes it
    cent = kmeans_centroids(
        corpus, n_cells, seed=seed, vec_col=vec_col, id_col=id_col
    )
    if n_probe is None:
        # size off the memoized driver-side centroid arrays: the ONE
        # collect both materializes the final Lloyd round and seeds
        # the cache the corpus assign and query probes reuse (r12 —
        # previously a count job PLUS two separate collects)
        n = len(_centroid_arrays(cent)[0])
        n_probe = max(1, -(-2 * n // 3))  # ceil(2n/3), the IVF default
    # FUSED query side (r12 — VERDICT r11 #3): the probe ranking and
    # the ADC lut both consume the same bounded query table (the lut
    # was already collected driver-side; the probe table is Q×n_probe
    # rows).  ONE collect of (id, vec) feeds both: probes through the
    # exact _assign_topn_numpy kernel (_topn_cells_kernel — identical
    # per-row math), the lut through _adc_lut_arrays — instead of two
    # separate Spark lineages that each re-scanned the query table.
    qrows = queries.select(id_col, vec_col).collect()
    ids_c, mat_c, cn_c = _centroid_arrays(cent)  # memoized collect
    probe_pairs = []
    if qrows and len(ids_c):
        qv = np.array([r[1] for r in qrows], dtype=np.float64)
        ki = _topn_cells_kernel(
            qv, ids_c, mat_c, cn_c, min(n_probe, len(ids_c))
        )
        probe_pairs = [
            (r[0], int(c)) for r, row in zip(qrows, ki) for c in row
        ]
    qid_type = next(
        f.dataType for f in queries.schema.fields if f.name == id_col
    )
    probes = corpus.sparkSession.createDataFrame(
        probe_pairs,
        T.StructType(
            [
                T.StructField("query_id", qid_type),
                T.StructField("cell_id", T.LongType()),
            ]
        ),
    )
    # one scale collect feeds codebooks, encode, and the LUT — without
    # the explicit pass-through each stage would re-run the scale agg
    scale = _scale_value(quantization_scale(corpus, vec_col))
    books = pq_codebooks(
        corpus, n_subspaces, n_codes, bits, vec_col, id_col,
        method="kmeans", seed=seed, scale=scale,
    ).localCheckpoint(eager=False)
    n_sub, sub_dim = _codebook_geometry(books)
    lut = _adc_lut_arrays(qrows, books, n_sub, sub_dim, bits, scale)
    # FUSED corpus side (r12, guide §8): assign + PQ-encode in ONE
    # mapInPandas pass emitting (id, cell_id, pq_codes) — the old
    # shape scanned the corpus twice (assign pass, encode pass) and
    # then equi-joined the candidate pairs back onto the encoded
    # table, a corpus-sized exchange; now the codes ride with the
    # assignment and the only join is against the tiny broadcast
    # probe table.  Kernels are the exact per-batch functions the
    # standalone passes run, so every row's (cell, codes) is
    # identical; zero-norm rows carry NULL codes and are filtered
    # exactly where the old inner join on the encoded table dropped
    # them.
    assigned_enc = _assign_encode_numpy(
        parallelize_for_compute(corpus), cent, books, n_sub, sub_dim,
        bits, scale, vec_col, id_col,
    )
    cand_codes = (
        probes.join(
            assigned_enc.filter(F.col("pq_codes").isNotNull()),
            "cell_id",
        )
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "pq_codes",
        )
    )
    scored = _pq_score_candidates_numpy(cand_codes, lut, n_sub)
    return _ranked(scored, k, "pq_dist", asc=True)
