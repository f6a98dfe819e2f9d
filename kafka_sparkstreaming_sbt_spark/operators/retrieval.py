"""Sparse lexical retrieval — BM25 query-time top-k over a document
corpus (extension surface beyond the reference, SURVEY.md §7.2 step 6;
the reference has no retrieval at all — its closest analog is the
spark.sql text query surface, CustomerSpendingAnalysis.scala:140).

:func:`tf_idf` (operators/text.py) computes corpus-wide term WEIGHTS;
this module answers the other half of the retrieval story: given a
concrete query, return the k best documents under Okapi BM25 —

    score(d, q) = sum over t in q of
        idf(t) * tf(t,d) * (k1 + 1)
                 / (tf(t,d) + k1 * (1 - b + b * dl(d)/avgdl))

with the Robertson/Sparck-Jones idf ``ln(1 + (N - df + 0.5)/(df +
0.5))`` (the +1 form Lucene uses, so idf is never negative).

Scale shape (the part that matters at 100 TB):

- **Query-term pushdown.** The postings explode is filtered to the
  query's terms BEFORE the first shuffle (``array_intersect``-style
  filter inside the per-row token array), so the (doc, term) shuffle
  carries only documents containing at least one query term — for a
  handful of query terms that is a vanishing fraction of the corpus,
  and it is the same pruning an inverted index gives a search engine,
  expressed declaratively so Catalyst keeps the parquet scan's column
  pruning (only ``id, text`` are read).
- **Doc length without a shuffle.** dl(d) = ``size(split(text))`` is
  a per-row map computed in the same scan; avgdl is ONE scalar
  aggregate kept lazy via a broadcast cross join (no driver action in
  the builder — the tf_idf discipline).
- **Bounded result.** The final cut is ``TakeOrderedAndProject``
  via :func:`~..operators.topk.global_topk_with_rank` — per-partition
  k-row heaps, no global sort, no unpartitioned window.

Cross-engine determinism: per-(doc, term) contributions are doubles,
and a per-document SUM of doubles is accumulation-order-dependent —
so each contribution is quantized to integer micro-units
(``round(x * 1e6)`` as long) before the sum, the
:func:`~..operators.text.unigram_lm_scores` trick: integer sums are
order-independent and the final division is bit-identical on any
engine.  All inputs to the contribution are exact integers (tf, df,
N, dl) or exact integer ratios (avgdl = sum(dl)/N computed as an
explicit division of two integer aggregates — NOT ``avg()``, whose
internal accumulation differs between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import global_topk_with_rank

#: micro-unit quantization for order-independent double sums
_MICRO = 1000000


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 score per document containing >= 1 query term:
    ``(id_col, n_hit_terms, score_micro, score)`` — ``score_micro``
    (the exact integer sum of per-term micro-unit contributions) is
    the total-order tie-free ranking key; ``score`` is the human
    reading of it.

    Documents with no query term are absent (their score is 0); the
    caller ranks / cuts — see :func:`bm25_topk`.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qarr = F.array(*[F.lit(t) for t in sorted(set(query_terms))])

    # one scan: per-row doc length + postings restricted to query
    # terms before anything shuffles
    toks = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.filter(toks, lambda t: F.array_contains(qarr, t)).alias(
            "hits"
        ),
    )
    # corpus stats: N docs + total token count, one scalar row kept
    # lazy (broadcast cross join) — never a driver-side action here
    stats = base.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    # (doc, term) term frequencies over the pushed-down postings only
    tf = (
        base.filter(F.size("hits") > 0)
        .select(id_col, "dl", F.explode("hits").alias("token"))
        .groupBy(id_col, "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # document frequency per query term — at most |query| rows after
    # aggregation, broadcast back onto the postings
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    idf = F.ln(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    contrib_micro = F.round(contrib * _MICRO).cast("long")

    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select(id_col, contrib_micro.alias("c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("c").alias("score_micro"),
        )
        .select(
            id_col,
            "n_hit_terms",
            "score_micro",
            F.round(F.col("score_micro") / _MICRO, 6).alias("score"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a BM25 query, ranked on the integer
    ``score_micro`` (ties broken by ascending ``id_col`` — a total
    order, so the cut and the 1-based ``rank`` are deterministic).

    Plan: the :func:`bm25_scores` aggregation, then
    ``TakeOrderedAndProject`` + a k-row Arrow rank batch
    (:func:`~..operators.topk.global_topk_with_rank`) — no global
    sort, no unpartitioned window anywhere."""
    scored = bm25_scores(
        df, query_terms, k1=k1, b=b, text_col=text_col, id_col=id_col
    )
    return global_topk_with_rank(
        scored,
        [("score_micro", "desc"), (id_col, "asc")],
        k,
    )


#: RRF nano-unit numerator: floor(1e9 / (rrf_k + rank)) keeps ~7
#: significant digits for any rank a retrieval leg emits, as exact
#: integer arithmetic on both engines (no double division anywhere)
_RRF_NANO = 1_000_000_000


def rrf_fuse(
    legs: list[DataFrame],
    k: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval legs — the
    standard way to combine a sparse (BM25) and a dense (embedding
    cosine) ranking without score calibration (Cormack et al., SIGIR
    2009: fused(d) = sum over legs of 1 / (rrf_k + rank_leg(d));
    items absent from a leg contribute nothing).

    Each ``legs[i]`` needs only ``(id_col, rank_col)``; extra columns
    are dropped.  The contribution is computed as the exact integer
    ``floor(1e9 / (rrf_k + rank))`` so the per-id sum is
    accumulation-order-independent and cross-engine hash-stable (the
    module's micro-unit discipline).  Output per fused id:
    ``(id_col, rrf_nano, n_legs, rank)`` ranked on ``rrf_nano``
    descending with ascending-id ties — a total order.

    Scale shape: the legs carry all the heavy lifting (each is
    already a bounded top-k); the fusion itself unions legs x k rows,
    one partial->final sum on ``id_col``, and a
    ``TakeOrderedAndProject`` cut — no join back to the corpus, no
    global sort.  At 100 TB the fused input is still legs x k rows.
    """
    if not legs:
        raise ValueError("legs must be non-empty")
    if k <= 0 or rrf_k < 0:
        raise ValueError("k must be positive and rrf_k non-negative")
    # True integer division (`div`), not double-divide-then-cast:
    # double division matches floor() only while the quotient's
    # fraction stays away from representability boundaries (diverges
    # for rank beyond ~2^26); `div` is exact at any rank and is the
    # same operator the DuckDB oracle's `//` performs.
    slim = [
        leg.select(
            F.col(id_col),
            F.expr(
                f"{_RRF_NANO}L div "
                f"({rrf_k}L + cast(`{rank_col}` as bigint))"
            ).alias("contrib"),
        )
        for leg in legs
    ]
    allc = slim[0]
    for s in slim[1:]:
        allc = allc.unionByName(s)
    fused = allc.groupBy(id_col).agg(
        F.sum("contrib").alias("rrf_nano"),
        F.count(F.lit(1)).alias("n_legs"),
    )
    return global_topk_with_rank(
        fused,
        [("rrf_nano", "desc"), (id_col, "asc")],
        k,
    )
