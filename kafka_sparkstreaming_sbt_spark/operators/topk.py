"""Global top-k with a rank column, scale-safe (extension surface —
the reference has no top-k at all, SURVEY.md §2.12; this is the
supporting primitive for ``analytics.top_customers`` and the
``top_tokens`` corpus query).

Why not ``row_number() OVER (ORDER BY ...)``: an unpartitioned window
moves EVERY input row to a single partition before ranking — Spark
itself warns (``WindowExec: No Partition Defined``), and at 100 TB the
corpus-wide aggregate (billions of rows) funnels through one task.
(A window partitioned by a constant doesn't help either: Catalyst
constant-folds the foldable partition expression away and the plan is
partition-less again — verified against Spark 4.1.)

The scale-safe shape is ``orderBy(...).limit(k)``, which compiles to
``TakeOrderedAndProject``: every partition keeps a bounded k-row heap,
and only k rows per partition reach the final merge.  The rank column
is then assigned over the k survivors alone in one bounded Arrow
batch — the whole plan contains NO window operator at all (asserted
in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (column name, direction) — direction is "asc" or "desc".
OrderSpec = tuple[str, str]


def _order_cols(specs: list[OrderSpec]) -> list[Column]:
    return [
        F.col(c).desc() if d == "desc" else F.col(c).asc()
        for c, d in specs
    ]


def topk_cut(
    df: DataFrame, order_specs: list[OrderSpec], k: int
) -> DataFrame:
    """The lazy top-``k`` cut: ``orderBy(...).limit(k)``, which Spark
    compiles to ``TakeOrderedAndProject`` (per-partition bounded k-row
    heap, k-row final merge — no global sort, no window).  Exposed
    separately so plan tests can assert the physical shape before
    :func:`global_topk_with_rank` checkpoints it away."""
    return df.orderBy(*_order_cols(order_specs)).limit(k)


def global_topk_with_rank(
    df: DataFrame,
    order_specs: list[OrderSpec],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top ``k`` rows of ``df`` under the lexicographic order
    ``order_specs`` (which must be a TOTAL order — include a unique
    tie-break — so both the k-row cut and the rank are deterministic;
    nullable order columns are fine: ranks follow Spark's null
    placement, first for asc and last for desc), with a 1-based
    ``rank_col``.

    Plan shape: ``TakeOrderedAndProject`` (per-partition bounded
    top-k, tiny final merge), then rank(r) = 1 + |{rows strictly
    ahead of r}| via a self-join of the k survivors — at most k x k
    (k <= a few dozen) comparison rows, independent of input size, and
    zero window operators anywhere in the plan.
    """
    top = topk_cut(df, order_specs, k)
    # Rank the k survivors in ONE bounded Arrow batch: coalesce(1) on
    # k rows is trivial, and mapInPandas sorts + numbers them without
    # consuming `top` twice (the earlier self-join spelling needed a
    # persist of the cut — the probe side would otherwise re-execute
    # the whole upstream subtree — and that cache entry leaked in
    # long-lived sessions because a lazy return can never safely
    # unpersist).  Single consumption -> nothing to cache, the plan
    # stays lazy, and TakeOrderedAndProject remains the dominant
    # operator.  Python here touches exactly k rows, never the input.
    # UTF-8 byte order (Spark) == code-point order (pandas) for valid
    # UTF-8, so string sort directions agree across engines.
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(top.schema.fields)
        + [T.StructField(rank_col, T.IntegerType(), False)]
    )
    by = [c for c, _ in order_specs]
    asc = [d != "desc" for _, d in order_specs]

    def _rank(batches):
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if len(pdf):
            # Spark places NULLs FIRST for ascending keys and LAST for
            # descending; pandas sort_values takes ONE na_position for
            # all keys, so a single multi-key sort can't reproduce a
            # mixed-direction order over nullable columns.  Successive
            # stable (mergesort) single-key sorts, applied from the
            # least-significant key up, realize the lexicographic
            # order with the per-direction null placement Spark used
            # for the TakeOrderedAndProject cut.
            for col, ascending in reversed(list(zip(by, asc))):
                pdf = pdf.sort_values(
                    col,
                    ascending=ascending,
                    kind="mergesort",
                    na_position="first" if ascending else "last",
                )
            pdf[rank_col] = range(1, len(pdf) + 1)
            pdf[rank_col] = pdf[rank_col].astype("int32")
            yield pdf

    return top.coalesce(1).mapInPandas(_rank, out_schema)


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_specs: list[OrderSpec],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top ``k`` rows PER GROUP — here a rank window is the right
    tool, unlike the global case above: the window has a real
    partition key, and Catalyst's ``InferWindowGroupLimit`` (Spark
    >= 3.5) inserts a partial ``WindowGroupLimit`` BELOW the exchange,
    so every map task pre-prunes to its local per-group top-k and the
    shuffle carries at most k rows per (group, input partition) —
    the same bounded-heap behavior ``TakeOrderedAndProject`` gives the
    global cut (plan-asserted in tests/test_plans.py).

    ``order_specs`` must totally order rows within a group (include a
    tie-break column) or ranks are nondeterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(*_order_cols(order_specs))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .withColumn(rank_col, F.col(rank_col).cast("long"))
    )
