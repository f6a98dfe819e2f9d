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
is then derived over the k survivors alone with a bounded k x k
comparison join — the whole plan contains NO window operator at all
(asserted in tests/test_plans.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (column name, direction) — direction is "asc" or "desc".
OrderSpec = tuple[str, str]


def _order_cols(specs: list[OrderSpec]) -> list[Column]:
    return [
        F.col(c).desc() if d == "desc" else F.col(c).asc()
        for c, d in specs
    ]


def _strictly_ahead(specs: list[OrderSpec]) -> Column:
    """Predicate: the ``_u_``-aliased row sorts strictly before the
    unaliased row under the lexicographic order ``specs``."""
    clauses: list[Column] = []
    equal_prefix: list[Column] = []
    for c, d in specs:
        u, t = F.col(f"_u_{c}"), F.col(c)
        cmp = (u > t) if d == "desc" else (u < t)
        clauses.append(
            reduce(lambda a, b: a & b, equal_prefix + [cmp])
        )
        equal_prefix.append(u == t)
    return reduce(lambda a, b: a | b, clauses)


def global_topk_with_rank(
    df: DataFrame,
    order_specs: list[OrderSpec],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top ``k`` rows of ``df`` under the lexicographic order
    ``order_specs`` (which must be a TOTAL order over non-null columns
    — include a unique tie-break — so both the k-row cut and the rank
    are deterministic), with a 1-based ``rank_col``.

    Plan shape: ``TakeOrderedAndProject`` (per-partition bounded
    top-k, tiny final merge), then rank(r) = 1 + |{rows strictly
    ahead of r}| via a self-join of the k survivors — at most k x k
    (k <= a few dozen) comparison rows, independent of input size, and
    zero window operators anywhere in the plan.
    """
    top = df.orderBy(*_order_cols(order_specs)).limit(k)
    # the k survivors feed BOTH sides of the rank join; without this
    # the probe side would re-execute the whole upstream subtree (a
    # second 100 TB scan — exchange reuse does not kick in because
    # column pruning makes the two subtrees non-identical).  Caching k
    # rows makes the scan+aggregate run exactly once.
    top = top.persist()
    probe = top.select(
        *[F.col(c).alias(f"_u_{c}") for c, _ in order_specs]
    )
    first_probe = f"_u_{order_specs[0][0]}"
    # left join: the rank-1 row matches nothing ahead of it and counts 0
    joined = top.join(probe, _strictly_ahead(order_specs), "left")
    return (
        joined.groupBy(*top.columns)
        .agg((F.count(F.col(first_probe)) + 1).cast("int").alias(rank_col))
    )
