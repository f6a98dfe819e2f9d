"""Scalar functions the reference exercises (SURVEY.md §2.7).

Most of F1-F10 are direct ``pyspark.sql.functions`` calls made inline
where used (from_json, to_timestamp, to_date, cast, alias, sum,
window); this module holds the two with reference-specific quirks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_utc(col: Column | str) -> Column:
    """F4 (CustomerSpendingAnalysis.scala:69): ``to_utc_timestamp(ts,
    "UTC")`` — an identity under the forced-UTC session timezone
    (CSA:66); Catalyst constant-folds it away.  Kept for parity."""
    return F.to_utc_timestamp(col, "UTC")


def reparse_timestamp_whole_seconds(col: Column | str) -> Column:
    """F2 quirk (CSA:42): re-parse an already-Timestamp column through
    ``to_timestamp(cast(ts AS string), 'yyyy-MM-dd HH:mm:ss')``.

    Semantics pinned in tests/test_schemas.py: whole-second timestamps
    round-trip unchanged; timestamps with sub-second precision render
    with a fractional part the pattern doesn't match and come back
    NULL.  Parity-only — correctness-mode paths skip it.

    Uses ``try_to_timestamp``: the reference runs Spark 3.5 where
    ``to_timestamp`` returns NULL on parse failure; under Spark 4's
    ANSI default it would throw instead, so ``try_to_timestamp`` is
    the semantics-preserving spelling."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c.cast("string"), F.lit("yyyy-MM-dd HH:mm:ss"))
