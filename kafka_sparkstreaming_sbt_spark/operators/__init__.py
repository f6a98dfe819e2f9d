"""Operators (SURVEY.md §2.4-2.5 reference parity + §7.4 extensions)."""

from kafka_sparkstreaming_sbt_spark.operators.dedup import (  # noqa: F401
    dedup_daily,
    dedup_transactions,
)
from kafka_sparkstreaming_sbt_spark.operators.rollup import (  # noqa: F401
    daily_rollup,
    daily_rollup_deterministic,
)
from kafka_sparkstreaming_sbt_spark.operators.windows import (  # noqa: F401
    windowed_spending,
)
