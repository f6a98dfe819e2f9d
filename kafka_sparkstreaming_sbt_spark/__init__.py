"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``sachinlidhu/kafka_sparkStreaming_sbt``
(a Kafka -> Spark Structured Streaming -> JDBC customer-spending
pipeline), rebuilt from scratch on the PySpark DataFrame / SQL /
Structured Streaming APIs.

Layout
------
- ``schemas``    : fixed transaction StructTypes (SURVEY.md §1.2)
- ``sources``    : Kafka / JSON-decode / batch / JDBC / synthetic (§2.1)
- ``operators``  : dedup, windowed aggregation, daily rollup (§2.4-2.5)
                   plus large-scale extensions (fuzzy dedup, similarity
                   search, text analysis, multimodal plumbing)
- ``functions``  : scalar-function helpers (§2.7)
- ``streaming``  : watermark/foreachBatch/sink wiring (§2.2, §2.6)
- ``plans``      : plan-inspection helpers used by tests/bench

Everything is expressed declaratively against the DataFrame API so
Catalyst/Tungsten handle optimization; no RDDs, no row-at-a-time
Python UDFs in any hot path.
"""

__version__ = "0.1.0"
