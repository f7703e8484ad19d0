"""apachebeam_python_spark — a PySpark-native analytics engine.

A brand-new engine offering the query / data-processing capabilities of the
reference repo ``InigoSJ/ApacheBeam-Python`` (an Apache Beam Python pipeline
collection; see SURVEY.md §0 — the local checkout is empty, so all parity
claims cite SURVEY.md §2's operator inventory instead of file:line), expressed
Spark-first: DataFrame/SQL on Catalyst, Structured Streaming for unbounded
data, Arrow-vectorized Pandas UDFs only where built-ins cannot express the
semantics.

Layout
------
- ``session``    : SparkSession tuning + table loading (the "catalog").
- ``sources``    : batch + streaming source/sink helpers (SURVEY §2.1).
- ``operators``  : element-wise / aggregation / join / window / set-op /
                   event-time / dedup / similarity operators (SURVEY §2.2-2.11).
- ``functions``  : scalar function library + text-analysis + vector math
                   (SURVEY §2.7, §2.11).
- ``streaming``  : Structured Streaming jobs, watermarks, stateful processing
                   (SURVEY §2.8-2.9).
- ``plans``      : plan inspection / scale-review helpers (explain, shuffle
                   count, broadcast assertions) used by tests and docs.
- ``queries``    : the oracle-checked query registry — one named query per
                   operator in SURVEY §2, each with matching DuckDB SQL.
"""

__version__ = "0.1.0"
