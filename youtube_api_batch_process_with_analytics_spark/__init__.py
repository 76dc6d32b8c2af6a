"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``starlordamit/Youtube_Api_batch_process_with_analytics``
(a YouTube channel-analytics batch service), re-expressed Spark-first.

Layout
------
- ``session``     : SparkSession factory tuned for local testing, designed for cluster scale.
- ``sources``     : readers for the synthetic star schema + domain-table schemas.
- ``functions``   : pure-Column expression library (zero Python UDFs on the hot path).
- ``operators``   : relational operators (top-N, joins, pagination, log analytics,
                    windows, dedup, similarity, text analysis).
- ``analytics``   : the flagship channel-analytics pipeline (SURVEY.md §3.1).
- ``streaming``   : Structured Streaming variants of the stateful operators.
- ``multimodal``  : binary-column (image/audio/video) plumbing with stubbed decoders.

Every operator cites the reference implementation it models (file:line in
``/root/reference/``) and is implemented with native DataFrame/SQL constructs
so Catalyst can push down predicates, prune columns, and pick join strategies.
"""

__version__ = "0.1.0"
