"""dbt_ci_demo_spark — a PySpark-native analytics engine with the
capabilities of the reference dbt+BigQuery project (hoanghapham/dbt_ci_demo).

The reference (see SURVEY.md) is a SQL-generating pipeline tool: models are
SELECT statements materialized as tables/views/incremental tables/SCD2
snapshots on BigQuery, validated by generic data tests, orchestrated as a DAG
with state-based selection. This package re-expresses that capability surface
Spark-first:

- ``sources``   — table registration, seed (CSV) loading, source freshness
- ``plans``     — model registry, DAG, checksums, state:modified selection,
                  deferral, threaded runner (the dbt orchestration layer)
- ``operators`` — materializations (table/view/copy), incremental upsert
                  (merge / delete+insert / insert_overwrite), SCD2 snapshots,
                  data-quality tests, catalog introspection, plus the
                  north-star LLM-data-pipeline operators (dedup, similarity
                  search, text analysis, multimodal)
- ``functions`` — BigQuery-SQL idiom compatibility helpers as Spark column
                  expressions (no UDFs in the hot path)
- ``streaming`` — Structured Streaming variants of the event-table operators

Everything is built on the public PySpark DataFrame/SQL API; no custom
Catalyst rules are required (SURVEY.md §4).
"""

__version__ = "0.1.0"
