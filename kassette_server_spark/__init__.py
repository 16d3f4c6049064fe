"""kassette_server_spark — a PySpark-native analytics & pipeline engine.

A from-scratch re-expression of the capabilities of the reference event
pipeline (kassette-ai/kassette-server, see SURVEY.md) as an idiomatic
Apache Spark engine: DataFrame/SQL relational core, config-driven
transform pipeline, structured-streaming delivery, and LLM-data-pipeline
operators (dedup, similarity search, text analysis) designed for 100 TB
scale.

Layout:
  session.py    SparkSession factory (AQE, UTC, arrow)
  catalog.py    parquet table registry for the driver test tables
  convert.py    kassette type-coercion expression library (SURVEY §1.2)
  rules.py      transform-rule compiler: field_map/field_hide/field_delete
  pipeline.py   batch pipeline graph (envelope→identity→enrich→fanout→sink)
  queries/      declared query surface (SURVEY §2.2 + §2.3)
  operators/    dedup, similarity, text stats, sessionization
  sources/      REST poller data source, file sources
  sinks/        REST sink shapes, JDBC, delivery ledger
  streaming/    structured-streaming wrapping + retry/DLQ
"""

__version__ = "0.1.0"
