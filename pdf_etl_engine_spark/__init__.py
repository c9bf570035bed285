"""pdf_etl_engine_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Justbetter1/pdf-etl-engine.

The reference (`/root/reference/main.py`) is a PDF→KPI extraction ETL
service delegating storage/queries to GCS/Firestore/BigQuery. This
package re-expresses its semantics — dynamic typed schema inference,
value coercion, schema evolution, multi-tenant append-only ingestion,
path-based event filtering, permission-filtered top-k retrieval — as
idiomatic Spark DataFrame/SQL plans, plus the LLM-data-pipeline
extension surface (dedup, similarity search, multimodal columns, text
analysis) designed for 100 TB scale.

Layout:
  session.py    — SparkSession builder (local test profile + scale notes)
  catalog.py    — testdata table loading / temp-view registration
  registry.py   — query + oracle-SQL registry feeding __spark_entry__.py
  functions/    — scalar kernel (pure Column exprs; reference main.py:165-250)
  plans/        — logical type system + schema inference (main.py:90-216)
  operators/    — relational + extension operator inventory (SURVEY.md §2)
  sources/      — scans/sinks: binaryFile, parquet, schema-evolving append
  pipeline.py   — batch ingest pipeline parity (main.py:656-759)
  streaming/    — Structured Streaming ingest + event-time windows
"""

__version__ = "0.1.0"
