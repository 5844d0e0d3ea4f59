"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference CSV-ingestion-with-idempotency pipeline
(``/root/reference``, see SURVEY.md), re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; no hand-scheduling)
- content-addressed idempotency as an anti-join gate, not an RPC check
- status ledger as an append-only Parquet table with latest-wins reads
- DLQ / retry routing as plain DataFrame logic over a failure table
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal column plumbing) designed for 100 TB scale

Import convention inside the repo::

    import csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark as engine
"""

__version__ = "0.1.0"

from . import functions, operators, plans, sources  # noqa: F401
