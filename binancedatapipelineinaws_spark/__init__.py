"""PySpark-native analytics engine with the capabilities of
TugrulGokce/BinanceDataPipelineInAWS.

The reference (``/root/reference``) is a streaming ETL pipeline: a
Binance trade WebSocket feed is windowed into per-minute TSV files,
uploaded to S3, and bulk-loaded into Aurora MySQL 5.7 where all querying
is delegated (see SURVEY.md).  This package re-expresses that capability
Spark-first:

- ``sources``    : batch + streaming readers/writers (TSV, parquet, table)
- ``canonical``  : the lossy BTCUSDT canonicalization layer (main.py:56-66)
- ``operators``  : the delegated relational surface (agg/join/window/sort/
                   set-ops/scalar functions) as DataFrame plans
- ``functions``  : LLM-data-pipeline extensions (dedup, similarity search,
                   text analysis, multimodal plumbing)
- ``plans``      : flagship multi-operator plans
- ``streaming``  : Structured Streaming parity for the ingest pipeline
- ``registry``   : query-id -> (Spark callable, DuckDB oracle SQL) registry
                   consumed by ``__spark_entry__.py``
"""

__version__ = "0.1.0"
