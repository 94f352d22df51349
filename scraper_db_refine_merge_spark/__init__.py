"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference event-scraping → refine → merge → query
pipeline (skenglord/scraper_db_refine_merge), re-expressed Spark-first.

Layout
------
- ``session``    — SparkSession factory tuned for large-cluster defaults.
- ``schemas``    — unified nested event StructType (reference helpers/schemas.py).
- ``sources``    — readers (parquet/json/json-in-column) and sinks (json/csv/
                   markdown/filtered export), table loaders for the test data.
- ``functions``  — scalar/array column expressions: dates, strings, ids,
                   normalization maps, quality scoring, text search/analysis, geo.
- ``operators``  — dataflow operators: pagination, dedup (exact/minhash/simhash/
                   ngram-jaccard/embedding), similarity search, keyed upsert MERGE.
- ``plans``      — the query catalog: API-equivalent queries and reports.
- ``streaming``  — incremental ingestion (foreachBatch MERGE), freshness and
                   staleness queries, metrics emission.
- ``multimodal`` — binary-column (image/audio/video) plumbing with stubbed codecs.

Everything is DataFrame-declarative so Catalyst handles pushdown, pruning,
join strategy and whole-stage codegen; Python UDFs appear only where Spark
builtins cannot express the semantics (uuid5 parity, fuzzy date fallback).
"""

__version__ = "0.1.0"
