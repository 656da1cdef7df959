"""etl_api_bigquery_spark — a brand-new PySpark-native CDC / incremental-ingest engine.

Re-expresses the semantics of the reference pipeline (`syduc993/etl-api-bigquery`:
REST-extract -> GCS bronze parquet -> BigQuery MERGE silver) as an idiomatic
Spark engine:

* ``lake``       — a from-scratch transactional table format (atomic JSON commit
                   log over parquet, bucket partition spec, file-level stats
                   pruning, snapshot isolation, time travel, schema evolution).
                   Replaces BigQuery native tables + GCS partition-overwrite
                   (reference: src/shared/gcs/loader.py, src/features/nhanh/
                   bills/components/loader.py).
* ``cdc``        — deterministic change-feed generation, last-writer-wins dedup,
                   MERGE-apply, exactly-once fencing, lineage metrics.
* ``streaming``  — Structured Streaming wrapper (readStream -> foreachBatch).
* ``operators``  — relational operator library mirroring SURVEY.md §2.
* ``functions``  — columnar scalar-function ports of the reference's per-row
                   Python transforms (flatten, safe casts, date parsing, text
                   analysis, dedup signatures, similarity).

Everything is DataFrame-first: no RDDs, no per-row Python in hot paths.
"""

__version__ = "0.1.0"
