"""Sources & sinks (SURVEY.md §2.1 S1-S6, K1-K6).

- ``readers``   — typed file readers + the paginated REST scan semantics
                  (cursor advance, termination rules) with injectable fetch.
- ``writers``   — partitioned parquet sinks: bronze append, latest+history
                  dual write, overwrite-dim refresh.
- ``bookmarks`` — incremental-ingest watermark table (replaces the
                  reference's Airflow/S3/env-var watermark dance).
- ``versioned`` — manifest-based versioned tables: atomic commits, time
                  travel, change feed, rollback, vacuum (upgrades the
                  reference's latest+timestamped dual write).
"""
