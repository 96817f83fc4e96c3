"""Streaming is intentionally out of scope for v1: the reference has no
streaming operators (SURVEY.md §2.10 — ingestion is request-driven batch;
its "delta" load mode is an orchestration flag, not an incremental compute
path). Incremental validation of new data maps to Iceberg incremental
snapshot reads on the batch engine. This package is the reserved home for a
Structured Streaming front-end (readStream → same compiled rule aggregates
via watermarked windows) if a later round needs it.
"""
