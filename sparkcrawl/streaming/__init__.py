"""Structured Streaming wrappers (SURVEY §2.10).

The crawl's own control loop is deliberately a driver-side superstep
iteration (deterministic, resumable — T1-T5); streaming enters as an
*ingestion* surface: a stream of seed URLs drives supersteps via
``foreachBatch``.
"""
