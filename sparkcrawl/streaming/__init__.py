"""Structured Streaming wrappers (SURVEY §2.10).

The crawl's own control loop is deliberately a driver-side superstep
iteration (deterministic, resumable — T1-T5); streaming enters as an
*ingestion* surface (a stream of seed URLs drives supersteps via
``foreachBatch``) and an *archival* surface (fetch rows land as WARC
shards per micro-batch, ``warc_sink``).
"""
