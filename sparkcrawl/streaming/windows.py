"""Watermarked windowed aggregation over streaming fetch telemetry.

The reference's master exposes live crawl statistics (SURVEY A3) from
its event loop; the streaming analog is a tumbling-window count of
fetch outcomes over an unbounded fetch-event stream, with a watermark
bounding how long state waits for late events:

  - windows close (and are emitted exactly once, append mode) when the
    watermark passes their end — bounded state, no unbounded buffering,
  - events arriving later than the watermark are dropped by Spark's
    stateful operator — the documented late-data contract,
  - the same plan runs on a batch DataFrame unchanged (windowed groupBy
    is identical; the watermark is a no-op in batch).

Works with any fault-tolerant sink (parquet + checkpoint in the tests;
Kafka/Delta on a real cluster). This is the SURVEY §2.10 "streaming
stats" surface; seed INGESTION streaming lives in microbatch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_outcome_stats(
    events: DataFrame,
    window_duration: str = "10 seconds",
    watermark_delay: str = "30 seconds",
    ts_col: str = "ts",
    outcome_col: str = "outcome",
    exact_hosts: bool = False,
) -> DataFrame:
    """Per-(tumbling-window, outcome) fetch counts + distinct hosts.

    ``events``: streaming or batch rows (ts timestamp, outcome string,
    host string). Streaming: append-mode emission once the watermark
    passes each window's end; late rows beyond ``watermark_delay`` are
    dropped by the engine. ``exact_hosts`` switches the HLL sketch to an
    exact distinct (streaming state can't hold exact sets; batch/oracle
    runs can).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    host_agg = (
        F.countDistinct("host") if exact_hosts else F.approx_count_distinct("host")
    )
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col(outcome_col).alias("outcome"),
        )
        .agg(
            F.count("*").alias("n_fetches"),
            host_agg.alias("n_hosts"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "outcome",
            "n_fetches",
            "n_hosts",
        )
    )
