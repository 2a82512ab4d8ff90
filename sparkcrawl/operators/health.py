"""Host health: per-host error budgets over the recent fetch window.

A host that answers 5xx for most requests is wasting fetch budget and
politeness slots every superstep it stays schedulable — per-URL
backoff (T4) only helps after each URL individually burns retries.
Production crawlers track a host-level error budget and quarantine
the whole host when it trips. Relational shape: one hash aggregation
over the recent fetch-log slice (map-side combined, keyed by host —
bounded cardinality), then a threshold filter; the quarantine write
is host-level, broadcastable back onto the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_error_stats(
    log_with_host: DataFrame,
    since_superstep: int = 0,
) -> DataFrame:
    """(host, n_fetches, n_errors, error_rate) over log rows with
    ``superstep`` >= since_superstep. Input must carry ``host`` and
    ``outcome`` columns (join the fetch log to the frontier on
    url_hash for the host, or derive it from the url)."""
    recent = log_with_host.filter(F.col("superstep") >= since_superstep)
    return recent.groupBy("host").agg(
        F.count("*").alias("n_fetches"),
        F.sum((F.col("outcome") == "server_error").cast("long")).alias("n_errors"),
        F.round(
            F.sum((F.col("outcome") == "server_error").cast("long"))
            / F.count("*"),
            6,
        ).alias("error_rate"),
    )


def sick_hosts(
    stats: DataFrame,
    min_fetches: int = 5,
    max_error_rate: float = 0.5,
) -> DataFrame:
    """Hosts whose error budget tripped: enough observations AND an
    error rate at/over the ceiling."""
    return stats.filter(
        (F.col("n_fetches") >= min_fetches)
        & (F.col("error_rate") >= max_error_rate)
    )
