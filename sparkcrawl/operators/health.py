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


def adaptive_politeness(
    fetch_log: DataFrame,
    base_delay_ms: int = 1000,
    min_delay_ms: int = 200,
    max_delay_ms: int = 30_000,
    target_error_rate: float = 0.05,
    latency_factor: float = 2.0,
    error_penalty: float = 10.0,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    ok_col: str = "ok",
) -> DataFrame:
    """Latency/error-adaptive per-host crawl delay — the feedback loop
    production crawlers run on top of the static politeness floor: a
    server answering in 50 ms can be revisited far sooner than one
    taking 4 s, and a host shedding errors gets multiplicatively backed
    off BEFORE its error budget trips quarantine (this is the gentler
    sibling of :func:`sick_hosts`).

    Deterministic rule (no controller state, so replays agree):

      delay = clamp(max(base, latency_factor * p95_latency)
                    * (1 + error_penalty * excess_err),
                    min_delay, max_delay)

    where ``excess_err = max(0, error_rate - target_error_rate)``.

    Output: (host, n_fetches, p95_latency_ms, error_rate, next_delay_ms).

    Shape at scale: ONE hash aggregation keyed by host (bounded
    cardinality, map-side combined); exact ``F.percentile`` keeps
    oracle parity at sandbox SF — ``approx_percentile`` is the 100 TB
    swap-in (same trade as corpus_length_quantiles). The output is a
    |hosts|-sized dimension that broadcasts back into the W3 politeness
    slotting as a crawl-delay override, exactly like robots
    Crawl-delay (operators/robots.py::crawl_delays).
    """
    agg = fetch_log.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("n_fetches"),
        F.round(F.percentile(F.col(latency_col), 0.95), 4).alias("p95_latency_ms"),
        F.round(
            F.sum((~F.col(ok_col)).cast("long")) / F.count("*"), 6
        ).alias("error_rate"),
    )
    excess = F.greatest(F.col("error_rate") - F.lit(target_error_rate), F.lit(0.0))
    raw = (
        F.greatest(F.lit(float(base_delay_ms)),
                   F.lit(latency_factor) * F.col("p95_latency_ms"))
        * (F.lit(1.0) + F.lit(error_penalty) * excess)
    )
    clamped = F.least(
        F.greatest(raw, F.lit(float(min_delay_ms))), F.lit(float(max_delay_ms))
    )
    return agg.select(
        "host",
        "n_fetches",
        "p95_latency_ms",
        "error_rate",
        F.round(clamped, 4).alias("next_delay_ms"),
    )


def revalidation_stats(log_with_host: DataFrame) -> DataFrame:
    """Conditional-GET economy per host: of the fetches that reached
    content (200 or 304), how many the validator machinery turned into
    cheap 304 revalidations. ``revalidation_rate`` near 1 means the
    host honors ETag/Last-Modified and re-crawling it is nearly free
    (bandwidth is headers, not bodies); near 0 on a host we re-visit
    often means either missing validators (check the frontier's etag
    column) or genuinely fast-changing content — cross-reference
    change_rates before widening its revisit interval. Input rows need
    ``host`` and ``status_code``. ONE map-combinable host agg.
    """
    s = F.col("status_code")
    ok, nm = F.count_if(s == 200), F.count_if(s == 304)
    return log_with_host.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        ok.alias("n_full"),
        nm.alias("n_not_modified"),
        F.when(ok + nm > 0, F.round(nm / (ok + nm), 6))
        .alias("revalidation_rate"),
    )
