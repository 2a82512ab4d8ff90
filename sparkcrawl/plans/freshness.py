"""Offline adaptive-revisit refresh — change-rate-driven next_date.

Companion batch job to ``plans/rank.py``: where the rank refresh
rewrites frontier *priorities* from the link graph, this job rewrites
frontier *next_date* from each URL's observed change history, so the
scheduler's F6 eligibility naturally favors fast-changing pages.

The change signal is already in the fetch log, for free, thanks to the
engine's conditional-GET semantics (S4/J4): a 200 means the page
changed since our stored etag/mod_date, a 304 means it did not. Joining
fetch_log to the checkpoint log's virtual clock (T1) turns (superstep,
url_hash, outcome) into a timestamped per-URL change history, which
``operators/freshness.py`` reduces to Poisson change-rate estimates
and clamped revisit intervals.

The frontier write goes through the same keep-latest merge as every
other writer (J3/W4), tagged ``freshness-refresh-<id>`` so re-running
one refresh replaces rather than stacks its delta — identical replay
discipline to the rank refresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkcrawl.config import CrawlConfig
from sparkcrawl.operators.freshness import (
    change_intervals,
    change_rates,
    revisit_intervals,
)
from sparkcrawl.sources.store import CheckpointLog, FetchLogTable, FrontierTable


def url_change_history(spark: SparkSession, workdir: str) -> DataFrame | None:
    """(url_hash, ts, changed) per conditional-GET observation, or None
    if the crawl has no fetch log yet. Only 200/304 rows are change
    observations; errors and redirects say nothing about content."""
    log = FetchLogTable(workdir).read(spark)
    checkpoints = CheckpointLog(workdir).read(spark)
    if log is None or checkpoints is None:
        return None
    clock = checkpoints.select("superstep", "virtual_time")
    return (
        log.filter(F.col("outcome").isin("success", "not_modified"))
        .join(F.broadcast(clock), "superstep")
        .select(
            "url_hash",
            F.col("virtual_time").alias("ts"),
            (F.col("outcome") == "success").alias("changed"),
        )
    )


def refresh_revisit_schedule(
    spark: SparkSession,
    workdir: str,
    cfg: CrawlConfig,
    refresh_id: int = 0,
    target_stale_prob: float = 0.5,
    min_sec: int | None = None,
    max_sec: int | None = None,
) -> int:
    """Rewrite PENDING frontier rows' next_date from estimated change
    rates. Returns the number of rows rescheduled (0 when there is no
    history or no row moved).

    next_date = the URL's last observation time + its clamped revisit
    interval. URLs with fewer than 2 observations keep their ladder
    schedule (no estimate -> no row emitted by change_rates).
    The clamp floor defaults to cfg.delta_seconds (never reschedule
    tighter than the politeness ladder's base step).
    """
    history = url_change_history(spark, workdir)
    if history is None:
        return 0
    lo = int(cfg.delta_seconds) if min_sec is None else int(min_sec)
    hi = 30 * 86400 if max_sec is None else int(max_sec)
    revisit = revisit_intervals(
        change_rates(change_intervals(history, changed="changed")),
        target_stale_prob=target_stale_prob,
        min_sec=lo,
        max_sec=hi,
    )
    last_seen = history.groupBy("url_hash").agg(F.max("ts").alias("_last_ts"))
    schedule = revisit.join(last_seen, "url_hash").select(
        "url_hash",
        F.timestamp_add("SECOND", F.col("revisit_sec"), F.col("_last_ts")).alias(
            "_new_next_date"
        ),
    )
    frontier = FrontierTable(workdir)
    current = frontier.read(spark)
    if current is None:
        return 0
    updated = (
        current.filter(F.col("state") == "pending")
        # schedule cardinality = estimated URLs (<= fetched URLs), far
        # smaller than the frontier at crawl scale; still a key-equi
        # join AQE can broadcast when it fits — no hint needed.
        .join(schedule, "url_hash")
        .filter(F.col("_new_next_date") != F.col("next_date"))
        .withColumn("next_date", F.col("_new_next_date"))
        .drop("_new_next_date")
        .select(*[f.name for f in current.schema.fields])
        .persist()
    )
    n = updated.count()
    if n:
        frontier.merge(updated, superstep=-1, tag=f"freshness-refresh-{refresh_id}")
    updated.unpersist()
    return n
