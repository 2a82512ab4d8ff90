"""Offline host-quarantine refresh — the fourth offline job.

rank.py reprioritizes, freshness.py reschedules, traps.py suppresses;
this one QUARANTINES: hosts whose recent error rate trips the budget
get every pending frontier row pushed ``quarantine_sec`` past the
crawl's current virtual time, through the same tagged keep-latest
merge as every other writer. The rows stay pending — when the
quarantine lapses the host re-enters scheduling naturally via F6
eligibility, and a healthy fetch round resets its stats window.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sparkcrawl.config import CrawlConfig
from sparkcrawl.operators.health import host_error_stats, sick_hosts
from sparkcrawl.sources.store import CheckpointLog, FetchLogTable, FrontierTable


def quarantine_sick_hosts(
    spark: SparkSession,
    workdir: str,
    cfg: CrawlConfig,
    refresh_id: int = 0,
    window_supersteps: int = 10,
    min_fetches: int = 5,
    max_error_rate: float = 0.5,
    quarantine_sec: int = 3600,
) -> int:
    """Push pending rows on error-budget-tripped hosts past the
    quarantine horizon. Returns rows rescheduled (0 = nothing sick)."""
    log = FetchLogTable(workdir).read(spark)
    ckpt = CheckpointLog(workdir).last()
    frontier_t = FrontierTable(workdir)
    frontier = frontier_t.read(spark)
    if log is None or ckpt is None or frontier is None:
        return 0
    # the fetch log has no host column — the frontier is the authority
    with_host = log.join(
        frontier.select("url_hash", "host").distinct(), "url_hash"
    )
    since = max(0, ckpt["superstep"] - window_supersteps + 1)
    sick = sick_hosts(
        host_error_stats(with_host, since_superstep=since),
        min_fetches=min_fetches,
        max_error_rate=max_error_rate,
    ).select("host")
    horizon = F.timestamp_add(
        "SECOND", F.lit(int(quarantine_sec)), F.lit(ckpt["virtual_time"])
    )
    updated = (
        frontier.filter(F.col("state") == "pending")
        .join(F.broadcast(sick), "host")
        .filter(F.col("next_date") < horizon)
        .withColumn("next_date", horizon)
        .select(*[f.name for f in frontier.schema.fields])
        .persist()
    )
    n = updated.count()
    if n:
        frontier_t.merge(updated, superstep=-1, tag=f"quarantine-refresh-{refresh_id}")
    updated.unpersist()
    return n
