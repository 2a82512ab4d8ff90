"""Composite priority refresh — blend the host-level scheduling signals.

plans/rank.py (link-graph authority) and plans/relevance.py (topical
BM25) each rewrite pending priorities through the same keep-latest
merge; run SEQUENTIALLY they stomp each other — the last refresh wins
outright. A production scheduler wants one priority that WEIGHS the
signals, so this module computes, per host,

    d = (w_rank * d_rank + w_rel * d_rel) / (weights present)

where each ``d`` is the host's percent_rank for that signal (0 = best
host, 1 = worst; computed over the HOST table — bounded
cardinality, never frontier rows). A host missing a signal has the
weight renormalized over the signals it HAS; a host with no signal at
all keeps its current priority (never starved for being unexplored —
same contract as the single-signal refreshes). Priority buckets:
1 = highest score, cfg.num_priorities = lowest.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sparkcrawl.config import CrawlConfig
from sparkcrawl.plans.rank import host_percent_rank, host_ranks
from sparkcrawl.plans.relevance import host_relevance
from sparkcrawl.sources.store import FrontierTable


def refresh_composite_priorities(
    spark: SparkSession,
    workdir: str,
    cfg: CrawlConfig,
    query_terms: tuple[str, ...] = (),
    w_rank: float = 0.5,
    w_relevance: float = 0.5,
    refresh_id: int = 0,
) -> int:
    """Blend link-graph rank and topical relevance into one priority
    rewrite. Returns rows changed. Tagged per refresh_id (replayable).
    """
    sigs = []
    if w_rank > 0:
        ranks = host_ranks(spark, workdir)
        if ranks is not None:
            # desc(rank) ONLY, and the RAW percent_rank (no 1-x
            # inversion round-trip, whose ulp error flips floor() at
            # exact bucket boundaries) — so w_rank=1 reproduces
            # plans/rank.py bucket-for-bucket; partitioned two-phase
            # form, never a global window
            sigs.append((
                w_rank,
                host_percent_rank(ranks, [F.desc("rank")]).select(
                    "host", F.col("_pr").alias("_s")),
            ))
    if w_relevance > 0 and query_terms:
        rel = host_relevance(spark, workdir, query_terms)
        if rel is not None:
            rel = rel.filter(F.col("relevance") > 0)
            sigs.append((
                w_relevance,
                host_percent_rank(
                    rel, [F.desc("relevance"), F.asc("host")]
                ).select("host", F.col("_pr").alias("_s")),
            ))
    if not sigs:
        return 0
    blended = None
    for i, (w, df) in enumerate(sigs):
        part = df.select(
            "host",
            (F.col("_s") * F.lit(w)).alias(f"_ws{i}"),
            F.lit(w).alias(f"_w{i}"),
        )
        blended = part if blended is None else blended.join(part, "host", "outer")
    ws = [c for c in blended.columns if c.startswith("_ws")]
    wt = [c for c in blended.columns if c.startswith("_w") and not c.startswith("_ws")]
    dist = sum(
        [F.coalesce(F.col(c), F.lit(0.0)) for c in ws], F.lit(0.0)
    ) / sum([F.coalesce(F.col(c), F.lit(0.0)) for c in wt], F.lit(0.0))
    pri = blended.select(
        "host",
        (
            F.floor(dist * (cfg.num_priorities - 1)) + 1
        ).cast("int").alias("_c_priority"),
    )
    frontier = FrontierTable(workdir)
    current = frontier.read(spark)
    if current is None:
        return 0
    pending = current.filter(F.col("state") == "pending")
    updated = (
        pending.join(F.broadcast(pri), "host", "left")
        .filter(
            F.col("_c_priority").isNotNull()
            & (F.col("_c_priority") != F.col("priority"))
        )
        .withColumn("priority", F.col("_c_priority"))
        .drop("_c_priority")
        .select(*[f.name for f in current.schema.fields])
        .persist()
    )
    n = updated.count()
    if n:
        frontier.merge(updated, superstep=-1, tag=f"composite-refresh-{refresh_id}")
    updated.unpersist()
    return n
