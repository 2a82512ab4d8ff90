"""Offline focused-crawl relevance refresh — topical priority feedback.

A focused crawler (Chakrabarti et al., 1999 — public method) steers its
frontier toward pages RELEVANT to a topic: pages whose fetched content
scores well against the topic description promote their host, so the
scheduler spends budget where relevant content was actually found.
This module is the relevance sibling of :mod:`sparkcrawl.plans.rank`
(link-graph authority) and :mod:`sparkcrawl.plans.freshness` (change
rate): score crawled documents with BM25 against the topic terms,
aggregate per host, bucket hosts into priority levels, and rewrite
PENDING frontier rows through the engine's own keep-latest merge (J3)
— no new write path, tagged so one refresh replays idempotently, and
the next superstep's per-queue top-k (W1) picks the new order up with
zero scheduler changes.

Shape at scale: BM25 is one broadcast term join + a per-doc hash agg
(textops.bm25_scores); the host rollup is a second hash agg on a
bounded key; the percentile window runs over HOSTS only; frontier rows
get their new priority through a broadcast host-level join. Nothing
corpus-sized ever sorts or collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sparkcrawl.config import CrawlConfig
from sparkcrawl.functions.urlnorm import host_of_canonical_col
from sparkcrawl.operators.textops import bm25_scores, spans_to_text
from sparkcrawl.sources.store import DocumentsTable, FrontierTable


def host_relevance(
    spark: SparkSession,
    workdir: str,
    query_terms: tuple[str, ...],
) -> DataFrame | None:
    """(host, n_docs, relevance) over the crawled documents table, or
    None if nothing was fetched yet. relevance = mean BM25 of the
    host's documents against the topic terms (mean, not sum: a host
    should win by being on-topic, not merely by being big)."""
    docs_spans = DocumentsTable(workdir).read(spark)
    if docs_spans is None:
        return None
    docs = spans_to_text(docs_spans)
    scored = bm25_scores(docs, query_terms)
    by_host = scored.select(
        host_of_canonical_col(F.col("id")).alias("host"), "bm25"
    )
    return by_host.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("bm25"), 6).alias("relevance"),
    )


def refresh_relevance_priorities(
    spark: SparkSession,
    workdir: str,
    cfg: CrawlConfig,
    query_terms: tuple[str, ...],
    refresh_id: int = 0,
) -> int:
    """Re-prioritize PENDING frontier rows from per-host topical
    relevance. Returns the number of rows whose priority changed.
    Hosts with zero relevance (no on-topic document yet) keep their
    current priority — a focused crawl demotes KNOWN off-topic hosts
    only relative to known on-topic ones, it does not starve the
    unexplored frontier. Tagged ``relevance-refresh-<refresh_id>`` so
    re-running one refresh replaces rather than stacks its delta."""
    rel = host_relevance(spark, workdir, query_terms)
    if rel is None:
        return 0
    from sparkcrawl.plans.rank import host_percent_rank

    ranked = rel.filter(F.col("relevance") > 0)
    pri = host_percent_rank(
        ranked, [F.desc("relevance"), F.asc("host")]
    ).select(
        "host",
        (
            F.floor(F.col("_pr") * (cfg.num_priorities - 1)) + 1
        ).cast("int").alias("_rel_priority"),
    )
    frontier = FrontierTable(workdir)
    current = frontier.read(spark)
    if current is None:
        return 0
    pending = current.filter(F.col("state") == "pending")
    updated = (
        pending.join(F.broadcast(pri), "host", "left")
        .filter(
            F.col("_rel_priority").isNotNull()
            & (F.col("_rel_priority") != F.col("priority"))
        )
        .withColumn("priority", F.col("_rel_priority"))
        .drop("_rel_priority")
        .select(*[f.name for f in current.schema.fields])
        .persist()
    )
    n = updated.count()
    if n:
        frontier.merge(updated, superstep=-1, tag=f"relevance-refresh-{refresh_id}")
    updated.unpersist()
    return n
