"""Offline trap-rule refresh — mine the frontier for trap templates.

Third member of the offline-refresh family (rank.py reprioritizes,
freshness.py reschedules, this one suppresses): scan the accumulated
frontier for digit-collapsed host templates whose URL fanout exceeds
the configured ceiling, and publish them to the trap-rules table. The
next superstep's candidate gate (cfg.filter_traps) anti-joins newly
discovered links against the rules, so a calendar maze stops growing
the moment one refresh has seen enough of it — no manual scoper
(F2) regex needed.

Rules are derived state (recomputable from the frontier), so the
table is replace-on-refresh rather than append+keep-latest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkcrawl.config import CrawlConfig
from sparkcrawl.operators.traps import host_template_fanout, url_trap_features
from sparkcrawl.sources.store import FrontierTable, TrapRulesTable


def mine_trap_templates(
    frontier_rows: DataFrame, cfg: CrawlConfig
) -> DataFrame:
    """(host_template, fanout) for templates over the fanout ceiling."""
    featured = url_trap_features(frontier_rows.select("url"))
    return host_template_fanout(featured).filter(
        F.col("fanout") > cfg.trap_max_template_fanout
    )


def refresh_trap_rules(
    spark: SparkSession, workdir: str, cfg: CrawlConfig, refresh_id: int = 0
) -> int:
    """Recompute and publish the trap-rule table. Returns the number of
    suppressed templates (0 when the frontier is empty or clean)."""
    frontier = FrontierTable(workdir).read(spark)
    if frontier is None:
        return 0
    rules = mine_trap_templates(frontier, cfg).persist()
    n = rules.count()
    if n:
        TrapRulesTable(workdir).replace(rules, refresh_id=refresh_id)
    rules.unpersist()
    return n
