"""Crawl-generation diff — what changed between two crawl snapshots.

Operations teams ask this constantly ("what did the last crawl add /
lose / change per site?"), and the freshness model (plans/freshness.py,
Cho & Garcia-Molina) consumes exactly these change observations. Both
operators are single-shuffle relational plans that hold at 10^10 docs:

  - ``crawl_delta``: one full-outer equi-join on doc_id over
    content-hash projections (32-byte md5 keys travel the shuffle, not
    bodies/spans), classifying every URL as added / removed / changed /
    unchanged.
  - ``host_delta_summary``: one hash agg over the delta keyed by
    registered host with map-side combine — conditional counts, no
    window, no second shuffle of the raw docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkcrawl.functions.urlnorm import host_of_canonical_col


def _hash_proj(docs: DataFrame, id_col: str, text_col: str,
               alias: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias(alias),
    )


def crawl_delta(old_docs: DataFrame, new_docs: DataFrame,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-URL diff of two crawl generations:
    (doc_id, change 'added'|'removed'|'changed'|'unchanged').

    Content equality is md5-projected BEFORE the join so only
    (doc_id, 32-byte hash) rows shuffle; the full-outer join is the
    one unavoidable co-location of the two generations.
    """
    old = _hash_proj(old_docs, id_col, text_col, "_old_md5")
    new = _hash_proj(new_docs, id_col, text_col, "_new_md5")
    j = old.join(new, "doc_id", "full_outer")
    change = (
        F.when(F.col("_old_md5").isNull(), "added")
        .when(F.col("_new_md5").isNull(), "removed")
        .when(F.col("_old_md5") == F.col("_new_md5"), "unchanged")
        .otherwise("changed")
    )
    return j.select("doc_id", change.alias("change"))


def host_delta_summary(delta: DataFrame) -> DataFrame:
    """Per-host rollup of a ``crawl_delta`` result: (host, n_added,
    n_removed, n_changed, n_unchanged, churn) where churn is the
    changed+added+removed share of the host's union footprint."""
    host = host_of_canonical_col(F.col("doc_id"))
    agg = delta.groupBy(host.alias("host")).agg(
        F.count_if(F.col("change") == "added").alias("n_added"),
        F.count_if(F.col("change") == "removed").alias("n_removed"),
        F.count_if(F.col("change") == "changed").alias("n_changed"),
        F.count_if(F.col("change") == "unchanged").alias("n_unchanged"),
    )
    total = (F.col("n_added") + F.col("n_removed") + F.col("n_changed")
             + F.col("n_unchanged"))
    return agg.withColumn(
        "churn",
        F.round((total - F.col("n_unchanged")) / total, 6),
    )
