"""URL dedup — U2 batch distinct + F1/J1 seen-set filtering (SURVEY §2.2/§2.3/§2.7).

The reference dedups sequentially (``UniqueUriFilter.is_known(url,
add_if_unknown=True)`` called per discovered link in frontier.add_uri —
src/spyder/core/{uri_uniq,frontier}.py). Set-oriented re-expression:

  1. U2 within-batch distinct with deterministic first-discovery-wins
     (stable order, SURVEY §7 hard-part #1),
  2. optional bloom PREFILTER (membership.ShardedBloom) that lets
     definitely-new rows skip the join build,
  3. J1 authoritative ``left_anti`` join against the seen table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from sparkcrawl.config import CrawlConfig
from sparkcrawl.operators.membership import ShardedBloom


def batch_distinct(candidates: DataFrame) -> DataFrame:
    """U2: one row per url_hash within the discovery batch.

    First-discovery-wins, deterministically: order by the discovering
    page's politeness slot then source url_hash — mirrors the
    reference's sequential is_known(add_if_unknown=True) under the
    superstep's total fetch order.
    """
    order = []
    for c in ("slot", "src_url_hash"):
        if c in candidates.columns:
            order.append(F.asc(c))
    order.append(F.asc("url"))
    w = W.partitionBy("url_hash").orderBy(*order)
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    cfg: CrawlConfig,
    bloom: ShardedBloom | None = None,
) -> DataFrame:
    """F1+J1: keep candidates whose url_hash is not in the seen set.

    ``seen`` is a (url_hash) DataFrame — in practice the frontier's key
    projection. The anti-join is ALWAYS the authority; the bloom only
    routes definitely-new rows around it (false positives merely pay
    the join, never drop a URL).
    """
    seen_keys = seen.select("url_hash").distinct()
    if bloom is None or not cfg.use_bloom_prefilter:
        return candidates.join(seen_keys, "url_hash", "left_anti")
    tagged = bloom.prefilter(candidates, "url_hash")
    definitely_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified_new = suspects.join(seen_keys, "url_hash", "left_anti")
    return definitely_new.unionByName(verified_new)
