"""Streaming URL dedup — watermark-bounded state, no external store.

The batch engine dedups with bloom-prefilter + authoritative anti-join
against the frontier (F1/J1). A pure-streaming frontend wants the
duplicates dropped BEFORE they ever hit the frontier table: a crawl's
discovered-link stream repeats the same canonical URL within minutes
(sitewide nav links), and shipping every copy to foreachBatch wastes
the merge.

``dedup_url_stream`` uses ``dropDuplicatesWithinWatermark`` on
url_hash: state is bounded by the watermark horizon (Spark evicts keys
older than the watermark), so the streaming state store holds only the
recent-horizon key set — NOT the 10^10 all-time seen set, which stays
the frontier's job. This is deliberately the same two-tier contract as
the batch path: the stream dedup is a best-effort prefilter (a URL
re-discovered after the horizon passes through), the frontier
keep-latest merge stays authoritative, so correctness never depends on
streaming state surviving anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkcrawl.functions.hashing import url_sha1
from sparkcrawl.functions.urlnorm import with_canonical_host


def dedup_url_stream(
    urls_stream: DataFrame,
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    url_col: str = "url",
) -> DataFrame:
    """Canonicalize a streaming (url, ts) source and drop repeated
    canonical URLs within the watermark horizon.

    Returns (url, host, url_hash, ts) — the frontier-row precursor
    columns. Canonicalization is the SAME hybrid JVM/pandas path the
    batch engine uses (with_canonical_host works unmodified on
    streaming DataFrames: both lanes are stateless projections).
    """
    canon = (
        with_canonical_host(urls_stream, url_col=url_col)
        .filter(F.col(url_col).isNotNull())
        .withColumn("url_hash", url_sha1(F.col(url_col)))
    )
    return (
        canon.withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["url_hash"])
    )
