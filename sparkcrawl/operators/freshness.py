"""Adaptive re-crawl scheduling: per-URL change-rate estimation.

The reference's prioritizer (SURVEY C8) requeues every URL on a fixed
``delta * priority`` ladder — change frequency only enters through the
coarse 200-vs-304 priority nudge. A production crawl of 10^10 URLs
cannot afford that: most pages never change, a few change hourly, and
fetch budget spent re-crawling static pages is budget not spent on
fresh ones. The classic fix (Cho & Garcia-Molina, "Estimating
Frequency of Change", ACM TOIT 2003 — public literature) models page
changes as a Poisson process and estimates each page's change rate
from its observed fetch history, then sets the revisit interval from
the estimated rate and a target staleness probability.

Estimator (the paper's bias-corrected form for complete-change
observation): over ``n`` consecutive fetch intervals of which ``x``
showed a change,

    r_hat      = -ln((n - x + 0.5) / (n + 0.5))     # changes/interval
    lambda_hat = r_hat / mean_gap_seconds            # changes/second

Revisit interval for staleness bound ``p`` (P[changed before next
fetch] <= p under Poisson):

    revisit = -ln(1 - p) / lambda_hat                # seconds

clamped to [min_interval, max_interval]. x = 0 makes the estimator
exactly zero (the ratio is (n+0.5)/(n+0.5)); zero/negative rates mean
"no change ever observed" and map straight to the max clamp — NOT
through the division, where -0.0 would produce -inf and invert the
clamp direction.

Scale notes:
  - one shuffle total: the lag window partitions by the URL key and
    the follow-up groupBy reduces on the SAME key, so Catalyst reuses
    the exchange; the aggregation is a hash agg with map-side partial.
  - everything after the window is pure column arithmetic
    (whole-stage codegen); no UDF, no collect.
  - history depth per URL is naturally bounded by the crawl's own
    revisit ladder (a page fetched daily for a year is ~365 rows);
    for unbounded logs, pre-filter to the trailing K fetches per URL
    before calling (the estimator converges long before that).

Everything here is deterministic and SQL-expressible — the DuckDB
oracle re-derives the full estimate relationally (see
``__spark_entry__.oracle_sql()['freshness_revisit_schedule']``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def change_intervals(
    history: DataFrame,
    key: str = "url_hash",
    ts: str = "ts",
    changed: str | None = None,
    content: str | None = "content_hash",
) -> DataFrame:
    """Consecutive-fetch intervals per key: (key, gap_sec, changed).

    ``changed`` names a boolean column that already says "this fetch
    observed a change vs the previous one" (e.g. the engine's
    conditional-GET outcome: 200 = changed, 304 = unchanged). When
    absent, change is derived by comparing ``content`` (a content-hash
    column) against the previous fetch's value via a lag window.

    The first fetch of each key yields no interval (lag is NULL).
    """
    w = W.partitionBy(key).orderBy(ts)
    prev_ts = F.lag(ts).over(w)
    if changed is not None:
        chg = F.col(changed)
    else:
        chg = F.col(content) != F.lag(content).over(w)
    return (
        history.select(
            F.col(key),
            (F.unix_timestamp(ts) - F.unix_timestamp(prev_ts)).alias("gap_sec"),
            chg.alias("changed"),
        )
        .filter(F.col("gap_sec").isNotNull())
    )


def change_rates(
    intervals: DataFrame,
    key: str = "url_hash",
) -> DataFrame:
    """Per-key Poisson change-rate estimate over interval rows.

    Output: (key, n_intervals, n_changes, span_sec, lambda_per_sec).
    Keys with zero intervals (single observation) never appear —
    callers treat absence as "no estimate, keep default schedule".
    """
    n = F.count("*")
    x = F.sum(F.col("changed").cast("long"))
    span = F.sum("gap_sec")
    r_hat = -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5)))
    return (
        intervals.groupBy(key)
        .agg(
            n.alias("n_intervals"),
            x.alias("n_changes"),
            span.alias("span_sec"),
            (r_hat / (span / n)).alias("lambda_per_sec"),
        )
    )


def revisit_intervals(
    rates: DataFrame,
    target_stale_prob: float = 0.5,
    min_sec: int = 3600,
    max_sec: int = 30 * 86400,
) -> DataFrame:
    """Map each key's change rate to a clamped revisit interval.

    revisit = -ln(1 - p) / lambda, clamped to [min_sec, max_sec].
    """
    if not 0.0 < target_stale_prob < 1.0:
        raise ValueError(f"target_stale_prob must be in (0,1), got {target_stale_prob}")
    horizon = F.lit(-math.log(1.0 - target_stale_prob))
    lam = F.col("lambda_per_sec")
    raw = F.when(
        lam > 0,
        F.least(F.greatest(horizon / lam, F.lit(float(min_sec))),
                F.lit(float(max_sec))),
    ).otherwise(F.lit(float(max_sec)))  # no change ever observed
    return rates.withColumn("revisit_sec", raw.cast("long"))


def cache_control_hints(responses: DataFrame, url_col: str = "url",
                        header_col: str = "cache_control",
                        fetched_col: str = "fetched_at") -> DataFrame:
    """(url, max_age, no_cache, no_store, next_ok_us): server-declared
    revisit hints from the Cache-Control response header (RFC 9111).

    The change-rate model (:func:`revisit_intervals`) learns revisit
    periods from observed history; Cache-Control is the server TELLING
    the crawler — max-age bounds how soon a refetch can possibly show
    anything new, so an adaptive scheduler takes
    max(model_interval, max_age). Pure regexp codegen over the header
    string ((?i) case-fold works identically in Java regex and RE2);
    next_ok_us is epoch-microseconds of fetched_at + max_age, NULL when
    the header carries no max-age. no_store marks responses the WARC
    sink should skip archiving per policy.
    """
    h = F.coalesce(F.col(header_col), F.lit(""))
    max_age = F.nullif(
        F.regexp_extract(h, r"(?i)(?:^|[,\s])max-age=(\d+)", 1), F.lit("")
    ).cast("long")
    no_cache = h.rlike(r"(?i)(?:^|[,\s])no-cache(?:$|[,\s])")
    no_store = h.rlike(r"(?i)(?:^|[,\s])no-store(?:$|[,\s])")
    next_ok = F.when(
        max_age.isNotNull(),
        F.unix_micros(F.col(fetched_col).cast("timestamp"))
        + max_age * F.lit(1_000_000),
    )
    return responses.select(
        F.col(url_col).alias("url"),
        max_age.alias("max_age"),
        no_cache.alias("no_cache"),
        no_store.alias("no_store"),
        next_ok.alias("next_ok_us"),
    )


_LN3 = 1.0986122886681098


def hint_trust(
    hints: DataFrame,
    rates: DataFrame,
    key: str = "url_hash",
    host_col: str = "host",
) -> DataFrame:
    """Publisher freshness-hint trust: does a host's declared sitemap
    cadence (``changefreq`` -> ``declared_sec``, from
    extract.sitemap_entries) agree with the MEASURED Poisson change
    rate (:func:`change_rates`) once fetch history exists? "hourly"
    declarations on pages that never change are the classic crawl-bait
    pattern; a trusted host's hints can keep steering the revisit
    model, a lying host's must be dropped for measured rates.

    Per-URL log ratio = ln(measured mean interval) - ln(declared) =
    -ln(lambda) - ln(declared_sec). Per host: ``avg_log_ratio`` (the
    log of the geometric-mean ratio — kept in log space so no exp()
    crosses engines) and a trust class at the 3x band:
    ``overstates_freshness`` (avg_log_ratio > ln 3: pages change >= 3x
    slower than declared), ``understates_freshness`` (< -ln 3), else
    ``consistent``.

    ``hints``: one row per URL (key, host, declared_sec); ``rates``:
    change_rates output. URLs without a positive estimate or a
    positive declaration drop out (no estimate = no verdict). ONE
    equi-join on the URL key + one map-combinable host agg.
    """
    joined = (
        hints.select(key, F.col(host_col).alias("host"),
                     F.col("declared_sec").cast("double")
                     .alias("declared_sec"))
        .join(rates.select(key, "lambda_per_sec"), key)
        .filter((F.col("lambda_per_sec") > 0)
                & (F.col("declared_sec") > 0))
    )
    lr = -F.log("lambda_per_sec") - F.log("declared_sec")
    agg = joined.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.avg(lr).alias("_alr"),
    )
    return agg.select(
        "host", "n_urls",
        F.round("_alr", 6).alias("avg_log_ratio"),
        F.when(F.col("_alr") > _LN3, F.lit("overstates_freshness"))
        .when(F.col("_alr") < -_LN3, F.lit("understates_freshness"))
        .otherwise(F.lit("consistent")).alias("trust"),
    )


def backlink_novelty(
    edges: DataFrame,
    fetched: DataFrame,
    dst_col: str = "dst",
    discovered_col: str = "discovered_superstep",
    url_col: str = "url",
    fetched_col: str = "fetched_superstep",
    max_boost: int = 4,
) -> DataFrame:
    """Recrawl boost from NEW backlinks: inlinks discovered AFTER a
    page's last fetch are fresh evidence the page matters now
    (breaking stories, newly-canonical docs) — the link-side
    complement of the content-side Poisson change estimator
    (:func:`change_rates`): change_rates says *it changes often*, this
    says *the web just started pointing at it*.

    Per already-fetched target: (url, fetched_superstep,
    n_new_inlinks, boost) where boost = min(``max_boost``,
    floor(log2(n_new_inlinks + 1))) — computed as binary-string length
    (base-conversion, exact integer) rather than float log2, so the
    2^k boundaries can never straddle a libm ulp. Never-fetched
    targets are discovery (most_wanted's job), not recrawl, and are
    excluded by the inner join.

    Scale shape: one equi-join of the edge list against the fetched
    set on the co-partitioned url key, one filter, one map-combinable
    target agg. No window, no UDF.
    """
    e = edges.select(F.col(dst_col).alias("url"),
                     F.col(discovered_col).alias("_disc"))
    f = fetched.select(F.col(url_col).alias("url"),
                       F.col(fetched_col).alias("fetched_superstep"))
    new = e.join(f, "url").filter(
        F.col("_disc") > F.col("fetched_superstep"))
    agg = new.groupBy("url", "fetched_superstep").agg(
        F.count("*").alias("n_new_inlinks"))
    width = F.length(F.conv(
        (F.col("n_new_inlinks") + 1).cast("string"), 10, 2)) - 1
    return agg.select(
        "url", "fetched_superstep",
        F.col("n_new_inlinks").cast("bigint").alias("n_new_inlinks"),
        F.least(F.lit(max_boost), width).cast("int").alias("boost"),
    )
