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


#: Error phrases that betray a "200 OK" page that is really an error
#: lander. Deterministic word-boundary regex (Java/RE2-safe, no
#: backreferences) — matched case-insensitively against visible text.
SOFT404_PHRASES = (
    r"(?i)\bnot\s+found\b"
    r"|\berror\s*404\b|\b404\s*error\b"
    r"|(does\s+not|doesn'?t)\s+exist"
    r"|no\s+longer\s+(available|exists)"
    r"|has\s+been\s+(removed|deleted)"
)


def soft404_flags(
    pages: DataFrame,
    probes: DataFrame | None = None,
    len_tol_frac: float = 0.05,
    len_tol_abs: int = 64,
    host_col: str = "host",
    status_col: str = "status",
    body_len_col: str = "body_len",
    text_col: str = "text",
) -> DataFrame:
    """Soft-404 detection: pages that answer ``200 OK`` but are really
    error landers — they poison dedup (thousands of identical "not
    found" bodies), waste extraction, and corrupt link-graph signals
    (a soft-404 hub looks like real content). Two public signals,
    combined per the probe method of Bar-Yossef, Broder, Kumar &
    Tomkins, "Sic Transit Gloria Telae" (WWW 2004):

    - ``phrase_match``: visible text matches :data:`SOFT404_PHRASES`
      (one codegen ``rlike`` — no UDF).
    - ``len_match``: body length falls inside the tolerance window of
      the host's error-probe fingerprint (``probes`` = small
      (host, probe_len) table from fetching one known-random URL per
      host; the WWW 2004 trick). Window = max(``len_tol_abs``,
      ``len_tol_frac`` * probe_len). Hosts without a probe never
      length-match.
    - ``soft404`` = status 200 AND (phrase OR length) — real 404s are
      already routed by outcome and must not be double-counted.

    Scale shape: one projection over the fetch slice plus ONE
    broadcast left join against the |hosts|-sized probe dimension; no
    shuffle on the page table, no Python.
    """
    phrase = F.coalesce(F.col(text_col).rlike(SOFT404_PHRASES), F.lit(False))
    out = pages
    if probes is not None:
        out = out.join(
            F.broadcast(probes.select(
                F.col(host_col).alias("__ph"), "probe_len")),
            F.col(host_col) == F.col("__ph"), "left",
        ).drop("__ph")
    else:
        out = out.withColumn("probe_len", F.lit(None).cast("long"))
    tol = F.greatest(
        F.lit(float(len_tol_abs)), F.lit(len_tol_frac) * F.col("probe_len"))
    len_match = F.coalesce(
        F.abs(F.col(body_len_col) - F.col("probe_len")) <= tol, F.lit(False))
    return out.select(
        F.col(host_col).alias("host"),
        *([F.col("url")] if "url" in pages.columns else []),
        F.col(status_col).alias("status"),
        F.col(body_len_col).cast("bigint").alias("body_len"),
        phrase.alias("phrase_match"),
        len_match.alias("len_match"),
        ((F.col(status_col) == 200) & (phrase | len_match)).alias("soft404"),
    )


def retry_after_schedule(
    responses: DataFrame,
    now,
    host_col: str = "host",
    status_col: str = "status",
    header_col: str = "retry_after",
) -> DataFrame:
    """Retry-After compliance (RFC 9110 §10.2.3): a 429/503 carrying
    Retry-After is the server TELLING the crawler its politeness
    floor — ignoring it is how crawlers get IP-banned. Both header
    forms are honored JVM-side: delta-seconds (digit string) and the
    IMF-fixdate HTTP-date. Per host, the LATEST instant wins (multiple
    signals = the most conservative one), emitted as epoch
    microseconds so it joins the frontier's integer-time eligibility
    lane (F6) directly: (host, n_signals, retry_until_us).

    Only 429/503 rows count (a 200 with a stray Retry-After is
    noise), and only parseable headers count as signals. ONE
    projection (regexp + try_to_timestamp, no UDF) + one
    map-combinable host agg.
    """
    h = F.col(header_col)
    status_ok = F.col(status_col).isin(429, 503)
    now_us = F.lit(int(now.timestamp() * 1_000_000))
    secs = F.when(h.rlike(r"^\d{1,9}$"), h.cast("long"))
    # Spark's post-3.0 parser refuses day-of-week fields in PARSE
    # patterns, so the IMF-fixdate weekday prefix is stripped first
    # (it is redundant with the date anyway)
    dt = F.try_to_timestamp(
        F.regexp_replace(h, r"^[A-Za-z]{3}, ", ""),
        F.lit("dd MMM yyyy HH:mm:ss 'GMT'"))
    until_us = F.when(secs.isNotNull(),
                      now_us + secs * F.lit(1_000_000)) \
        .otherwise(F.unix_micros(dt))
    sig = (
        responses.filter(status_ok & h.isNotNull())
        .select(F.col(host_col).alias("host"), until_us.alias("u"))
        .filter(F.col("u").isNotNull())
    )
    return sig.groupBy("host").agg(
        F.count("*").alias("n_signals"),
        F.max("u").alias("retry_until_us"),
    )


def latency_anomalies(
    fetch_log: DataFrame,
    k: float = 5.0,
    mad_floor_ms: float = 1.0,
    host_col: str = "host",
    step_col: str = "superstep",
    latency_col: str = "latency_ms",
) -> DataFrame:
    """Robust per-host latency anomaly detection — median/MAD instead
    of mean/stddev (a crawl's latency history is exactly the
    heavy-tailed data that breaks z-scores; Leys et al. 2013 is the
    standard citation for MAD-based outlier rules). A flagged
    (host, superstep) is a host incident — origin overload, rate
    limiting kicking in, a network path change — that should pause
    adaptive-politeness tightening for that host rather than be
    averaged into it.

    Rows whose |latency - median| > ``k`` * max(MAD, ``mad_floor_ms``)
    are returned with their robust z-score. The floor keeps a host
    with near-constant latency (MAD ~ 0) from flagging micro-jitter.

    Scale shape: two exact-median host aggs (F.median — the
    approx_percentile swap-in applies at 100 TB, same trade as
    adaptive_politeness) with broadcast joins back on the |hosts|-
    sized dimension; one final filter. No window, no UDF.
    """
    x = F.col(latency_col).cast("double")
    base = fetch_log.select(F.col(host_col).alias("host"),
                            F.col(step_col).alias("superstep"),
                            x.alias("lat"))
    med = base.groupBy("host").agg(F.median("lat").alias("med"))
    j1 = base.join(F.broadcast(med), "host")
    mad = j1.groupBy("host").agg(
        F.median(F.abs(F.col("lat") - F.col("med"))).alias("mad"))
    j2 = j1.join(F.broadcast(mad), "host")
    eff = F.greatest(F.col("mad"), F.lit(float(mad_floor_ms)))
    z = (F.col("lat") - F.col("med")) / eff
    return (
        j2.filter(F.abs(F.col("lat") - F.col("med")) > k * eff)
        .select(
            "host", "superstep",
            F.col("lat").alias("latency_ms"),
            F.round(F.col("med"), 6).alias("median_ms"),
            F.round(F.col("mad"), 6).alias("mad_ms"),
            F.round(z, 6).alias("robust_z"),
        )
    )
