"""Fetch stage — S4/J4 (SURVEY §2.1, §2.3).

The reference fetches with tornado's AsyncHTTPClient, bounded
concurrency, ``follow_redirects=False``, conditional-GET headers
(If-Modified-Since from mod_date, If-None-Match from etag)
(src/spyder/processor/fetcher.py::FetchProcessor).

Two implementations behind one interface:

  - :func:`synthetic_fetch` — sandbox path: an equi broadcast join of
    the fetch batch against the deterministic ``web`` fixture table.
    Conditional-GET is honored relationally: request etag == page etag
    -> 304 with no body (the reference sends If-None-Match and the
    server answers 304).
  - :func:`http_fetch` — real-cluster path: ``mapInPandas`` with a
    thread pool per executor + an executor-local DNS cache (S5 analog).
    Network egress does not exist in this sandbox, so it is import-
    gated and unit-tested only for plumbing (batch shape, schema).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkcrawl.config import CrawlConfig

FETCH_SCHEMA_ADD = [
    T.StructField("status_code", T.IntegerType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("location", T.StringType(), True),
    T.StructField("rep_etag", T.StringType(), True),
    T.StructField("rep_last_modified", T.TimestampType(), True),
    T.StructField("body", T.StringType(), True),
]


def http_date(dt) -> str:
    """C7: RFC-1123 wire format for If-Modified-Since — stdlib
    ``email.utils.format_datetime(usegmt=True)``, the same serde family
    the reference uses (src/spyder/processor/fetcher.py builds the
    conditional-GET headers; src/spyder/time.py serializes HTTP dates).
    Naive timestamps are pinned to UTC (parquet NTZ, UTC session)."""
    from datetime import timezone as _tz
    from email.utils import format_datetime

    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_tz.utc)
    return format_datetime(dt, usegmt=True)


def parse_http_date(s: str | None):
    """C7: parse a Last-Modified / RFC-1123 header; None on garbage
    (the reference tolerates unparseable server dates)."""
    from email.utils import parsedate_to_datetime

    try:
        return parsedate_to_datetime(s) if s else None
    except (TypeError, ValueError):
        return None


@F.pandas_udf(T.StringType())
def http_date_udf(ts: pd.Series) -> pd.Series:
    """Vectorized C7 formatter (oracle surface for the engine serde)."""
    return ts.map(lambda d: None if pd.isna(d) else http_date(d.to_pydatetime()))


@F.pandas_udf(T.TimestampType())
def parse_http_date_udf(s: pd.Series) -> pd.Series:
    """Vectorized C7 parser (tz-aware UTC; session TZ is UTC)."""
    return s.map(parse_http_date)


def synthetic_fetch(batch: DataFrame, web: DataFrame) -> DataFrame:
    """J4: fetch batch ⋈ web fixture on url (broadcast the batch side
    when small, else plain equi-join that AQE plans).

    Semantics:
      - URL not in the fixture -> connection error (status NULL,
        handled as server_error/backoff by T4).
      - request etag matches page etag -> 304, no body (conditional GET).
    """
    web_r = web.select(
        F.col("url"),
        F.col("status_code").alias("_w_status"),
        F.col("content_type").alias("_w_ctype"),
        F.col("location").alias("_w_location"),
        F.col("etag").alias("_w_etag"),
        F.col("last_modified").alias("_w_lastmod"),
        F.col("body").alias("_w_body"),
    )
    joined = batch.join(web_r, "url", "left")
    not_modified = (
        F.col("etag").isNotNull()
        & F.col("_w_etag").isNotNull()
        & (F.col("etag") == F.col("_w_etag"))
        & (F.col("_w_status") == 200)
    )
    return (
        joined.withColumn(
            "status_code",
            F.when(not_modified, F.lit(304)).otherwise(F.col("_w_status")).cast("int"),
        )
        .withColumn("content_type", F.col("_w_ctype"))
        .withColumn("location", F.col("_w_location"))
        .withColumn("rep_etag", F.col("_w_etag"))
        .withColumn("rep_last_modified", F.col("_w_lastmod"))
        .withColumn("body", F.when(not_modified, F.lit(None)).otherwise(F.col("_w_body")))
        .drop("_w_status", "_w_ctype", "_w_location", "_w_etag", "_w_lastmod", "_w_body")
    )


def http_fetch(
    batch: DataFrame,
    cfg: CrawlConfig,
    max_concurrency: int = 16,
    timeout_s: float = 30.0,
    _transport=None,
) -> DataFrame:
    """Real HTTP fetch via mapInPandas + per-executor thread pool.

    ``_transport(url, headers) -> (status, headers_dict, body)`` is
    injectable for tests; the default uses urllib (stdlib) since no
    third-party HTTP client is assumed. Executor-local DNS caching is
    delegated to the OS resolver in the stdlib path (S5's DnsCache is
    an artifact of pycurl; documented, not replicated).
    """
    out_schema = T.StructType(list(batch.schema.fields) + FETCH_SCHEMA_ADD)

    def _fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        transport = _transport or _urllib_transport(timeout_s, cfg.user_agent)

        def one(row) -> dict:
            headers = {}
            if row.etag and not pd.isna(row.etag):
                headers["If-None-Match"] = row.etag
            if row.mod_date is not None and not pd.isna(row.mod_date):
                # parquet NTZ timestamps arrive naive (UTC session)
                headers["If-Modified-Since"] = http_date(row.mod_date.to_pydatetime())
            try:
                status, rep_headers, body = transport(row.url, headers)
            except Exception:
                return dict(status_code=None, content_type=None, location=None,
                            rep_etag=None, rep_last_modified=None, body=None)
            lm = parse_http_date(rep_headers.get("Last-Modified"))
            return dict(
                status_code=status,
                content_type=rep_headers.get("Content-Type"),
                location=rep_headers.get("Location"),
                rep_etag=rep_headers.get("ETag"),
                rep_last_modified=lm,
                body=body,
            )

        for pdf in batches:
            with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
                results = list(pool.map(one, pdf.itertuples()))
            res = pd.DataFrame(results, index=pdf.index)
            yield pd.concat([pdf, res], axis=1)

    return batch.mapInPandas(_fetch_batches, schema=out_schema)


class DnsCache:
    """Executor-local LRU+TTL resolver cache (S5, reference DnsCache
    analog): a 1000-executor crawl fetching politeness batches would
    otherwise hammer the resolver with one lookup per request to the
    same few hosts. Keyed on the full getaddrinfo signature; injectable
    resolver/clock for tests."""

    def __init__(self, resolver=None, maxsize: int = 1024, ttl_s: float = 300.0,
                 clock=None):
        import socket
        import time
        from collections import OrderedDict

        self._resolver = resolver or socket.getaddrinfo
        self._clock = clock or time.monotonic
        self.maxsize = maxsize
        self.ttl_s = ttl_s
        self._cache: "OrderedDict" = OrderedDict()
        self.hits = 0
        self.misses = 0

    def getaddrinfo(self, host, port, family=0, type=0, proto=0, flags=0):
        key = (host, port, family, type, proto, flags)
        now = self._clock()
        entry = self._cache.get(key)
        if entry is not None and now - entry[0] <= self.ttl_s:
            self._cache.move_to_end(key)
            self.hits += 1
            return entry[1]
        result = self._resolver(host, port, family, type, proto, flags)
        self.misses += 1
        self._cache[key] = (now, result)
        self._cache.move_to_end(key)
        while len(self._cache) > self.maxsize:
            self._cache.popitem(last=False)
        return result

    def install(self) -> None:
        """Route this process's socket.getaddrinfo through the cache
        (the wrapper is transparent on miss). First installer wins —
        never stacks a second cache over an installed one."""
        import socket

        if getattr(socket, "_sparkcrawl_dns_cache", None) is None:
            socket.getaddrinfo = self.getaddrinfo
            socket._sparkcrawl_dns_cache = self


def _install_dns_cache() -> DnsCache:
    """Module-level singleton per python worker process."""
    global _DNS_CACHE
    if _DNS_CACHE is None:
        _DNS_CACHE = DnsCache()
        _DNS_CACHE.install()
    return _DNS_CACHE


_DNS_CACHE: DnsCache | None = None


def _urllib_transport(timeout_s: float, user_agent: str):
    import urllib.request

    _install_dns_cache()  # executor-local; idempotent per worker

    def transport(url: str, headers: dict) -> tuple[int, dict, str | None]:
        req = urllib.request.Request(url, headers={"User-Agent": user_agent, **headers})
        # follow_redirects=False parity: redirects surface as 3xx rows
        class NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, *a, **kw):
                return None

        opener = urllib.request.build_opener(NoRedirect)
        try:
            with opener.open(req, timeout=timeout_s) as resp:
                return resp.status, dict(resp.headers), resp.read().decode(
                    "utf-8", errors="replace"
                )
        except urllib.error.HTTPError as e:  # 3xx/4xx/5xx come through here
            return e.code, dict(e.headers), None

    return transport
