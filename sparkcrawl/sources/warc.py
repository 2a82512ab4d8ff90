"""WARC archive source + sink (ISO 28500 / WARC 1.0, the public
web-archive format Common-Crawl-style corpora ship in).

The crawl engine's fetch log is relational; real crawl pipelines also
need the archival interchange surface: EXPORT fetched pages as WARC
response records, and INGEST third-party WARC shards into the same
documents pipeline the live crawler feeds. Both directions here are
Spark-native:

  - ``write_warc``: one ``.warc`` (or ``.warc.gz``) shard per input
    partition, written inside ``mapInPandas`` — the per-partition
    iterator spans all Arrow batches, so each task streams its records
    into a single shard and emits ONE manifest row (path, n_records,
    n_bytes). The write is therefore an ordinary action with an audit
    trail, and shard count == partition count (callers size shards via
    ``repartition``, the same knob as every other sink). A production
    deployment points ``out_dir`` at shared storage; the record
    serialization is identical.
  - ``read_warc``: ``binaryFile`` scan -> per-file record parse in
    ``mapInPandas``. WARC shards are conventionally ~1 GB, i.e. one
    file = one task = one row of ``binaryFile`` — the parse is a
    streaming scan over that buffer, never a per-record Python loop
    over Spark rows. Gzip shards (concatenated members, the warc.gz
    convention) decompress via GzipFile, which consumes all members.

Record framing (public spec): ``WARC/1.0\\r\\n`` + headers +
``\\r\\n`` + Content-Length payload bytes + ``\\r\\n\\r\\n``.
Response records wrap the HTTP response (status line + headers +
body) as ``application/http;msgtype=response``. Record IDs are
deterministic (md5 of target URI + date) so export is replay-stable —
re-running the job yields byte-identical shards, matching the repo's
exactly-once story (T5).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_VERSION = b"WARC/1.0"

#: columns produced by :func:`read_warc`
WARC_READ_SCHEMA = (
    "warc_type string, record_id string, refers_to string, "
    "warc_date string, "
    "target_uri string, content_length long, http_status int, "
    "http_content_type string, http_location string, body binary, "
    "filename string, offset long"
)

_MANIFEST_SCHEMA = "path string, n_records long, n_bytes long"

_REASONS = {200: "OK", 301: "Moved Permanently", 304: "Not Modified",
            404: "Not Found", 500: "Internal Server Error"}


def _response_record(url: str, date: str, status: int,
                     content_type: str | None, body: bytes,
                     location: str | None = None) -> bytes:
    """One WARC response record wrapping an HTTP response payload."""
    reason = _REASONS.get(status, "")
    loc = f"Location: {location}\r\n" if location else ""
    http = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type or 'application/octet-stream'}\r\n"
        f"{loc}"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body
    rid = hashlib.md5(f"{url}|{date}".encode()).hexdigest()
    headers = (
        WARC_VERSION + b"\r\n"
        + f"WARC-Type: response\r\n"
          f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
          f"WARC-Date: {date}\r\n"
          f"WARC-Target-URI: {url}\r\n"
          f"Content-Type: application/http;msgtype=response\r\n"
          f"Content-Length: {len(http)}\r\n\r\n".encode("ascii")
    )
    return headers + http + b"\r\n\r\n"


#: WARC-Profile URI for digest-based revisit records (public spec value)
REVISIT_PROFILE = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"


def _revisit_record(url: str, date: str, refers_to: str,
                    digest: str | None) -> bytes:
    """A body-less WARC revisit record: this capture's payload is
    byte-identical to the record named by WARC-Refers-To, so the
    archive stores a pointer instead of the bytes (ISO 28500 §6.7.2,
    the Internet Archive's storage-dedup mechanism)."""
    rid = hashlib.md5(f"{url}|{date}".encode()).hexdigest()
    dig = f"WARC-Payload-Digest: sha1:{digest}\r\n" if digest else ""
    return (
        WARC_VERSION + b"\r\n"
        + f"WARC-Type: revisit\r\n"
          f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
          f"WARC-Refers-To: <{refers_to}>\r\n"
          f"WARC-Profile: {REVISIT_PROFILE}\r\n"
          f"WARC-Date: {date}\r\n"
          f"WARC-Target-URI: {url}\r\n"
          f"{dig}"
          f"Content-Length: 0\r\n\r\n".encode("ascii")
        + b"\r\n\r\n"
    )


def mark_revisits(df: DataFrame, url_col: str = "url",
                  body_col: str = "body",
                  date_col: str = "fetched_at") -> DataFrame:
    """Add ``payload_digest`` (sha1 of the body) and ``revisit_of``
    (record id of the FIRST capture with the same (url, digest); NULL
    for first/unique captures) — the input to ``write_warc``'s
    revisit-record path.

    Scale shape: one ``groupBy(url, digest).agg(min(date))`` hash
    aggregation (map-side combine, 40-byte keys) plus an equi-join
    back — no window, no driver-side state. The refers-to id is
    computed RELATIONALLY as md5(url|first_date) because record ids
    are deterministic functions of (url, date): marking revisits
    never needs to read the archive being written.
    """
    from pyspark.sql import functions as F

    body_bin = F.coalesce(F.col(body_col).cast("binary"),
                          F.lit(b""))
    digest = F.sha1(body_bin)
    # min over epoch SECONDS (long), not the formatted string: min(long)
    # stays a HashAggregate with map-side combine (min(string) falls
    # back to SortAggregate), and second-truncation matches the record
    # id's date_format truncation exactly.
    cap_sec = F.col(date_col).cast("timestamp").cast("long")
    with_dig = df.withColumn("payload_digest", digest) \
                 .withColumn("_cap_sec", cap_sec)
    firsts = (
        with_dig.groupBy(F.col(url_col).alias("_u"),
                         F.col("payload_digest").alias("_d"))
        .agg(F.min("_cap_sec").alias("_first_sec"))
    )
    first_date = F.date_format(F.col("_first_sec").cast("timestamp"),
                               "yyyy-MM-dd'T'HH:mm:ss'Z'")
    out = (
        with_dig.join(
            firsts,
            (F.col(url_col) == F.col("_u"))
            & (F.col("payload_digest") == F.col("_d")),
        )
        .withColumn(
            "revisit_of",
            F.when(
                F.col("_cap_sec") > F.col("_first_sec"),
                F.concat(
                    F.lit("urn:md5:"),
                    F.md5(F.concat(F.col(url_col), F.lit("|"), first_date)),
                ),
            ),
        )
        .drop("_u", "_d", "_first_sec", "_cap_sec")
    )
    return out


def write_warc(
    df: DataFrame,
    out_dir: str,
    compress: bool = False,
    url_col: str = "url",
    status_col: str = "status_code",
    ctype_col: str = "content_type",
    body_col: str = "body",
    date_col: str | None = "fetched_at",
    location_col: str | None = "location",
) -> DataFrame:
    """Export fetch rows as WARC response shards; returns the manifest
    DataFrame (path, n_records, n_bytes), one row per shard. Rows with
    NULL status (connection errors) are skipped — they have no HTTP
    response to archive."""
    from pyspark import TaskContext
    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    cols = [F.col(url_col).alias("url"),
            F.col(status_col).alias("status"),
            F.col(ctype_col).alias("ctype"),
            F.col(body_col).alias("body")]
    if date_col and date_col in df.columns:
        cols.append(F.date_format(F.col(date_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
                    .alias("date"))
    else:
        cols.append(F.lit("1970-01-01T00:00:00Z").alias("date"))
    if location_col and location_col in df.columns:
        cols.append(F.col(location_col).alias("location"))
    else:
        cols.append(F.lit(None).cast("string").alias("location"))
    # revisit path: rows pre-marked by mark_revisits() export as
    # body-less pointer records (ISO 28500 identical-payload-digest)
    if "revisit_of" in df.columns:
        cols.append(F.col("revisit_of"))
        cols.append(F.col("payload_digest") if "payload_digest"
                    in df.columns else F.lit(None).cast("string")
                    .alias("payload_digest"))
    else:
        cols.append(F.lit(None).cast("string").alias("revisit_of"))
        cols.append(F.lit(None).cast("string").alias("payload_digest"))
    flat = df.select(*cols).filter(F.col("status").isNotNull())

    suffix = ".warc.gz" if compress else ".warc"

    def _write(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{suffix}")
        n = 0
        raw = io.BytesIO()
        sink = gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) if compress else raw
        for pdf in batches:
            for url, status, ctype, body, date, loc, rev, dig in zip(
                pdf["url"], pdf["status"], pdf["ctype"], pdf["body"],
                pdf["date"], pdf["location"], pdf["revisit_of"],
                pdf["payload_digest"],
            ):
                date = date or "1970-01-01T00:00:00Z"
                if rev is not None and rev == rev:
                    sink.write(_revisit_record(
                        url, date, rev,
                        None if (dig is None or dig != dig) else dig))
                else:
                    payload = (body or "").encode("utf-8") \
                        if isinstance(body, str) else bytes(body or b"")
                    sink.write(_response_record(
                        url, date, int(status), ctype, payload,
                        None if (loc is None or loc != loc) else loc))
                n += 1
        if compress:
            sink.close()
        data = raw.getvalue()
        if n:
            with open(path, "wb") as f:
                f.write(data)
            yield pd.DataFrame({"path": [path], "n_records": [n],
                                "n_bytes": [len(data)]})

    return flat.mapInPandas(_write, schema=_MANIFEST_SCHEMA)


def _parse_warc_bytes(buf: bytes) -> Iterator[tuple]:
    """Stream records out of one WARC shard buffer. Each record carries
    its start offset in the (decompressed) shard stream — the CDX
    locator. (Classic warc.gz CDX stores per-member compressed offsets;
    our shards are single-member streams, so the logical offset is the
    seekable coordinate and is documented as such in ``cdx_index``.)"""
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.GzipFile(fileobj=io.BytesIO(buf)).read()
    i, n = 0, len(buf)
    while i < n:
        # skip inter-record padding
        while i < n and buf[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if i >= n:
            break
        if not buf.startswith(b"WARC/", i):
            break  # trailing garbage: stop rather than loop
        rec_start = i
        hdr_end = buf.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in buf[i:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers.get("content-length", "0"))
        payload = buf[hdr_end + 4 : hdr_end + 4 + clen]
        i = hdr_end + 4 + clen
        http_status, http_ctype, http_loc, body = None, None, None, payload
        if headers.get("content-type", "").startswith("application/http"):
            he = payload.find(b"\r\n\r\n")
            if he >= 0:
                lines = payload[:he].split(b"\r\n")
                parts = lines[0].split(b" ", 2)
                if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
                    try:
                        http_status = int(parts[1])
                    except ValueError:
                        http_status = None
                for line in lines[1:]:
                    k, _, v = line.decode("utf-8", "replace").partition(":")
                    k = k.strip().lower()
                    if k == "content-type":
                        http_ctype = v.strip()
                    elif k == "location":
                        http_loc = v.strip()
                body = payload[he + 4 :]
        rid = headers.get("warc-record-id", "")
        refers = headers.get("warc-refers-to")
        yield (
            headers.get("warc-type", ""),
            rid.strip("<>"),
            refers.strip("<>") if refers else None,
            headers.get("warc-date", ""),
            headers.get("warc-target-uri", ""),
            clen,
            http_status,
            http_ctype,
            http_loc,
            body,
            rec_start,
        )


def ingest_warc_documents(spark: SparkSession, path: str, cfg=None) -> DataFrame:
    """Third-party WARC shards -> the engine's interleaved documents
    table (doc_id, spans) plus a ``links`` column: the Common-Crawl
    ingest path. Response records are adapted to the fetch-row shape
    (binary body UTF-8 decoded via cast) and run through the SAME
    extractor the live crawler uses (C3/C5 parser, limiter, sitemap
    routing), so archived and live content yield row-identical spans.
    """
    from pyspark.sql import functions as F

    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.operators.extract import extract_links_and_spans

    cfg = cfg or CrawlConfig()
    fetch_rows = (
        read_warc(spark, path)
        .filter((F.col("warc_type") == "response") & F.col("http_status").isNotNull())
        .select(
            F.col("target_uri").alias("url"),
            F.col("http_status").cast("int").alias("status_code"),
            F.col("http_content_type").alias("content_type"),
            F.col("http_location").alias("location"),
            F.col("body").cast("string").alias("body"),
        )
    )
    # extracted already carries url+links+spans: a single narrow select
    # (no self-join shuffle) projects the documents shape.
    extracted = extract_links_and_spans(fetch_rows, cfg)
    return (
        extracted.filter(~F.col("extraction_finished"))
        .select(F.col("url").alias("doc_id"), "spans", "links")
    )


def cdx_index(spark: SparkSession, path: str,
              num_partitions: int | None = None) -> DataFrame:
    """Build a CDX-style archive index over WARC shards — the public
    lookup format archive consumers (Internet Archive / Common Crawl
    CDXJ) use to locate a record without scanning shards.

    Columns: (urlkey, timestamp, original, mime, status, digest,
    length, offset, filename). ``urlkey`` is the SURT transform
    (functions/surt.py — pure column expressions, no UDF), ``timestamp``
    the 14-digit capture time, ``digest`` sha1-hex of the bare payload,
    ``offset`` the record's start offset in the decompressed shard
    stream. Rows come back range-partitioned and sorted by
    (urlkey, timestamp) — the CDX sort order — so each output partition
    is a valid, independently queryable index shard; at 10^10 records
    the range partitioner keeps one host's captures co-located without
    any global sort on the driver.
    """
    from pyspark.sql import functions as F

    from sparkcrawl.functions.surt import surt_urlkey

    idx = (
        read_warc(spark, path)
        .filter((F.col("warc_type") == "response")
                & F.col("http_status").isNotNull())
        .select(
            surt_urlkey(F.col("target_uri")).alias("urlkey"),
            F.date_format(
                F.to_timestamp(F.col("warc_date"),
                               "yyyy-MM-dd'T'HH:mm:ss'Z'"),
                "yyyyMMddHHmmss").alias("timestamp"),
            F.col("target_uri").alias("original"),
            F.col("http_content_type").alias("mime"),
            F.col("http_status").alias("status"),
            F.sha1(F.col("body")).alias("digest"),
            F.col("content_length").alias("length"),
            F.col("offset"),
            F.col("filename"),
        )
    )
    if num_partitions:
        idx = idx.repartitionByRange(num_partitions, "urlkey", "timestamp")
    return idx.sortWithinPartitions("urlkey", "timestamp")


def cdx_latest(index: DataFrame, urls: DataFrame, url_col: str = "url",
               at: str | None = None) -> DataFrame:
    """For each lookup URL, its most recent capture in a CDX index —
    optionally at-or-before a 14-digit ``at`` timestamp (the wayback
    "closest before" query). SURT-key equi-join + ``max_by`` hash
    argmax (the repo's standard pattern, operators/dedup.py:39): no
    window, map-side combine, and a small lookup set broadcasts
    automatically. URL variants (www / param order / case) hit the
    same urlkey, so a lookup finds captures of equivalent URLs too.
    """
    from pyspark.sql import functions as F

    from sparkcrawl.functions.surt import surt_urlkey

    keyed = urls.select(F.col(url_col).alias("_lookup_url"),
                        surt_urlkey(F.col(url_col)).alias("urlkey"))
    j = keyed.join(index, "urlkey")
    if at is not None:
        j = j.filter(F.col("timestamp") <= at)
    cap = F.struct("timestamp", "original", "mime", "status", "digest",
                   "length", "offset", "filename")
    return (
        j.groupBy("_lookup_url", "urlkey")
        .agg(F.max_by(cap, F.col("timestamp")).alias("_c"))
        .select(F.col("_lookup_url").alias(url_col), "urlkey", "_c.*")
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Ingest WARC shards: (warc_type, record_id, warc_date, target_uri,
    content_length, http_status, http_content_type, http_location,
    body). Response records surface the inner HTTP status/content-type/
    Location and the bare body; other record kinds carry their raw
    payload."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [rec[:-1] + (os.path.basename(fpath), rec[-1])
                    for fpath, content in zip(pdf["path"], pdf["content"])
                    for rec in _parse_warc_bytes(bytes(content))]
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["warc_type", "record_id", "refers_to",
                             "warc_date",
                             "target_uri", "content_length", "http_status",
                             "http_content_type", "http_location", "body",
                             "filename", "offset"],
                )

    return files.mapInPandas(_parse, schema=WARC_READ_SCHEMA)


def _conversion_record(url: str, date: str, text: bytes) -> bytes:
    """A WET-style WARC conversion record (ISO 28500 §6.8): the plain
    text EXTRACTED from a crawled page — what Common Crawl ships as
    .wet files. Record id is derived like the response records so a
    conversion can be correlated with its source capture."""
    rid = hashlib.md5(f"{url}|{date}|conversion".encode()).hexdigest()
    src = hashlib.md5(f"{url}|{date}".encode()).hexdigest()
    return (
        WARC_VERSION + b"\r\n"
        + f"WARC-Type: conversion\r\n"
          f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
          f"WARC-Refers-To: <urn:md5:{src}>\r\n"
          f"WARC-Date: {date}\r\n"
          f"WARC-Target-URI: {url}\r\n"
          f"Content-Type: text/plain\r\n"
          f"Content-Length: {len(text)}\r\n\r\n".encode("ascii")
        + text + b"\r\n\r\n"
    )


def write_wet(
    docs_spans: DataFrame,
    out_dir: str,
    compress: bool = False,
    date_col: str | None = None,
) -> DataFrame:
    """WET export: interleaved-span documents -> WARC conversion-record
    shards holding the extracted PLAIN TEXT only (media refs dropped) —
    the text-pipeline interchange format next to the full archive
    (write_warc). Returns the same (path, n_records, n_bytes) manifest.

    Shape: spans flatten to text inside a codegen projection
    (spans_to_text's array_join — no explode); one shard per partition
    inside mapInPandas, identical to write_warc, so a repartition(N)
    upstream chooses the shard count. Deterministic record ids ->
    byte-identical re-export, same as the response shards."""
    from pyspark import TaskContext
    import pandas as pd
    from pyspark.sql import functions as F

    from sparkcrawl.operators.textops import spans_to_text

    os.makedirs(out_dir, exist_ok=True)
    flat = spans_to_text(docs_spans).withColumnRenamed("doc_id", "url")
    if date_col and date_col in docs_spans.columns:
        flat = flat.join(
            docs_spans.select(
                F.col("doc_id").alias("url"),
                F.date_format(F.col(date_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
                .alias("date"),
            ),
            "url",
        )
    else:
        flat = flat.withColumn("date", F.lit("1970-01-01T00:00:00Z"))
    suffix = ".warc.wet.gz" if compress else ".warc.wet"

    def _write(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{suffix}")
        n = 0
        raw = io.BytesIO()
        sink = gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) if compress else raw
        for pdf in batches:
            for url, text, date in zip(pdf["url"], pdf["text"], pdf["date"]):
                sink.write(_conversion_record(
                    url, date or "1970-01-01T00:00:00Z",
                    (text or "").encode("utf-8")))
                n += 1
        if compress:
            sink.close()
        data = raw.getvalue()
        if n:
            with open(path, "wb") as f:
                f.write(data)
            yield pd.DataFrame({"path": [path], "n_records": [n],
                                "n_bytes": [len(data)]})

    return flat.select("url", "text", "date").mapInPandas(
        _write, schema=_MANIFEST_SCHEMA
    )
