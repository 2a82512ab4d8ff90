"""WARC source/sink: roundtrip, error-row skip, deterministic shards."""

import os

from pyspark.sql import functions as F

from sparkcrawl.sources.warc import read_warc, write_warc


ROWS = [
    ("http://a.example/p1", 200, "text/html", "<html>hello world</html>",
     "2026-01-01 00:00:00"),
    ("http://a.example/p2", 404, "text/html", "", "2026-01-01 00:00:01"),
    ("http://b.example/x", 200, "text/plain", "plain text with ümlaut",
     "2026-01-01 00:00:02"),
    ("http://b.example/err", None, None, None, "2026-01-01 00:00:03"),
]


def _fetch_df(spark):
    return spark.createDataFrame(
        ROWS, ["url", "status_code", "content_type", "body", "fetched_at"]
    ).withColumn("fetched_at", F.to_timestamp("fetched_at"))


def test_warc_roundtrip(spark, tmp_path):
    """write -> read returns every archivable row with HTTP fields and
    the exact body; the NULL-status connection error is skipped."""
    for compress, glob in ((False, "*.warc"), (True, "*.warc.gz")):
        out = str(tmp_path / f"w{int(compress)}")
        man = write_warc(_fetch_df(spark).repartition(2), out,
                         compress=compress).collect()
        assert sum(r["n_records"] for r in man) == 3
        assert all(r["n_bytes"] > 0 and os.path.exists(r["path"]) for r in man)
        back = read_warc(spark, f"{out}/{glob}")
        got = sorted(
            (r["target_uri"], r["http_status"], r["http_content_type"],
             bytes(r["body"]).decode("utf-8"), r["warc_type"])
            for r in back.collect()
        )
        assert got == [
            ("http://a.example/p1", 200, "text/html",
             "<html>hello world</html>", "response"),
            ("http://a.example/p2", 404, "text/html", "", "response"),
            ("http://b.example/x", 200, "text/plain",
             "plain text with ümlaut", "response"),
        ]


def test_warc_export_is_deterministic(spark, tmp_path):
    """Re-running the export yields byte-identical shards (stable record
    IDs + fixed gzip mtime): the replay-stable sink story (T5)."""
    digests = []
    for attempt in range(2):
        out = str(tmp_path / f"d{attempt}")
        write_warc(_fetch_df(spark).repartition(2, "url"), out,
                   compress=True).collect()
        shard_bytes = b"".join(
            open(os.path.join(out, f), "rb").read()
            for f in sorted(os.listdir(out))
        )
        digests.append(shard_bytes)
    assert digests[0] == digests[1]


def test_warc_date_header(spark, tmp_path):
    out = str(tmp_path / "dates")
    write_warc(_fetch_df(spark), out).collect()
    back = {r["target_uri"]: r["warc_date"]
            for r in read_warc(spark, f"{out}/*.warc").collect()}
    assert back["http://a.example/p1"] == "2026-01-01T00:00:00Z"


def test_warc_location_roundtrip(spark, tmp_path):
    """3xx Location headers survive export -> ingest (C4 redirect
    fidelity for archived content)."""
    df = _fetch_df(spark).withColumn(
        "location",
        F.when(F.col("url") == "http://a.example/p2",
               F.lit("http://a.example/p3")),
    ).withColumn("status_code",
                 F.when(F.col("url") == "http://a.example/p2", 301)
                  .otherwise(F.col("status_code")))
    out = str(tmp_path / "loc")
    write_warc(df, out).collect()
    back = {r["target_uri"]: r["http_location"]
            for r in read_warc(spark, f"{out}/*.warc").collect()}
    assert back["http://a.example/p2"] == "http://a.example/p3"
    assert back["http://a.example/p1"] is None


def test_ingest_warc_documents(spark, tmp_path):
    """Archived shards run through the SAME extractor as live fetches:
    parseable HTML yields (doc_id, spans, links); non-documents
    (404s, plain text past the limiter) yield no document row."""
    from sparkcrawl.sources.warc import ingest_warc_documents

    rows = [
        ("http://a.example/p1", 200, "text/html",
         '<html><p>hello</p><img src="/i.png"><a href="/p2">next</a></html>',
         "2026-01-01 00:00:00"),
        ("http://a.example/p2", 404, "text/html", "", "2026-01-01 00:00:01"),
    ]
    df = spark.createDataFrame(
        rows, ["url", "status_code", "content_type", "body", "fetched_at"]
    ).withColumn("fetched_at", F.to_timestamp("fetched_at"))
    out = str(tmp_path / "ingest")
    write_warc(df, out).collect()
    docs = ingest_warc_documents(spark, f"{out}/*.warc").collect()
    assert len(docs) == 1
    d = docs[0]
    assert d["doc_id"] == "http://a.example/p1"
    assert [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in d["spans"]] == [
        ("text", "hello", "", 0),
        ("media", "", "http://a.example/i.png", 1),
        ("text", "next", "", 2),
    ]
    assert d["links"] == ["http://a.example/p2"]


def test_cdx_index(spark, tmp_path):
    """CDX index over shards: SURT urlkey collapses www/param-order
    variants, (urlkey, timestamp) sort order, real in-shard offsets,
    payload digest equality for identical bodies."""
    from sparkcrawl.sources.warc import cdx_index

    rows = [
        ("http://a.example/p1?z=1&a=2", 200, "text/html",
         "<html>hello</html>", "2026-01-01 00:00:00"),
        ("http://www.a.example/p1?a=2&z=1", 200, "text/html",
         "<html>hello</html>", "2026-01-02 00:00:00"),
        ("http://b.example/x", 200, "text/html",
         "<html>x</html>", "2026-01-01 00:00:02"),
    ]
    df = spark.createDataFrame(
        rows, ["url", "status_code", "content_type", "body", "fetched_at"]
    ).withColumn("fetched_at", F.to_timestamp("fetched_at"))
    out = str(tmp_path / "cdx")
    write_warc(df.coalesce(1), out).collect()
    idx = cdx_index(spark, f"{out}/*.warc", num_partitions=1).collect()
    keys = [(r["urlkey"], r["timestamp"]) for r in idx]
    assert keys == sorted(keys)
    assert {r["urlkey"] for r in idx} == {
        "example,a)/p1?a=2&z=1", "example,b)/x"}
    dup = [r for r in idx if r["urlkey"] == "example,a)/p1?a=2&z=1"]
    assert len(dup) == 2 and dup[0]["digest"] == dup[1]["digest"]
    # offsets: single shard, records at increasing byte positions
    offs = sorted(r["offset"] for r in idx)
    assert offs[0] == 0 and offs[1] > 0 and offs[2] > offs[1]
    assert all(r["filename"].startswith("part-") for r in idx)


def test_warc_revisit_records(spark, tmp_path):
    """Digest-identical re-captures export as body-less revisit records
    pointing at the first capture (ISO 28500 identical-payload-digest
    storage dedup); changed content still exports in full."""
    from sparkcrawl.sources.warc import mark_revisits

    rows = [
        ("http://a.example/p", 200, "text/html", "<html>v1</html>",
         "2026-01-01 00:00:00"),
        ("http://a.example/p", 200, "text/html", "<html>v1</html>",
         "2026-01-02 00:00:00"),  # identical -> revisit
        ("http://a.example/p", 200, "text/html", "<html>v2</html>",
         "2026-01-03 00:00:00"),  # changed -> full record
    ]
    df = spark.createDataFrame(
        rows, ["url", "status_code", "content_type", "body", "fetched_at"]
    ).withColumn("fetched_at", F.to_timestamp("fetched_at"))
    marked = mark_revisits(df)
    assert marked.filter(F.col("revisit_of").isNotNull()).count() == 1

    out = str(tmp_path / "rev")
    write_warc(marked.coalesce(1), out).collect()
    back = {r["warc_date"]: r for r in
            read_warc(spark, f"{out}/*.warc").collect()}
    first = back["2026-01-01T00:00:00Z"]
    rev = back["2026-01-02T00:00:00Z"]
    changed = back["2026-01-03T00:00:00Z"]
    assert first["warc_type"] == "response" and first["refers_to"] is None
    assert rev["warc_type"] == "revisit"
    assert rev["refers_to"] == first["record_id"]
    assert rev["content_length"] == 0 and bytes(rev["body"]) == b""
    assert changed["warc_type"] == "response"
    assert bytes(changed["body"]).endswith(b"v2</html>")


def test_surt_urlkey_edge_cases(spark):
    """SURT normalization rules, pinned case by case."""
    from sparkcrawl.functions.surt import surt_urlkey

    cases = [
        ("http://www.Shop.Example.co.uk/A/b?b=2&a=1#f",
         "uk,co,example,shop)/a/b?a=1&b=2"),
        ("https://example.com", "com,example)/"),
        ("http://h.example:8080/x", "example,h:8080)/x"),
        ("https://h.example:443/x", "example,h)/x"),
        ("http://h.example:80/", "example,h)/"),
        ("HTTP://H.EXAMPLE/Y", "example,h)/y"),
        ("http://www.example.com/?b=1&a=2", "com,example)/?a=2&b=1"),
        ("http://wwwx.example/p", "example,wwwx)/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = {r["u"]: r["k"] for r in
           df.select("u", surt_urlkey(F.col("u")).alias("k")).collect()}
    for url, want in cases:
        assert got[url] == want, (url, got[url], want)


def test_cdx_latest_lookup(spark, tmp_path):
    """Wayback-style lookup: latest capture per URL, at-or-before
    filtering, and urlkey variant matching (www/param-order)."""
    from sparkcrawl.sources.warc import cdx_index, cdx_latest

    rows = [
        ("http://a.example/p", 200, "text/html", "<html>v1</html>",
         "2026-01-01 00:00:00"),
        ("http://www.a.example/p", 200, "text/html", "<html>v2</html>",
         "2026-02-01 00:00:00"),
        ("http://b.example/x", 200, "text/html", "<html>x</html>",
         "2026-01-15 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, ["url", "status_code", "content_type", "body", "fetched_at"]
    ).withColumn("fetched_at", F.to_timestamp("fetched_at"))
    out = str(tmp_path / "idx")
    write_warc(df.coalesce(1), out).collect()
    idx = cdx_index(spark, f"{out}/*.warc")

    urls = spark.createDataFrame(
        [("http://a.example/p",), ("http://c.example/missing",)], ["url"])
    latest = {r["url"]: r for r in cdx_latest(idx, urls).collect()}
    assert set(latest) == {"http://a.example/p"}  # missing URL absent
    # latest capture is the www variant (same urlkey), Feb 1
    assert latest["http://a.example/p"]["timestamp"] == "20260201000000"
    assert latest["http://a.example/p"]["original"] == "http://www.a.example/p"

    before = {r["url"]: r for r in
              cdx_latest(idx, urls, at="20260115000000").collect()}
    assert before["http://a.example/p"]["timestamp"] == "20260101000000"

    # plan: argmax must be a hash agg, not a window sort
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cdx_latest(idx, urls).explain("simple")
    assert "Window" not in buf.getvalue()


def test_wet_export_roundtrip(spark, tmp_path):
    """WET conversion records: extracted text only, readable back by the
    generic WARC reader, media refs gone, refers-to correlates with the
    source capture's record id."""
    import hashlib

    from sparkcrawl.sources.warc import read_warc, write_wet

    docs = spark.createDataFrame(
        [
            ("http://a.example/p1",
             [{"kind": "text", "text": "hello", "media_ref": "", "offset": 0},
              {"kind": "media", "text": "", "media_ref": "m.png", "offset": 1},
              {"kind": "text", "text": "world", "media_ref": "", "offset": 2}]),
            ("http://a.example/p2",
             [{"kind": "text", "text": "only text", "media_ref": "", "offset": 0}]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    ).repartition(1)
    out = str(tmp_path / "wet")
    manifest = write_wet(docs, out).collect()
    assert len(manifest) == 1 and manifest[0]["n_records"] == 2

    back = {r["target_uri"]: r for r in read_warc(spark, out + "/*").collect()}
    assert set(back) == {"http://a.example/p1", "http://a.example/p2"}
    r1 = back["http://a.example/p1"]
    assert r1["warc_type"] == "conversion"
    assert bytes(r1["body"]).decode() == "hello world"   # media ref dropped
    assert "m.png" not in bytes(r1["body"]).decode()
    # refers-to points at the would-be source capture record id
    src = hashlib.md5(
        b"http://a.example/p1|1970-01-01T00:00:00Z").hexdigest()
    assert r1["refers_to"] == f"urn:md5:{src}"

    # deterministic: re-export is byte-identical
    out2 = str(tmp_path / "wet2")
    write_wet(docs, out2).collect()
    b1 = open(manifest[0]["path"], "rb").read()
    b2 = open(out2 + "/" + manifest[0]["path"].split("/")[-1], "rb").read()
    assert b1 == b2
