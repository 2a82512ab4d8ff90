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
