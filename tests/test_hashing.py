"""C2/Q2: Spark-side hashes match hashlib / are cross-engine stable."""

import hashlib

import duckdb
from pyspark.sql import functions as F

from sparkcrawl.functions.hashing import md5_bucket, url_sha1


URLS = [
    "http://a.example/",
    "http://a.example/p?a=1",
    "http://host007.example/page/3",
    "http://ünïcode.example/p",  # non-ascii stays utf-8 consistent
]


def test_sha1_matches_hashlib(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    got = {r["url"]: r["h"] for r in df.withColumn("h", url_sha1(F.col("url"))).collect()}
    for u in URLS:
        assert got[u] == hashlib.sha1(u.encode("utf-8")).hexdigest()


def test_md5_bucket_matches_duckdb(spark):
    nq = 8
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    got = {r["url"]: r["q"] for r in df.withColumn("q", md5_bucket(F.col("url"), nq)).collect()}
    con = duckdb.connect()
    for u in URLS:
        expected = con.execute(
            "SELECT CAST(concat('0x', substr(md5(?),1,8)) AS BIGINT) % ?", [u, nq]
        ).fetchone()[0]
        assert got[u] == expected, u
    assert all(0 <= v < nq for v in got.values())
