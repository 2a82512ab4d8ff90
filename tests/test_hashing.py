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


def test_salted_queue_subsplits_within_domain(spark):
    """Q2-salted: hot-domain URLs spread across salt sub-queues, but all
    sub-queues of a domain derive from the domain's base queue — the
    politeness re-slot after the salted stage regroups them exactly."""
    from pyspark.sql import functions as F

    from sparkcrawl.functions.hashing import queue_for_domain, salted_queue

    nq, s = 8, 4
    urls = [(f"http://hot.example/p{i}", "hot.example") for i in range(200)]
    df = spark.createDataFrame(urls, ["url", "domain"])
    out = df.select(
        queue_for_domain(F.col("domain"), nq).alias("q"),
        salted_queue(F.col("domain"), F.col("url"), nq, s).alias("sq"),
    ).collect()
    base = {r["q"] for r in out}
    assert len(base) == 1  # one domain -> one base queue
    q = base.pop()
    sub = {r["sq"] for r in out}
    assert sub <= {q * s + i for i in range(s)}  # sub-queues stay in the domain's band
    assert len(sub) >= 2  # skew actually split


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
