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


def test_rendezvous_matches_hashlib_argmax(spark):
    """HRW pick == stdlib md5 argmax (the engine-stable weight recipe:
    first 15 hex chars of md5(key ':' q) as a 60-bit int, max weight,
    ties to the higher queue id)."""
    from sparkcrawl.functions.hashing import rendezvous_queue

    nq = 12
    keys = [f"{i:040d}" for i in range(300)]

    def pick(k):
        best = max(
            (int(hashlib.md5(f"{k}:{q}".encode()).hexdigest()[:15], 16), q)
            for q in range(nq)
        )
        return best[1]

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["k"]: r["q"]
        for r in df.select("k", rendezvous_queue(F.col("k"), nq).alias("q")).collect()
    }
    for k in keys:
        assert got[k] == pick(k)
    assert len({got[k] for k in keys}) == nq  # 300 keys cover all 12 queues


def test_rendezvous_grow_moves_only_to_new_queues(spark):
    """The HRW minimal-disruption property: growing Q -> Q' either
    keeps a key in place or moves it to a queue id >= Q — survivors
    never reshuffle among the old queues. mod-N breaks this badly."""
    from sparkcrawl.functions.hashing import rendezvous_queue

    old_nq, new_nq = 8, 12
    keys = [f"{i:040d}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    rows = df.select(
        rendezvous_queue(F.col("k"), old_nq).alias("o"),
        rendezvous_queue(F.col("k"), new_nq).alias("n"),
        md5_bucket(F.col("k"), old_nq).alias("mo"),
        md5_bucket(F.col("k"), new_nq).alias("mn"),
    ).collect()
    hrw_moved = 0
    for r in rows:
        if r["o"] != r["n"]:
            hrw_moved += 1
            assert r["n"] >= old_nq  # moved keys land ONLY on new queues
    mod_moved = sum(1 for r in rows if r["mo"] != r["mn"])
    # expected HRW move fraction = 1 - 8/12 = 1/3; mod-N stays only
    # when h mod lcm(8,12)=24 gives equal residues (8 of 24) -> 2/3 move.
    assert hrw_moved / len(rows) < 0.45
    assert mod_moved / len(rows) > 0.55
    assert hrw_moved < mod_moved
