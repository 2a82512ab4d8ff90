"""Write-side layout: Z-order clustering + bucketed co-location
(operators/layout.py)."""

from pyspark.sql import functions as F

from sparkcrawl.operators.layout import (
    write_bucketed,
    zorder_key,
    zorder_layout,
)


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("x"),
        (F.col("id") / 16).cast("int").alias("y"),
    )
    rows = df.withColumn("z", zorder_key(F.col("x"), F.col("y"), bits=4)).collect()
    assert rows and all(_morton(r.x, r.y, 4) == r.z for r in rows)


def test_zorder_key_clamps_to_bit_budget(spark):
    row = (
        spark.range(1)
        .select(F.lit(9999).alias("x"), F.lit(3).alias("y"))
        .select(zorder_key(F.col("x"), F.col("y"), bits=4).alias("z"))
        .first()
    )
    assert row.z == _morton(15, 3, 4)  # x clamped to 2^4 - 1


def test_zorder_layout_partitions_are_disjoint_key_ranges(spark):
    """repartitionByRange must give contiguous non-overlapping z ranges
    per partition — that is what makes file-level min/max pruning
    work on BOTH source dimensions."""
    df = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("int").alias("y")
    )
    out = zorder_layout(df, "x", "y", n_partitions=8, bits=5)
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(parts) > 1
    for prev, cur in zip(parts, parts[1:]):
        assert prev.hi < cur.lo  # disjoint, ordered ranges


def test_bucketed_self_join_has_no_exchange(spark, tmp_path):
    """The point of bucketing: an equi-join on the bucket key needs no
    shuffle — neither side has an Exchange in the physical plan."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_bucketed(df, "t_bucketed_a", "k", 4, path=str(tmp_path / "a"))
    write_bucketed(df, "t_bucketed_b", "k", 4, path=str(tmp_path / "b"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_bucketed_a").join(spark.table("t_bucketed_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")


def test_skew_report_counts_share_and_salt(spark):
    from sparkcrawl.operators.layout import skew_report

    rows = [("hot",)] * 70 + [("warm",)] * 25 + [("cold",)] * 5
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, ["k"], target_rows_per_task=20, top_n=2).collect()
    assert [(r.k, r.n_rows, r.salt_factor) for r in got] == [
        ("hot", 70, 4),   # ceil(70/20)
        ("warm", 25, 2),  # ceil(25/20)
    ]
    assert abs(got[0].share - 0.7) < 1e-9


def test_skew_report_is_deterministic_on_ties(spark):
    from sparkcrawl.operators.layout import skew_report

    rows = [("b",)] * 3 + [("a",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [r.k for r in skew_report(df, ["k"], 10, top_n=3).collect()]
    assert got == ["a", "b", "c"]  # ties broken by key


def test_frontcoding_estimate(spark):
    """Hand-computed LCP chain: /a/page1,/a/page2,/b/x on one host;
    savings match byte arithmetic; per_host_cap truncates the block."""
    from sparkcrawl.operators.layout import frontcoding_estimate

    rows = [
        ("h.example", "http://h.example/a/page1"),   # len 24, lcp 0
        ("h.example", "http://h.example/a/page2"),   # len 24, lcp 23
        ("h.example", "http://h.example/b/x"),       # len 20, lcp 17
        ("solo.example", "http://solo.example/"),    # single: lcp 0
    ]
    df = spark.createDataFrame(rows, ["host", "url"])
    got = {r["host"]: r for r in frontcoding_estimate(df).collect()}
    h = got["h.example"]
    assert h["n_urls"] == 3
    assert h["raw_bytes"] == 24 + 24 + 20
    # coded = (24-0) + (24-23) + (20-17) + 2*3
    assert h["coded_bytes"] == 24 + 1 + 3 + 6
    assert h["savings_frac"] == round((68 - 34) / 68, 6)
    s = got["solo.example"]
    assert s["coded_bytes"] == s["raw_bytes"] + 2  # overhead only
    # cap: only the first (sorted) URL of h.example is measured
    capped = {r["host"]: r for r in
              frontcoding_estimate(df, per_host_cap=1).collect()}
    assert capped["h.example"]["n_urls"] == 1
    assert capped["h.example"]["raw_bytes"] == 24


def test_compaction_plan(spark):
    """Sorted-fill binning hand-checked: 200+180+150 MB smalls against
    a 512 MB target -> running 200/380/530 -> bins 1,1,2; a lone small
    file and all >=256 MB files stay 'keep'."""
    from sparkcrawl.operators.layout import compaction_plan

    mb = 1024 * 1024
    rows = [
        ("p=0", 1, 200 * mb), ("p=0", 2, 180 * mb), ("p=0", 3, 150 * mb),
        ("p=0", 4, 900 * mb),          # >= 256 MB threshold: keep
        ("p=1", 5, 10 * mb),           # lone small: keep
        ("p=1", 6, 600 * mb),
    ]
    df = spark.createDataFrame(rows, ["partition", "file_id", "bytes"])
    got = {r["file_id"]: r for r in compaction_plan(df).collect()}
    assert [got[i]["action"] for i in (1, 2, 3)] == ["compact"] * 3
    # desc order: 200(id1), 180(id2), 150(id3) -> cum 200/380/530 MB
    assert (got[1]["bin"], got[2]["bin"], got[3]["bin"]) == (1, 1, 2)
    assert got[4]["action"] == "keep" and got[4]["bin"] is None
    assert got[5]["action"] == "keep" and got[5]["bin"] is None
    assert got[6]["action"] == "keep"


def test_snapshot_expiry_plan(spark):
    """Newest keep_last stay 'recent' (beating 'anchor' when both
    apply), older multiples of keep_every stay 'anchor', the rest
    expire; a log shorter than keep_last keeps everything."""
    from sparkcrawl.operators.layout import snapshot_expiry_plan

    snaps = spark.createDataFrame(
        [(v,) for v in range(0, 120)], ["version"])
    got = {r["version"]: r
           for r in snapshot_expiry_plan(
               snaps, keep_last=10, keep_every=50).collect()}
    assert got[119]["reason"] == "recent"
    assert got[110]["reason"] == "recent"
    assert got[109]["action"] == "expire" and got[109]["reason"] is None
    assert got[100]["reason"] == "anchor"      # 100 % 50 == 0, old
    assert got[50]["reason"] == "anchor"
    assert got[0]["reason"] == "anchor"
    assert got[49]["action"] == "expire"
    tiny = spark.createDataFrame([(3,), (7,)], ["version"])
    assert {r["action"] for r in snapshot_expiry_plan(
        tiny, keep_last=10, keep_every=50).collect()} == {"keep"}


def test_shard_checksums(spark):
    """Checksums are invariant under row order and partitioning;
    changing one value changes exactly one shard; NULL and empty
    string fingerprint differently; duplicate pairs cancel in XOR but
    not in the count."""
    from sparkcrawl.operators.layout import shard_checksums

    rows = [(1, "a"), (2, "b"), (3, None), (4, "")]
    a = spark.createDataFrame(rows, ["k", "v"])
    b = spark.createDataFrame(list(reversed(rows)), ["k", "v"]) \
        .repartition(7)
    ca = {r["shard"]: (r["n_rows"], r["checksum"])
          for r in shard_checksums(a, n_shards=8).collect()}
    cb = {r["shard"]: (r["n_rows"], r["checksum"])
          for r in shard_checksums(b, n_shards=8).collect()}
    assert ca == cb
    mutated = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (4, "")], ["k", "v"])
    cm = {r["shard"]: (r["n_rows"], r["checksum"])
          for r in shard_checksums(mutated, n_shards=8).collect()}
    assert ca != cm
    dup = spark.createDataFrame([(1, "a"), (1, "a")], ["k", "v"])
    row = shard_checksums(dup, n_shards=8).collect()
    assert len(row) == 1
    assert row[0]["n_rows"] == 2 and row[0]["checksum"] == 0
