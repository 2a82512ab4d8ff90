"""Streaming seed ingestion drives the superstep engine (§2.10)."""

import pandas as pd
from pyspark.sql import functions as F

from sparkcrawl.plans.superstep import CrawlRun
from sparkcrawl.schemas import SEEDS_SCHEMA
from sparkcrawl.streaming.microbatch import stream_seeds_into_crawl


def test_stream_seeds_available_now(spark, mini_cfg, mini_web, tmp_path):
    seeds_dir = str(tmp_path / "seeds_in")
    mini_web["seeds"].limit(5).write.parquet(seeds_dir)

    run = CrawlRun(spark, str(tmp_path / "work"), mini_cfg,
                   mini_web["web"], mini_web["robots"])
    stream = spark.readStream.schema(SEEDS_SCHEMA).parquet(seeds_dir)
    q = stream_seeds_into_crawl(
        run, stream, supersteps_per_batch=2,
        checkpoint_dir=str(tmp_path / "stream_ckpt"),
    )
    q.awaitTermination(timeout=300)

    ckpt = run.last_checkpoint()
    assert ckpt is not None and ckpt["superstep"] >= 2
    frontier = run.frontier.read(spark)
    assert frontier.count() > 5  # discovered beyond the seeds

    # second drop of the SAME seeds: dedup keeps the frontier consistent
    before = frontier.count()
    mini_web["seeds"].limit(5).write.mode("append").parquet(seeds_dir)
    q2 = stream_seeds_into_crawl(
        run, spark.readStream.schema(SEEDS_SCHEMA).parquet(seeds_dir),
        supersteps_per_batch=1,
        checkpoint_dir=str(tmp_path / "stream_ckpt"),
    )
    q2.awaitTermination(timeout=300)
    after = run.frontier.read(spark)
    # no duplicate url_hash ever
    assert after.count() == after.select("url_hash").distinct().count()
    assert after.count() >= before


def test_streamed_seed_priority_and_bloom(spark, mini_cfg, mini_web, tmp_path):
    """Regression (ADVICE r1): streamed seeds must (a) keep their priority
    column and (b) enter the bloom BEFORE the frontier merge, so a later
    link to the same URL can't bypass the anti-join as definitely-new."""
    import hashlib

    from sparkcrawl.functions.urlnorm import canonicalize_one

    # a NEW url not in the crawled web, streamed with priority 2
    seed_url = "http://streamed.example/only-seed"
    seeds_dir = str(tmp_path / "seeds_in")
    spark.createDataFrame(
        pd.DataFrame({"url": [seed_url], "priority": [2]}), SEEDS_SCHEMA
    ).write.parquet(seeds_dir)

    run = CrawlRun(spark, str(tmp_path / "work"), mini_cfg,
                   mini_web["web"], mini_web["robots"])
    run.bootstrap(mini_web["seeds"].limit(3))
    q = stream_seeds_into_crawl(
        run, spark.readStream.schema(SEEDS_SCHEMA).parquet(seeds_dir),
        supersteps_per_batch=1,
        checkpoint_dir=str(tmp_path / "stream_ckpt"),
    )
    q.awaitTermination(timeout=300)

    canon = canonicalize_one(seed_url)
    row = run.frontier.read(spark).filter(F.col("url") == canon).collect()
    assert len(row) == 1
    assert row[0]["priority"] == 2  # (a) priority honored, not reset to 1

    # (b) superset invariant: the committed seed's hash must probe maybe-seen
    bloom = run.bloom_store.load()
    assert bloom is not None
    probe = bloom.might_contain_series(
        pd.Series([hashlib.sha1(canon.encode("utf-8")).hexdigest()])
    )
    assert bool(probe.iloc[0])
