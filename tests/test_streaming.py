"""Streaming seed ingestion drives the superstep engine (§2.10)."""

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
