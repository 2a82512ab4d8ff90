"""Streaming WARC archival: per-epoch shards, transactional manifests,
replay-idempotent layout."""

import json
import os

from pyspark.sql import functions as F

from sparkcrawl.sources.warc import read_warc
from sparkcrawl.streaming.warc_sink import stream_warc_export


def _write_batch(spark, srcdir, n0, n1):
    rows = [
        (f"http://s.example/p{i}", 200, "text/html",
         f"<html>page {i}</html>", "2026-01-01 00:00:00")
        for i in range(n0, n1)
    ]
    df = spark.createDataFrame(
        rows, ["url", "status_code", "content_type", "body", "fetched_at"]
    ).withColumn("fetched_at", F.to_timestamp("fetched_at"))
    df.coalesce(1).write.mode("append").parquet(srcdir)


def test_stream_warc_export(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "warc")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, 0, 4)

    schema = ("url string, status_code long, content_type string, "
              "body string, fetched_at timestamp")
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_warc_export(stream, out, compress=True, checkpoint_dir=ckpt)
    q.awaitTermination(120)

    manifests = sorted(os.listdir(os.path.join(out, "_manifests")))
    assert len(manifests) == 1
    man = json.load(open(os.path.join(out, "_manifests", manifests[0])))
    assert sum(s["n_records"] for s in man["shards"]) == 4

    back = read_warc(spark, os.path.join(out, "epoch=*", "*.warc.gz"))
    assert back.count() == 4

    # second batch arrives; restart from the SAME checkpoint: only the
    # new rows are archived, first epoch untouched
    _write_batch(spark, src, 4, 7)
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = stream_warc_export(stream2, out, compress=True, checkpoint_dir=ckpt)
    q2.awaitTermination(120)

    back2 = read_warc(spark, os.path.join(out, "epoch=*", "*.warc.gz"))
    got = sorted(r["target_uri"] for r in back2.collect())
    assert got == [f"http://s.example/p{i}" for i in range(7)]
    assert len(os.listdir(os.path.join(out, "_manifests"))) == 2


def test_archive_while_crawling(spark, tmp_path):
    """cfg.warc_archive_dir: every superstep's fetched pages land as
    WARC shards; the archive is readable and CDX-indexable, and the
    crawl itself is unaffected."""
    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.plans.superstep import CrawlRun
    from sparkcrawl.sources.fixtures import write_fixture_tables
    from sparkcrawl.sources.warc import cdx_index, read_warc

    paths = write_fixture_tables(spark, str(tmp_path / "fix"), seed=7,
                                 num_hosts=6, pages_per_host=4)
    arch = str(tmp_path / "archive")
    cfg = CrawlConfig(num_queues=4, warc_archive_dir=arch)
    run = CrawlRun(spark, str(tmp_path / "wd"), cfg,
                   spark.read.parquet(paths["web"]),
                   spark.read.parquet(paths["robots"]))
    stats = run.run(spark.read.parquet(paths["seeds"]), max_supersteps=3)

    dirs = sorted(os.listdir(arch))
    assert dirs == [f"superstep={s.superstep:06d}" for s in stats]
    back = read_warc(spark, os.path.join(arch, "superstep=*", "*.warc.gz"))
    archived = back.filter("warc_type = 'response'").count()
    # every successfully fetched page (status present) is archived
    assert archived >= sum(s.fetched for s in stats) > 0
    idx = cdx_index(spark, os.path.join(arch, "superstep=*", "*.warc.gz"))
    assert idx.count() == archived
    assert idx.filter("urlkey IS NULL").count() == 0
