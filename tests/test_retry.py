"""T4 end-to-end: 5xx URLs are retried with backoff, then dropped after
max_retries; 404s drop immediately; 304 etag flow raises priority."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkcrawl.config import CrawlConfig
from sparkcrawl.plans.superstep import CrawlRun
from sparkcrawl.schemas import ROBOTS_SCHEMA, SEEDS_SCHEMA, WEB_SCHEMA


@pytest.fixture(scope="module")
def retry_world(spark, tmp_path_factory):
    from datetime import datetime, timezone

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    web = pd.DataFrame(
        [
            {"url": "http://a.example/ok", "status_code": 200,
             "content_type": "text/html; charset=utf-8", "location": None,
             "etag": '"v1"', "last_modified": t0,
             "body": '<p>x</p><a href="/err">e</a><a href="/gone">g</a>'},
            {"url": "http://a.example/err", "status_code": 500,
             "content_type": None, "location": None, "etag": None,
             "last_modified": None, "body": None},
            {"url": "http://a.example/gone", "status_code": 404,
             "content_type": None, "location": None, "etag": None,
             "last_modified": None, "body": None},
        ]
    )
    cfg = CrawlConfig(
        num_queues=2, active_queues=2, per_queue_budget=10,
        tick_seconds=1.0, error_backoff_seconds=1, max_retries=2,
        delta_seconds=5, compact_every=0,
    )
    run = CrawlRun(
        spark, str(tmp_path_factory.mktemp("retry")), cfg,
        spark.createDataFrame(web, WEB_SCHEMA),
        spark.createDataFrame([], ROBOTS_SCHEMA),
    )
    seeds = spark.createDataFrame([("http://a.example/ok", 1)], SEEDS_SCHEMA)
    run.run(seeds, max_supersteps=8)
    return run


def test_5xx_retried_then_gone(retry_world, spark):
    run = retry_world
    log = run.fetch_log.read(spark).filter(F.col("url") == "http://a.example/err")
    # fetched exactly max_retries (=2) times, then never again
    assert log.count() == 2
    assert {r["outcome"] for r in log.collect()} == {"server_error"}
    row = run.frontier.read(spark).filter(F.col("url") == "http://a.example/err").collect()[0]
    assert row["state"] == "gone"
    assert row["error_count"] == 2


def test_404_dropped_immediately(retry_world, spark):
    run = retry_world
    log = run.fetch_log.read(spark).filter(F.col("url") == "http://a.example/gone")
    assert log.count() == 1
    row = run.frontier.read(spark).filter(F.col("url") == "http://a.example/gone").collect()[0]
    assert row["state"] == "gone"


def test_304_conditional_get_raises_priority(retry_world, spark):
    """Requeued page refetched with stored etag -> 304 -> priority+1."""
    run = retry_world
    log = (
        run.fetch_log.read(spark)
        .filter(F.col("url") == "http://a.example/ok")
        .orderBy("superstep")
        .collect()
    )
    assert [r["outcome"] for r in log[:2]] == ["success", "not_modified"]
    row = run.frontier.read(spark).filter(F.col("url") == "http://a.example/ok").collect()[0]
    assert row["priority"] >= 2  # raised by 304s
    assert row["etag"] == '"v1"'
