"""Change-rate estimation + adaptive revisit (operators/freshness.py)."""

import math
from datetime import datetime, timedelta

from sparkcrawl.operators import freshness

T0 = datetime(2026, 1, 1)


def _hist(spark, rows):
    return spark.createDataFrame(rows, ["url_hash", "ts", "content_hash"])


def _hourly(key, hashes):
    return [(key, T0 + timedelta(hours=i), h) for i, h in enumerate(hashes)]


def _expected_lambda(n, x, mean_gap):
    return -math.log((n - x + 0.5) / (n + 0.5)) / mean_gap


def test_change_intervals_content_lag(spark):
    hist = _hist(spark, _hourly("a", ["h1", "h1", "h2", "h2", "h3"]))
    rows = freshness.change_intervals(hist).orderBy("gap_sec").collect()
    # 5 observations -> 4 intervals, all 3600s; changes at obs 2 and 4
    assert len(rows) == 4
    assert all(r["gap_sec"] == 3600 for r in rows)
    assert sum(r["changed"] for r in rows) == 2


def test_change_intervals_explicit_flag(spark):
    hist = spark.createDataFrame(
        [("a", T0 + timedelta(hours=i), i % 2 == 0) for i in range(4)],
        ["url_hash", "ts", "changed"],
    )
    rows = freshness.change_intervals(hist, changed="changed").collect()
    # flag column passes through untouched; first row drops (no gap)
    assert len(rows) == 3
    assert sum(r["changed"] for r in rows) == 1  # obs at hours 1,2,3 -> flags F,T,F


def test_change_rates_matches_estimator(spark):
    hist = _hist(
        spark,
        _hourly("always", ["h1", "h2", "h3", "h4", "h5"])
        + _hourly("never", ["h1"] * 5)
        + _hourly("half", ["h1", "h1", "h2", "h2", "h3"])
        + [("single", T0, "h1")],
    )
    rates = {
        r["url_hash"]: r
        for r in freshness.change_rates(freshness.change_intervals(hist)).collect()
    }
    assert "single" not in rates  # one observation -> no estimate
    for key, x in (("always", 4), ("never", 0), ("half", 2)):
        r = rates[key]
        assert (r["n_intervals"], r["n_changes"], r["span_sec"]) == (4, x, 4 * 3600)
        assert abs(r["lambda_per_sec"] - _expected_lambda(4, x, 3600)) < 1e-12
    assert rates["never"]["lambda_per_sec"] == 0  # x=0 -> exactly zero rate
    assert rates["always"]["lambda_per_sec"] > rates["half"]["lambda_per_sec"]


def test_revisit_intervals_clamp_and_ordering(spark):
    hist = _hist(
        spark,
        _hourly("fast", ["h%d" % i for i in range(10)])
        + _hourly("slow", ["h1"] * 10),
    )
    out = {
        r["url_hash"]: r["revisit_sec"]
        for r in freshness.revisit_intervals(
            freshness.change_rates(freshness.change_intervals(hist)),
            target_stale_prob=0.5,
            min_sec=600,
            max_sec=7 * 86400,
        ).collect()
    }
    # always-changing page: revisit ~ ln(2)/lambda with lambda ~ 1/gap
    lam = _expected_lambda(9, 9, 3600)
    assert out["fast"] == int(min(max(math.log(2) / lam, 600), 7 * 86400))
    assert out["fast"] < out["slow"]  # faster change -> sooner revisit
    assert out["slow"] == 7 * 86400  # zero observed rate -> max clamp


def test_revisit_rejects_bad_probability(spark):
    import pytest

    rates = spark.createDataFrame([("a", 1, 1, 10, 0.1)],
                                  ["url_hash", "n_intervals", "n_changes",
                                   "span_sec", "lambda_per_sec"])
    with pytest.raises(ValueError):
        freshness.revisit_intervals(rates, target_stale_prob=1.0)


def test_engine_revisit_refresh(spark, mini_cfg, tmp_path):
    """End-to-end: crawl long enough for conditional-GET refetches, then
    the offline refresh rewrites pending next_date from observed change
    rates (plans/freshness.py), idempotently, and the crawl resumes.

    Uses a SMALL web (6 hosts x 3 pages) so the jump-ahead clock drains
    the new-URL supply and starts requeue refetches within 8 supersteps
    (the shared mini_web is too big to refetch that soon)."""
    from pyspark.sql import functions as F

    from sparkcrawl.plans.freshness import (
        refresh_revisit_schedule,
        url_change_history,
    )
    from sparkcrawl.plans.superstep import CrawlRun
    from sparkcrawl.schemas import ROBOTS_SCHEMA, SEEDS_SCHEMA, WEB_SCHEMA
    from sparkcrawl.sources.fixtures import generate_web

    web, robots, seeds = generate_web(
        seed=42, num_hosts=6, pages_per_host=3, hot_hosts=0, hot_factor=1
    )
    wd = str(tmp_path / "w")
    run = CrawlRun(
        spark, wd, mini_cfg,
        spark.createDataFrame(web, schema=WEB_SCHEMA),
        spark.createDataFrame(robots, schema=ROBOTS_SCHEMA),
    )
    run.run(spark.createDataFrame(seeds, schema=SEEDS_SCHEMA), max_supersteps=8)

    hist = url_change_history(spark, wd)
    assert hist is not None
    # the jump-ahead clock forces refetches: some URL has >=2 observations
    multi = hist.groupBy("url_hash").count().filter(F.col("count") >= 2)
    assert multi.count() > 0
    # conditional GET produced both signals (200 -> True, 304 -> False)
    flags = {r["changed"] for r in hist.select("changed").distinct().collect()}
    assert False in flags

    before = {
        r["url_hash"]: r["next_date"]
        for r in run.frontier.read(spark).filter(F.col("state") == "pending").collect()
    }
    n = refresh_revisit_schedule(spark, wd, mini_cfg, refresh_id=1)
    assert n > 0
    after = {
        r["url_hash"]: r["next_date"]
        for r in run.frontier.read(spark).filter(F.col("state") == "pending").collect()
    }
    assert len(after) == len(before)  # reschedule, never add/drop rows
    assert any(after[k] != before[k] for k in after)

    # idempotent per refresh_id: replaying replaces, never stacks
    refresh_revisit_schedule(spark, wd, mini_cfg, refresh_id=1)
    again = {
        r["url_hash"]: r["next_date"]
        for r in run.frontier.read(spark).filter(F.col("state") == "pending").collect()
    }
    assert again == after

    # the crawl continues on the rescheduled frontier
    more = run.resume(max_supersteps=1)
    assert more


def test_plan_single_shuffle(spark):
    """The lag window and the rate groupBy key-match: ONE exchange."""
    import contextlib
    import io
    import re

    hist = _hist(spark, _hourly("a", ["h1", "h2", "h3"]))
    df = freshness.change_rates(freshness.change_intervals(hist))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_cache_control_hints(spark):
    from datetime import datetime, timezone

    from sparkcrawl.operators.freshness import cache_control_hints

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        (1, "max-age=3600, public", t0),
        (2, "No-Cache, MAX-AGE=60", t0),          # case fold
        (3, "no-store", t0),
        (4, "private, s-maxage=30", t0),           # s-maxage is NOT max-age
        (5, None, t0),
        (6, "stale-while-revalidate=5,max-age=0", t0),
    ]
    df = spark.createDataFrame(rows, "url long, cache_control string,"
                                     " fetched_at timestamp")
    got = {r["url"]: r for r in cache_control_hints(df).collect()}
    base_us = int(t0.timestamp() * 1_000_000)
    assert got[1]["max_age"] == 3600
    assert got[1]["next_ok_us"] == base_us + 3600 * 1_000_000
    assert got[2]["max_age"] == 60 and got[2]["no_cache"]
    assert got[3]["no_store"] and got[3]["max_age"] is None
    assert got[4]["max_age"] is None        # s-maxage must not match
    assert got[5]["max_age"] is None and not got[5]["no_cache"]
    assert got[6]["max_age"] == 0 and got[6]["next_ok_us"] == base_us


def test_hint_trust_classes(spark):
    """Declared-vs-measured agreement: a host declaring hourly on
    never-changing pages overstates; one declaring weekly on
    hourly-changing pages understates; matched declarations are
    consistent; URLs without estimates or declarations drop out."""
    import math

    from sparkcrawl.operators.freshness import hint_trust

    # measured mean interval = 1/lambda
    rates = spark.createDataFrame(
        [
            ("u_over", 1.0 / (100 * 3600.0)),   # changes every ~100h
            ("u_under", 1.0 / 3600.0),          # changes hourly
            ("u_ok", 1.0 / 86400.0),            # daily
            ("u_zero", 0.0),                    # no estimate
        ],
        ["url_hash", "lambda_per_sec"],
    )
    hints = spark.createDataFrame(
        [
            ("u_over", "liar.example", 3600),      # claims hourly
            ("u_under", "shy.example", 604800),    # claims weekly
            ("u_ok", "ok.example", 86400),         # claims daily
            ("u_zero", "ok.example", 3600),
            ("u_missing", "ok.example", 3600),     # no rate row
        ],
        ["url_hash", "host", "declared_sec"],
    )
    got = {r["host"]: r for r in hint_trust(hints, rates).collect()}
    assert got["liar.example"]["trust"] == "overstates_freshness"
    assert got["liar.example"]["avg_log_ratio"] == round(math.log(100), 6)
    assert got["shy.example"]["trust"] == "understates_freshness"
    assert got["ok.example"]["trust"] == "consistent"
    assert got["ok.example"]["n_urls"] == 1   # zero/missing dropped
    assert got["ok.example"]["avg_log_ratio"] == 0.0


def test_backlink_novelty(spark):
    """Only strictly-later inlinks count; never-fetched targets are
    excluded; the exact-integer boost ladder hits its rungs."""
    from sparkcrawl.operators.freshness import backlink_novelty

    edges = spark.createDataFrame(
        [("u1", 5)] * 3 + [("u1", 4), ("u1", 3)]     # 3 new, 2 old
        + [("u2", 9)] * 15                            # 15 new
        + [("u3", 2)]                                 # never fetched
        + [("u4", 1)],                                # equal, not newer
        ["dst", "discovered_superstep"])
    fetched = spark.createDataFrame(
        [("u1", 4), ("u2", 1), ("u4", 1)],
        ["url", "fetched_superstep"])
    got = {r["url"]: r for r in backlink_novelty(edges, fetched).collect()}
    assert got["u1"]["n_new_inlinks"] == 3
    assert got["u1"]["boost"] == 2                    # floor(log2(4))
    assert got["u2"]["n_new_inlinks"] == 15
    assert got["u2"]["boost"] == 4                    # log2(16) = 4
    assert "u3" not in got and "u4" not in got
    capped = {r["url"]: r for r in
              backlink_novelty(edges, fetched, max_boost=3).collect()}
    assert capped["u2"]["boost"] == 3
