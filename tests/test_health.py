"""Host error budgets + quarantine (operators/health.py, plans/health.py)."""

from pyspark.sql import functions as F

from sparkcrawl.operators import health


def test_host_error_stats_and_threshold(spark):
    rows = []
    for ss in range(4):
        rows += [(ss, "good.example", "success")] * 3
        rows += [(ss, "bad.example", "server_error")] * 2 + [
            (ss, "bad.example", "success")
        ]
        if ss < 2:  # errored only BEFORE the window
            rows += [(ss, "old.example", "server_error")]
    log = spark.createDataFrame(rows, ["superstep", "host", "outcome"])
    stats = {
        r["host"]: r
        for r in health.host_error_stats(log, since_superstep=0).collect()
    }
    assert stats["good.example"]["error_rate"] == 0.0
    assert abs(stats["bad.example"]["error_rate"] - 2 / 3) < 1e-6
    windowed = {
        r["host"] for r in health.host_error_stats(log, since_superstep=2).collect()
    }
    assert "old.example" not in windowed  # stale errors age out
    sick = {r["host"] for r in health.sick_hosts(
        health.host_error_stats(log), min_fetches=5, max_error_rate=0.5
    ).collect()}
    assert sick == {"bad.example"}  # old.example: 2 fetches < min_fetches


def test_engine_quarantine(spark, mini_cfg, tmp_path):
    """A host answering 5xx for most URLs gets its pending rows pushed
    past the quarantine horizon; healthy hosts are untouched."""
    import dataclasses

    from sparkcrawl.plans.health import quarantine_sick_hosts
    from sparkcrawl.plans.superstep import CrawlRun
    from sparkcrawl.schemas import SEEDS_SCHEMA, WEB_SCHEMA

    def page(url, body, status=200):
        return (url, status, "text/html", None, None, None, body)

    web = spark.createDataFrame(
        [
            page("http://bad.example/",
                 '<a href="/a">a</a><a href="/b">b</a><a href="/c">c</a>'),
            page("http://bad.example/a", None, 500),
            page("http://bad.example/b", None, 500),
            page("http://bad.example/c", None, 500),
            page("http://good.example/", '<a href="/x">x</a>'),
            page("http://good.example/x", "fine"),
        ],
        schema=WEB_SCHEMA,
    )
    seeds = spark.createDataFrame(
        [("http://bad.example/", 1), ("http://good.example/", 1)],
        schema=SEEDS_SCHEMA,
    )
    cfg = dataclasses.replace(mini_cfg, max_retries=10)  # keep errors pending
    run = CrawlRun(spark, str(tmp_path / "w"), cfg, web, None)
    run.run(seeds, max_supersteps=3)

    n = quarantine_sick_hosts(
        spark, str(tmp_path / "w"), cfg, refresh_id=1,
        min_fetches=3, max_error_rate=0.5, quarantine_sec=3600,
    )
    assert n > 0
    horizon = None
    fr = run.frontier.read(spark).filter(F.col("state") == "pending").collect()
    ck = run.last_checkpoint()
    import datetime
    horizon = ck["virtual_time"] + datetime.timedelta(seconds=3600)
    for r in fr:
        nd = r["next_date"]
        if nd.tzinfo is None:
            nd = nd.replace(tzinfo=datetime.timezone.utc)
        h = horizon if horizon.tzinfo else horizon.replace(
            tzinfo=datetime.timezone.utc)
        if r["host"] == "bad.example":
            assert nd >= h
        else:
            assert nd < h

    # idempotent per refresh id; crawl resumes on the demoted frontier
    n2 = quarantine_sick_hosts(
        spark, str(tmp_path / "w"), cfg, refresh_id=1,
        min_fetches=3, max_error_rate=0.5, quarantine_sec=3600,
    )
    assert n2 == 0  # nothing left below the horizon
    assert run.resume(max_supersteps=1)


def test_adaptive_politeness_rule(spark):
    from pyspark.sql import functions as F

    from sparkcrawl.operators.health import adaptive_politeness

    rows = (
        [("a", 100.0, True)] * 19 + [("a", 1000.0, True)]   # p95 = 145.0
        + [("b", 5000.0, True)] + [("b", 5000.0, False)] * 3  # err 0.75
        + [("c", 50.0, True)] * 4
    )
    log = spark.createDataFrame(rows, ["host", "latency_ms", "ok"])
    out = {r["host"]: r for r in adaptive_politeness(log).collect()}
    # healthy, slow-ish host: base floor dominates 2*p95=290
    assert out["a"]["p95_latency_ms"] == 145.0
    assert out["a"]["error_rate"] == 0.0
    assert out["a"]["next_delay_ms"] == 1000.0
    # sick host: max(1000, 2*5000) * (1 + 10*0.7) = 80000 -> clamped
    assert out["b"]["error_rate"] == 0.75
    assert out["b"]["next_delay_ms"] == 30000.0
    # fast healthy host with a low base: the min clamp holds the floor
    out2 = {r["host"]: r
            for r in adaptive_politeness(log, base_delay_ms=100).collect()}
    assert out2["c"]["next_delay_ms"] == 200.0


def test_adaptive_politeness_single_agg_plan(spark):
    import contextlib
    import io

    from sparkcrawl.operators.health import adaptive_politeness

    log = spark.createDataFrame(
        [("a", 1.0, True)], ["host", "latency_ms", "ok"]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        adaptive_politeness(log).explain("simple")
    p = buf.getvalue()
    # one shuffle (the host agg), no window, no Python
    assert p.count("Exchange") == 1, p
    assert "Window" not in p and "EvalPython" not in p


def test_revalidation_stats(spark):
    """304s count as revalidation wins over the content-bearing
    fetches only; hosts with no content fetches report NULL."""
    from sparkcrawl.operators.health import revalidation_stats

    rows = [
        ("cache.example", 200), ("cache.example", 304),
        ("cache.example", 304), ("cache.example", 500),
        ("cold.example", 200), ("cold.example", 200),
        ("down.example", 503),
    ]
    df = spark.createDataFrame(rows, ["host", "status_code"])
    got = {r["host"]: r for r in revalidation_stats(df).collect()}
    c = got["cache.example"]
    assert (c["n_fetches"], c["n_full"], c["n_not_modified"]) == (4, 1, 2)
    assert c["revalidation_rate"] == round(2 / 3, 6)
    assert got["cold.example"]["revalidation_rate"] == 0.0
    assert got["down.example"]["revalidation_rate"] is None


def test_soft404_flags(spark):
    """Phrase-only, exact-tolerance-boundary length, no-probe host,
    real 404 (never soft), and a clean page."""
    from sparkcrawl.operators.health import soft404_flags

    pages = spark.createDataFrame(
        [
            # phrase match, length far off
            ("a.example", "http://a.example/1", 200, 9000,
             "Sorry, this page was not found here."),
            # diff == tol exactly (probe 1000 -> tol 64) -> len_match
            ("a.example", "http://a.example/2", 200, 1064, "thin page"),
            # just outside the window
            ("a.example", "http://a.example/3", 200, 1065, "thin page"),
            # real 404: phrase + length both fire, soft404 stays False
            ("a.example", "http://a.example/4", 404, 1000,
             "error 404 - not found"),
            # no probe for this host: only the phrase lane can fire
            ("b.example", "http://b.example/1", 200, 500,
             "it does not exist anymore"),
            ("b.example", "http://b.example/2", 200, 500, "fine page"),
        ],
        ["host", "url", "status", "body_len", "text"],
    )
    probes = spark.createDataFrame([("a.example", 1000)],
                                   ["host", "probe_len"])
    got = {r["url"]: r for r in soft404_flags(pages, probes).collect()}
    assert got["http://a.example/1"]["phrase_match"]
    assert not got["http://a.example/1"]["len_match"]
    assert got["http://a.example/1"]["soft404"]
    assert got["http://a.example/2"]["len_match"]
    assert got["http://a.example/2"]["soft404"]
    assert not got["http://a.example/3"]["len_match"]
    assert not got["http://a.example/3"]["soft404"]
    r404 = got["http://a.example/4"]
    assert r404["phrase_match"] and r404["len_match"] and not r404["soft404"]
    assert got["http://b.example/1"]["soft404"]      # phrase lane
    assert not got["http://b.example/1"]["len_match"]
    assert not got["http://b.example/2"]["soft404"]


def test_retry_after_schedule(spark):
    """Both header forms parse; the latest instant wins per host;
    garbage headers and non-429/503 rows never count."""
    import datetime as dt

    from sparkcrawl.operators.health import retry_after_schedule

    now = dt.datetime(2026, 10, 21, tzinfo=dt.timezone.utc)
    now_us = int(now.timestamp() * 1_000_000)
    rows = [
        ("a.example", 429, "120"),
        ("a.example", 503, "Wed, 21 Oct 2026 07:28:00 GMT"),
        ("a.example", 503, "whenever"),        # unparseable: dropped
        ("b.example", 200, "999999"),          # wrong status: ignored
        ("b.example", 503, "30"),
        ("c.example", 503, None),              # no header
    ]
    df = spark.createDataFrame(rows, ["host", "status", "retry_after"])
    got = {r["host"]: r for r in retry_after_schedule(df, now).collect()}
    a = got["a.example"]
    assert a["n_signals"] == 2
    date_us = int(dt.datetime(
        2026, 10, 21, 7, 28, tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert a["retry_until_us"] == date_us          # 07:28 > now+120s
    b = got["b.example"]
    assert b["n_signals"] == 1
    assert b["retry_until_us"] == now_us + 30_000_000
    assert "c.example" not in got


def test_latency_anomalies(spark):
    """The spike flags with the hand-computed robust z; baseline
    jitter does not; a constant-latency host needs the MAD floor to
    stay quiet on micro-jitter."""
    from sparkcrawl.operators.health import latency_anomalies

    rows = (
        [("a.example", s, 100.0 + (s % 3)) for s in range(10)]
        + [("a.example", 10, 900.0)]                 # incident
        + [("flat.example", s, 50.0) for s in range(8)]
        + [("flat.example", 8, 52.0)]                # micro-jitter
    )
    df = spark.createDataFrame(rows, ["host", "superstep", "latency_ms"])
    got = latency_anomalies(df, k=5.0).collect()
    assert [(r["host"], r["superstep"]) for r in got] == [("a.example", 10)]
    r = got[0]
    assert r["median_ms"] == 101.0 and r["mad_ms"] == 1.0
    assert r["robust_z"] == 799.0
    # drop the floor and the 2ms jitter on the flat host flags too
    loose = latency_anomalies(df, k=5.0, mad_floor_ms=0.1).collect()
    assert ("flat.example", 8) in {(r["host"], r["superstep"])
                                   for r in loose}
