"""R1/R2/R3 robots semantics: longest prefix wins, allow wins ties."""

import hashlib

from pyspark.sql import functions as F

from sparkcrawl.operators.robots import crawl_delays, parse_robots_bodies, robots_gate
from sparkcrawl.schemas import ROBOTS_SCHEMA


RULES = [
    # deny.example: everything disallowed
    ("deny.example", "*", False, "/", None),
    # partial.example: /private disallowed, /private/open allowed (longer wins)
    ("partial.example", "*", False, "/private", None),
    ("partial.example", "*", True, "/private/open", None),
    ("partial.example", "*", True, "/", 2.0),
    # tie.example: allow and deny same prefix -> allow wins
    ("tie.example", "*", True, "/x", None),
    ("tie.example", "*", False, "/x", None),
]


def _batch(spark, urls):
    rows = [
        (u, hashlib.sha1(u.encode()).hexdigest(), u.split("/")[2])
        for u in urls
    ]
    return spark.createDataFrame(rows, ["url", "url_hash", "host"])


def test_robots_gate_decisions(spark):
    robots = spark.createDataFrame(RULES, ROBOTS_SCHEMA)
    urls = [
        "http://deny.example/anything",
        "http://partial.example/private/secret",
        "http://partial.example/private/open/doc",
        "http://partial.example/public",
        "http://tie.example/x/y",
        "http://norules.example/free",
    ]
    out = {r["url"]: r["robots_allowed"] for r in robots_gate(_batch(spark, urls), robots).collect()}
    assert out == {
        "http://deny.example/anything": False,
        "http://partial.example/private/secret": False,
        "http://partial.example/private/open/doc": True,
        "http://partial.example/public": True,
        "http://tie.example/x/y": True,
        "http://norules.example/free": True,
    }


def test_crawl_delays(spark):
    robots = spark.createDataFrame(RULES, ROBOTS_SCHEMA)
    got = {r["host"]: r["crawl_delay"] for r in crawl_delays(robots).collect()}
    assert got == {"partial.example": 2.0}


def test_parse_robots_bodies(spark):
    body = """
# comment
User-agent: *
Disallow: /private
Allow: /private/open
Crawl-delay: 3

User-agent: other
Disallow: /
"""
    df = spark.createDataFrame([("h.example", body)], ["host", "body"])
    rules = parse_robots_bodies(df).collect()
    star = [(r["allow"], r["path_prefix"]) for r in rules if r["agent"] == "*"]
    assert (False, "/private") in star
    assert (True, "/private/open") in star
    other = [(r["allow"], r["path_prefix"]) for r in rules if r["agent"] == "other"]
    assert (False, "/") in other
    delays = {(r["agent"], r["crawl_delay"]) for r in rules if r["crawl_delay"]}
    assert ("*", 3.0) in delays


def test_crawl_delay_does_not_open_disallowed_host(spark):
    """Regression (ADVICE r1): 'Crawl-delay + Disallow: /' must stay fully
    denied — the parser must not fabricate an allow rule for the delay
    line (it would win the longest-prefix tie against Disallow: /)."""
    body = "User-agent: *\nCrawl-delay: 10\nDisallow: /\n"
    df = spark.createDataFrame([("blocked.example", body)], ["host", "body"])
    rules = parse_robots_bodies(df)

    out = robots_gate(_batch(spark, ["http://blocked.example/anything"]), rules).collect()
    assert [r["robots_allowed"] for r in out] == [False]

    # the delay still reaches R3 politeness
    got = {r["host"]: r["crawl_delay"] for r in crawl_delays(rules).collect()}
    assert got == {"blocked.example": 10.0}

    # delay-only rows never act as gate rules: delay-only host stays allow-all
    body2 = "User-agent: *\nCrawl-delay: 2\n"
    rules2 = parse_robots_bodies(
        spark.createDataFrame([("open.example", body2)], ["host", "body"])
    )
    out2 = robots_gate(_batch(spark, ["http://open.example/x"]), rules2).collect()
    assert [r["robots_allowed"] for r in out2] == [True]


def test_seeds_from_sitemaps_bootstraps_crawl(spark, mini_cfg, mini_web, tmp_path):
    """Composition: robots bodies -> sitemap seeds -> CrawlRun.bootstrap
    (the live-crawl entry-point chain)."""
    from sparkcrawl.operators.robots import seeds_from_sitemaps
    from sparkcrawl.plans.superstep import CrawlRun
    from sparkcrawl.schemas import SEEDS_SCHEMA

    seed_url = mini_web["seeds"].first()["url"]
    host = seed_url.split("/")[2]
    bodies = spark.createDataFrame(
        [(host, f"User-agent: *\nAllow: /\nSitemap: {seed_url}\n"
                f"Sitemap: {seed_url}\n")],  # duplicate directive: deduped
        ["host", "body"],
    )
    seeds = seeds_from_sitemaps(bodies)
    assert [f.name for f in seeds.schema.fields] == [
        f.name for f in SEEDS_SCHEMA.fields
    ]
    rows = seeds.collect()
    assert len(rows) == 1 and rows[0]["url"] == seed_url

    run = CrawlRun(spark, str(tmp_path / "w"), mini_cfg,
                   mini_web["web"], mini_web["robots"])
    stats = run.run(seeds, max_supersteps=1)
    assert stats and stats[0].fetched > 0


def test_live_robots_discovery_supersteps(spark, mini_cfg, tmp_path):
    """cfg.fetch_robots: unknown hosts defer one superstep while
    /robots.txt is fetched+parsed into the RobotsTable; parsed rules
    gate later supersteps, absent robots.txt becomes allow-all."""
    import dataclasses

    from pyspark.sql import functions as F

    from sparkcrawl.plans.superstep import CrawlRun
    from sparkcrawl.schemas import SEEDS_SCHEMA, WEB_SCHEMA

    def page(url, body):
        return (url, 200, "text/html", None, None, None, body)

    web = spark.createDataFrame(
        [
            ("http://a.example/robots.txt", 200, "text/plain", None, None,
             None, "User-agent: *\nDisallow: /private\n"),
            page("http://a.example/",
                 '<a href="/private/x">p</a><a href="/pub">q</a>'),
            page("http://a.example/pub", "public"),
            page("http://b.example/", '<a href="/ok">k</a>'),
            page("http://b.example/ok", "fine"),
            # b.example has NO robots.txt row -> connection error -> allow-all
        ],
        schema=WEB_SCHEMA,
    )
    seeds = spark.createDataFrame(
        [("http://a.example/", 1), ("http://b.example/", 1)],
        schema=SEEDS_SCHEMA,
    )
    cfg = dataclasses.replace(mini_cfg, fetch_robots=True)
    run = CrawlRun(spark, str(tmp_path / "w"), cfg, web, None)
    stats = run.run(seeds, max_supersteps=4)

    # superstep 1: every host unknown -> whole batch deferred, nothing fetched
    assert stats[0].batch_size == 0 and stats[0].fetched == 0

    rules = run.robots_table.read(spark)
    by_host = {}
    for r in rules.collect():
        by_host.setdefault(r["host"], []).append(r)
    assert any(not r["allow"] and r["path_prefix"] == "/private"
               for r in by_host["a.example"])
    assert [(r["allow"], r["path_prefix"]) for r in by_host["b.example"]] == [
        (True, "/")]  # allow-all marker for the robots-less host

    fr = {r["url"]: r["state"] for r in run.frontier.read(spark).collect()}
    assert fr["http://a.example/private/x"] == "gone"     # gated by parsed rule
    assert fr["http://a.example/pub"] == "pending"        # fetched + requeued
    assert fr["http://b.example/ok"] == "pending"
    log_urls = {r["url"] for r in run.fetch_log.read(spark).collect()}
    assert "http://a.example/private/x" not in log_urls   # never fetched

    # kill/replay safety: resume continues with the same rule table
    more = run.resume(max_supersteps=1)
    assert run.robots_table.read(spark).count() == rules.count()


def test_robots_ttl_refetch(spark, mini_cfg, tmp_path):
    """robots_ttl_supersteps: expired rule generations make the host
    unknown again -> re-defer + re-fetch; the newer generation
    supersedes in RobotsTable.read()."""
    import dataclasses

    from sparkcrawl.plans.superstep import CrawlRun
    from sparkcrawl.schemas import SEEDS_SCHEMA, WEB_SCHEMA

    web = spark.createDataFrame(
        [("http://a.example/", 200, "text/html", None, None, None,
          '<a href="/p1">x</a><a href="/p2">y</a>'),
         ("http://a.example/p1", 200, "text/html", None, None, None, "one"),
         ("http://a.example/p2", 200, "text/html", None, None, None, "two")],
        schema=WEB_SCHEMA,
    )
    seeds = spark.createDataFrame([("http://a.example/", 1)], schema=SEEDS_SCHEMA)
    cfg = dataclasses.replace(mini_cfg, fetch_robots=True, robots_ttl_supersteps=2)
    run = CrawlRun(spark, str(tmp_path / "w"), cfg, web, None)
    stats = run.run(seeds, max_supersteps=4)

    # ss1: unknown -> defer; ss2: gen-1 rules valid; ss3: gen 1 expired
    # (1 > 3-2 is false) -> defer + re-fetch; ss4: gen-3 rules valid
    assert stats[0].batch_size == 0
    assert stats[1].batch_size > 0
    assert stats[2].batch_size == 0
    assert stats[3].batch_size > 0

    rules = run.robots_table.read(spark).collect()
    assert {r["fetched_superstep"] for r in rules} == {3}  # latest gen only
    raw = run.robots_table.store.read_raw(spark)
    assert {r["fetched_superstep"] for r in raw.collect()} == {1, 3}


WILDCARD_RULES = [
    # pdf.example: no PDFs anywhere ('$' anchors, '*' spans segments)
    ("pdf.example", "*", False, "/*.pdf$", None),
    ("pdf.example", "*", True, "/", None),
    # cal.example: calendar trap pages denied by infix wildcard
    ("cal.example", "*", False, "/cal/*/day", None),
    # mixed.example: wildcard deny vs LONGER plain-prefix allow
    ("mixed.example", "*", False, "/files/*", None),
    ("mixed.example", "*", True, "/files/public/", None),
    # meta.example: regex metachars in a plain rule stay literal
    ("meta.example", "*", False, "/a+b(c).d", None),
]


def test_robots_gate_wildcards(spark):
    """RFC 9309 pattern rules: '*' any run, trailing '$' end anchor;
    longest rule text still wins across plain/pattern rules."""
    robots = spark.createDataFrame(WILDCARD_RULES, ROBOTS_SCHEMA)
    urls = [
        "http://pdf.example/docs/report.pdf",     # matches /*.pdf$ -> deny
        "http://pdf.example/docs/report.pdfx",    # '$' anchored -> allow
        "http://pdf.example/docs/report.html",    # allow
        "http://cal.example/cal/2026-01/day",     # infix '*' -> deny
        "http://cal.example/cal/2026-01/week",    # no 'day' tail -> allow
        "http://mixed.example/files/a.zip",       # wildcard deny
        "http://mixed.example/files/public/a",    # longer plain allow wins
        "http://meta.example/a+b(c).d",           # literal metachars deny
        "http://meta.example/aab(c)xd",           # no regex meaning -> allow
    ]
    out = {
        r["url"]: r["robots_allowed"]
        for r in robots_gate(_batch(spark, urls), robots).collect()
    }
    assert out == {
        "http://pdf.example/docs/report.pdf": False,
        "http://pdf.example/docs/report.pdfx": True,
        "http://pdf.example/docs/report.html": True,
        "http://cal.example/cal/2026-01/day": False,
        "http://cal.example/cal/2026-01/week": True,
        "http://mixed.example/files/a.zip": False,
        "http://mixed.example/files/public/a": True,
        "http://meta.example/a+b(c).d": False,
        "http://meta.example/aab(c)xd": True,
    }


def test_robots_policy_delta(spark):
    """Generation diff through the real gate: tighten, loosen, and
    no-change hosts classify per URL; precedence still applies within
    each generation (allow-beats-disallow on ties); both rule joins
    broadcast."""
    import contextlib
    import io

    from pyspark.sql import functions as F
    from sparkcrawl.operators.robots import robots_policy_delta

    batch = spark.createDataFrame(
        [(1, "http://a.example/keep", "a.example"),
         (2, "http://a.example/sec/page", "a.example"),
         (3, "http://b.example/old-denied", "b.example"),
         (4, "http://c.example/x", "c.example")],
        "url_hash long, url string, host string")
    # old: a denies nothing; b denies /old-denied; c denies /x
    old = spark.createDataFrame(
        [("b.example", "*", False, "/old-denied"),
         ("c.example", "*", False, "/x")],
        "host string, agent string, allow boolean, path_prefix string")
    # new: a denies /sec but re-allows /sec/page (longest match wins);
    # b empty (loosened); c unchanged
    new = spark.createDataFrame(
        [("a.example", "*", False, "/sec"),
         ("a.example", "*", True, "/sec/page"),
         ("c.example", "*", False, "/x")],
        "host string, agent string, allow boolean, path_prefix string")
    out = robots_policy_delta(batch, old, new)
    got = {r["url_hash"]: r for r in out.collect()}
    assert got[1]["change"] == "unchanged" and got[1]["allowed_new"]
    # /sec/page: the longer allow rule overrides the /sec disallow
    assert got[2]["change"] == "unchanged" and got[2]["allowed_new"]
    assert got[3]["change"] == "now_allowed"
    assert got[4]["change"] == "unchanged" and not got[4]["allowed_new"]

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    p = buf.getvalue()
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_failure_markers_policies(spark):
    """R1 failure semantics: 'allow' marks every ruleless host
    allow-all; 'rfc9309' splits 4xx (unavailable -> allow) from
    5xx/transport-error (unreachable -> DENY-all), and the deny marker
    actually denies through the real R2 gate."""
    import pytest as _pytest

    from sparkcrawl.operators.robots import failure_markers, robots_gate

    rfetched = spark.createDataFrame(
        [("h200", 200), ("h404", 404), ("h500", 500), ("hconn", None),
         ("hok", 200)],
        schema="host string, status_code int",
    )
    parsed = spark.createDataFrame([("hok",)], ["host"])  # hok has rules

    legacy = {r["host"]: r["allow"]
              for r in failure_markers(rfetched, parsed, "allow").collect()}
    assert legacy == {"h200": True, "h404": True, "h500": True,
                      "hconn": True}

    rfc = {r["host"]: r["allow"]
           for r in failure_markers(rfetched, parsed, "rfc9309").collect()}
    assert rfc == {"h200": True, "h404": True, "h500": False,
                   "hconn": False}

    with _pytest.raises(ValueError):
        failure_markers(rfetched, parsed, "bogus")

    # the deny marker denies every URL of the host through the gate
    markers = failure_markers(rfetched, parsed, "rfc9309")
    batch = spark.createDataFrame(
        [("http://h500/x", "h500", "a" * 40),
         ("http://h404/x", "h404", "b" * 40)],
        ["url", "host", "url_hash"])
    gated = {r["host"]: r["robots_allowed"]
             for r in robots_gate(batch, markers).collect()}
    assert gated == {"h500": False, "h404": True}


def test_agent_policy_diff(spark):
    """A googlebot whitelist on a '*'-denied host flags selective;
    equal-policy and no-rule hosts do not; counts hand-checked."""
    from pyspark.sql import functions as F

    from sparkcrawl.operators.robots import agent_policy_diff

    urls = [
        ("open.example", "/a"), ("open.example", "/b"),
        ("vip.example", "/a"), ("vip.example", "/b"),
        ("none.example", "/x"),
    ]
    batch = spark.createDataFrame(
        [(h, f"http://{h}{p}") for h, p in urls], ["host", "url"]
    ).withColumn("url_hash", F.md5("url"))
    rules = spark.createDataFrame(
        [("open.example", "*", False, "/a", None),
         ("vip.example", "*", False, "/", None),
         ("vip.example", "googlebot", True, "/", None)],
        "host string, agent string, allow boolean, "
        "path_prefix string, crawl_delay double")
    got = {r["host"]: r for r in agent_policy_diff(batch, rules).collect()}
    o = got["open.example"]
    assert (o["n_urls"], o["n_a_allowed"], o["n_b_allowed"]) == (2, 1, 1)
    assert o["n_diff"] == 0 and not o["selective"]
    v = got["vip.example"]
    assert (v["n_a_allowed"], v["n_b_allowed"]) == (0, 2)
    assert v["n_diff"] == 2 and v["selective"]
    n = got["none.example"]
    assert n["n_diff"] == 0 and n["n_a_allowed"] == 1
