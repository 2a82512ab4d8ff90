"""DUST rule mining + application (operators/dust.py)."""

from pyspark.sql import functions as F

from sparkcrawl.operators.dust import apply_dust_rules, mine_dust_rules


def _pages(spark):
    return spark.createDataFrame(
        [
            ("http://a.com/p1/index.html", "k1"),
            ("http://a.com/p1/", "k1"),
            ("http://a.com/p2/index.html", "k2"),
            ("http://a.com/p2/", "k2"),
            ("http://b.com/q/index.html", "k3"),
            ("http://b.com/q/", "k3"),
            ("https://d.com/x", "k5"),
            ("http://d.com/x", "k5"),
            ("http://c.com/solo", "k4"),
        ],
        "url string, content_key string",
    )


def test_mined_rule_is_oriented_longer_to_shorter(spark):
    rules = {
        (r.rule_from, r.rule_to): (r.support, r.n_hosts)
        for r in mine_dust_rules(_pages(spark)).collect()
    }
    assert ("index.html", "") in rules
    support, n_hosts = rules[("index.html", "")]
    assert support == 3 and n_hosts == 2
    # never the useless insertion direction
    assert ("", "index.html") not in rules


def test_single_observation_rules_are_dropped(spark):
    # the https->http pair ('s' -> '') has support 1 < min_support
    rules = mine_dust_rules(_pages(spark), min_support=2).collect()
    assert all(r.support >= 2 for r in rules)
    assert ("s", "") not in {(r.rule_from, r.rule_to) for r in rules}


def test_examples_witness_the_rule(spark):
    [r] = mine_dust_rules(_pages(spark)).collect()
    assert r.rule_from in r.example_from
    assert r.example_from.replace(r.rule_from, r.rule_to) == r.example_to


def test_apply_rewrites_only_matching_urls(spark):
    rules = mine_dust_rules(_pages(spark))
    urls = spark.createDataFrame(
        [("http://z.com/r/index.html",), ("http://z.com/other",)],
        "url string",
    )
    got = {
        r.url: r.dust_canonical
        for r in apply_dust_rules(urls, rules, min_support=2).collect()
    }
    assert got["http://z.com/r/index.html"] == "http://z.com/r/"
    assert got["http://z.com/other"] == "http://z.com/other"


def test_apply_picks_highest_support_rule(spark):
    rules = spark.createDataFrame(
        [("index.html", "", 10, 3), ("dex.html", "X", 2, 1)],
        "rule_from string, rule_to string, support long, n_hosts long",
    )
    urls = spark.createDataFrame([("http://z.com/index.html",)], "url string")
    [row] = apply_dust_rules(urls, rules, min_support=1).collect()
    assert row.dust_canonical == "http://z.com/"


def test_mega_group_pair_evidence_is_capped(spark):
    # 100 aliases of one key: uncapped would be 4950 pairs; capped at
    # max_group=6 the support can be at most C(6,2)=15
    rows = [(f"http://m.com/a{i:03d}/index.html", "kk") for i in range(100)]
    pages = spark.createDataFrame(rows, "url string, content_key string")
    rules = mine_dust_rules(pages, max_group=6, min_support=1).collect()
    assert all(r.support <= 15 for r in rules)


def test_mine_dust_from_warc_archive(spark, tmp_path):
    """The run_crawl --mine-dust composition: WARC archive captures ->
    cdx_index (url, payload digest) -> mined rules."""
    from sparkcrawl.sources.warc import cdx_index, write_warc

    rows = []
    for host in ("a.example", "b.example", "c.example"):
        body = f"<html>page of {host}</html>"
        rows.append((f"http://{host}/p/index.html", 200, "text/html",
                     body, "2026-01-01 00:00:00"))
        rows.append((f"http://{host}/p/", 200, "text/html",
                     body, "2026-01-01 00:00:01"))
    df = spark.createDataFrame(
        rows, ["url", "status_code", "content_type", "body", "fetched_at"]
    ).withColumn("fetched_at", F.to_timestamp("fetched_at"))
    out = str(tmp_path / "warc")
    write_warc(df, out).collect()

    idx = cdx_index(spark, out)
    rules = mine_dust_rules(
        idx.select(F.col("original").alias("url"),
                   F.col("digest").alias("content_key"))
    ).collect()
    assert [(r.rule_from, r.rule_to, r.support, r.n_hosts)
            for r in rules] == [("index.html", "", 3, 3)]


def test_dust_rewrite_column_first_match_wins(spark):
    from sparkcrawl.operators.dust import dust_rewrite_column

    rules = [("index.html", ""), ("dex.html", "X")]  # support-desc order
    urls = spark.createDataFrame(
        [("http://z.com/index.html",), ("http://z.com/dex.html",),
         ("http://z.com/plain",)],
        "url string",
    )
    got = {
        r.url: r.out for r in urls.withColumn(
            "out", dust_rewrite_column(F.col("url"), rules)
        ).collect()
    }
    assert got["http://z.com/index.html"] == "http://z.com/"  # rule 1, not 2
    assert got["http://z.com/dex.html"] == "http://z.com/X"
    assert got["http://z.com/plain"] == "http://z.com/plain"


def test_engine_applies_dust_rules_pre_fetch(spark, mini_cfg, mini_web, tmp_path):
    """cfg.dust_rules_file: every discovered /page/4 link is rewritten
    to /page/0 BEFORE dedup/fetch — the alias never enters the
    frontier and never spends fetch budget."""
    import dataclasses

    from sparkcrawl.plans.superstep import CrawlRun

    rules = spark.createDataFrame(
        [("/page/4", "/page/0", 10, 3, "e1", "e2")],
        "rule_from string, rule_to string, support long, n_hosts long,"
        "example_from string, example_to string",
    )
    rpath = str(tmp_path / "rules")
    rules.write.parquet(rpath)
    cfg = dataclasses.replace(mini_cfg, dust_rules_file=rpath)
    run = CrawlRun(spark, str(tmp_path / "crawl"), cfg,
                   mini_web["web"], mini_web["robots"])
    run.run(mini_web["seeds"], max_supersteps=4)
    frontier = run.frontier.read(spark)
    # seeds are injected before rewrite; only DISCOVERED links pass the
    # dust gate — no discovered /page/4 alias may survive
    seeds = {r.url for r in mini_web["seeds"].collect()}
    leaked = [
        r.url for r in frontier.select("url").collect()
        if "/page/4" in r.url and r.url not in seeds
    ]
    assert leaked == []
    # and the rewrite actually happened (page/0 exists in the frontier)
    assert frontier.filter(F.col("url").contains("/page/0")).count() > 0


def test_param_value_entropy(spark):
    """Known distributions: [2,2] -> ln 2 nats; unique-per-obs id
    param classed id_like; bare flag param (no '=') gets value '';
    fragments stop the query string; URLs without a query vanish."""
    import math

    from sparkcrawl.operators.dust import param_value_entropy

    rows = [
        ("http://a.example/l?page=1",),
        ("http://a.example/l?page=1",),
        ("http://a.example/l?page=2",),
        ("http://a.example/l?page=2#frag",),
        ("http://a.example/l?sid=x1",),
        ("http://a.example/l?sid=x2",),
        ("http://a.example/l?sid=x3",),
        ("http://a.example/l?flag&flag",),
        ("http://a.example/plain",),
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = {(r["host"], r["param"]): r
           for r in param_value_entropy(df).collect()}
    page = got[("a.example", "page")]
    assert (page["n_obs"], page["n_values"]) == (4, 2)
    assert page["entropy_nats"] == round(math.log(2), 6)
    assert page["param_class"] == "enum_like"
    sid = got[("a.example", "sid")]
    assert sid["distinct_ratio"] == 1.0
    assert sid["param_class"] == "id_like"
    assert sid["entropy_nats"] == round(math.log(3), 6)
    flag = got[("a.example", "flag")]
    assert (flag["n_obs"], flag["n_values"]) == (2, 1)
    assert flag["entropy_nats"] == 0.0
    assert len(got) == 3
