"""Crawl-saturation analytics over the checkpoint log."""

from pyspark.sql import functions as F


def test_crawl_saturation_hand_case(spark):
    from sparkcrawl.plans.analytics import crawl_saturation

    rows = [
        # superstep, seen, fetched, discovered
        (1, 100, 10, 200),   # seeds + first wave: all novel-ish
        (2, 250, 50, 300),   # 150 new of 300 discovered
        (3, 280, 60, 300),   # saturating: 30 new of 300
        (4, 280, 0, 0),      # idle superstep: rates undefined
    ]
    cp = spark.createDataFrame(
        rows, "superstep int, urls_seen_count long, fetched_count long,"
              " discovered_count long")
    got = {r["superstep"]: r for r in crawl_saturation(cp).collect()}
    assert got[1]["new_seen"] == 100 and got[2]["new_seen"] == 150
    assert got[2]["yield_per_fetch"] == 6.0
    assert got[2]["novelty_rate"] == 0.5 and got[2]["saturation"] == 0.5
    assert got[3]["novelty_rate"] == 0.1 and got[3]["saturation"] == 0.9
    assert got[2]["seen_growth_rate"] == 1.5
    # undefined guards
    assert got[1]["seen_growth_rate"] is None          # no prior seen
    assert got[4]["yield_per_fetch"] is None
    assert got[4]["novelty_rate"] is None and got[4]["saturation"] is None


def test_crawl_saturation_from_real_run(spark, mini_cfg, mini_web, tmp_path):
    """Over an actual engine run's checkpoint log: monotone seen totals,
    new_seen sums to the final seen count, saturation rises as the
    fixture web exhausts."""
    from sparkcrawl.plans.analytics import crawl_saturation
    from sparkcrawl.plans.superstep import CrawlRun

    run = CrawlRun(spark, str(tmp_path / "c"), mini_cfg,
                   mini_web["web"], mini_web["robots"])
    run.run(mini_web["seeds"], max_supersteps=4)
    cp = run.checkpoints.read(spark)
    out = crawl_saturation(cp.select(
        "superstep", "urls_seen_count", "fetched_count",
        "discovered_count")).orderBy("superstep").collect()
    # superstep 0 is the bootstrap checkpoint (seed injection)
    assert [r["superstep"] for r in out] == [0, 1, 2, 3, 4]
    assert sum(r["new_seen"] for r in out) == out[-1]["seen_total"]
    rates = [r["saturation"] for r in out if r["saturation"] is not None]
    assert rates and rates[-1] >= rates[0]  # fixture web exhausts


def test_curation_audit_first_failing_stage(spark):
    """Each doc's drop_reason is the FIRST pipeline stage that rejects
    it; dedup keepers are chosen among gate-passers only."""
    from sparkcrawl.plans.analytics import curation_audit

    good = ("the cat and the dog sat near the house of value and worth "
            "today while the table was set with plates and cups for all "
            "the family members who came to visit from the town nearby "
            "and stayed for dinner that evening with wine. "
            "It was a fine meal. Everyone went home happy afterwards.")
    rows = [
        (1, good),                                   # kept
        (2, good),                                   # exact dup of 1
        (3, "short"),                                # fails quality AND gopher -> quality first
        (4, good + " { code block }"),               # passes gates until c4 curly brace
        (5, good * 1 + " ### " * 40),                # symbol stuffing -> gopher
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["drop_reason"], r["kept"])
           for r in curation_audit(docs, min_quality=0.3).collect()}
    assert got[1] == (None, True)
    assert got[2] == ("exact_dup", False)
    assert got[3][0] == "quality"          # quality precedes gopher
    assert got[4][0] == "c4"
    assert got[5][0] == "gopher"
    # a dup of a GATE-FAILING doc is not an exact_dup: its twin never
    # reached dedup, so the first passer keeps its own copy
    rows2 = rows + [(6, "short")]
    docs2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    got2 = {r["doc_id"]: r["drop_reason"]
            for r in curation_audit(docs2).collect()}
    assert got2[6] == "quality"


def test_sitemap_coverage(spark):
    from sparkcrawl.plans.analytics import sitemap_coverage

    locs = spark.createDataFrame(
        [("http://A.EXAMPLE:80/p1",),              # raw: case + default port
         ("http://a.example/p2#frag",),            # raw: fragment
         ("http://a.example/p2",),                 # duplicate declaration
         ("http://a.example/p3",), ("http://b.example/q1",)],
        ["loc"])
    seen = spark.createDataFrame(
        [("http://a.example/p1",), ("http://a.example/p2",),
         ("http://c.example/zz",)],                # seen but undeclared
        ["url"])
    got = {r["host"]: r for r in sitemap_coverage(locs, seen).collect()}
    # raw <loc> forms canonicalize before matching: p1 and p2 count as
    # seen even though their declared spellings differ from the
    # frontier's canonical URLs (the r4-advice understatement bug)
    assert got["a.example"]["n_declared"] == 3
    assert got["a.example"]["n_seen"] == 2
    assert got["a.example"]["coverage"] == round(2 / 3, 6)
    assert got["b.example"]["coverage"] == 0.0
    assert "c.example" not in got     # coverage is declared-side only


def test_domain_token_yield(spark):
    """Per-domain yield + smoothed budget weight: hand-checked values,
    weights sum to 1, and the global-total join is a broadcast (no
    CartesianProduct, no window, no extra shuffle)."""
    import contextlib
    import io

    from sparkcrawl.plans.analytics import domain_token_yield

    rows = [
        ("a.com", 1000, 100),
        ("a.com", 1000, 300),
        ("b.com", 2048, 10),
    ]
    fetched = spark.createDataFrame(
        rows, "domain string, n_bytes long, n_tokens long")
    out = domain_token_yield(fetched, alpha=1.0)
    got = {r["domain"]: r for r in out.collect()}
    assert got["a.com"]["n_docs"] == 2
    assert got["a.com"]["total_bytes"] == 2000
    assert got["a.com"]["total_tokens"] == 400
    assert got["a.com"]["tokens_per_kb"] == 204.8
    assert got["b.com"]["tokens_per_kb"] == 5.0
    # smoothed weights: (400+1)/(410+2) and (10+1)/(410+2)
    assert got["a.com"]["budget_weight"] == round(401 / 412, 6)
    assert got["b.com"]["budget_weight"] == round(11 / 412, 6)
    assert abs(sum(r["budget_weight"] for r in got.values()) - 1.0) < 1e-5

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "Window" not in p
    assert "Broadcast" in p


def test_domain_dup_rate(spark):
    """First-wins on the lowest id; self vs cross attribution; clean
    domains report zero."""
    from sparkcrawl.plans.analytics import domain_dup_rate

    rows = [
        (1, "a.example", "same text"),
        (2, "a.example", "same text"),      # self dup of 1
        (3, "b.example", "same text"),      # cross dup of 1
        (4, "b.example", "unique b"),
        (5, "c.example", "unique c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "domain", "text"])
    got = {r["domain"]: r for r in domain_dup_rate(df).collect()}
    assert got["a.example"]["n_dups"] == 1
    assert got["a.example"]["cross_domain_dups"] == 0
    assert got["a.example"]["dup_rate"] == 0.5
    assert got["b.example"]["n_dups"] == 1
    assert got["b.example"]["cross_domain_dups"] == 1
    assert got["c.example"]["n_dups"] == 0 and got["c.example"]["dup_rate"] == 0.0


def test_crawl_value_weights(spark):
    """Mirror-farm discount: equal token yields but 90% dup content
    collapses a domain's weight; unmatched domains keep full yield;
    weights sum to ~1."""
    from sparkcrawl.plans.analytics import crawl_value_weights

    yields = spark.createDataFrame(
        [("good.example", 1000.0), ("mirror.example", 1000.0),
         ("fresh.example", 500.0)],
        ["domain", "total_tokens"])
    dups = spark.createDataFrame(
        [("good.example", 0.0), ("mirror.example", 0.9)],
        ["domain", "dup_rate"])
    got = {r["domain"]: r
           for r in crawl_value_weights(yields, dups, alpha=0.0).collect()}
    assert got["mirror.example"]["effective_tokens"] == 100.0
    assert got["fresh.example"]["effective_tokens"] == 500.0  # no dup row
    total = 1000.0 + 100.0 + 500.0
    assert got["good.example"]["weight"] == round(1000 / total, 6)
    assert abs(sum(r["weight"] for r in got.values()) - 1.0) < 1e-9


def test_depth_yield(spark):
    """Depth = non-empty path segments (query excluded, root = 0);
    shares sum to 1."""
    from sparkcrawl.plans.analytics import depth_yield

    rows = [
        ("http://h.example/", 10),
        ("http://h.example/a", 20),
        ("http://h.example/a/b/?q=/x/y", 30),   # query slashes ignored
        ("http://h.example/a/b/c", 40),
    ]
    df = spark.createDataFrame(rows, ["url", "n_tokens"])
    got = {r["depth"]: r for r in depth_yield(df).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[2]["total_tokens"] == 30
    assert got[3]["tokens_per_doc"] == 40.0
    assert abs(sum(r["token_share"] for r in got.values()) - 1.0) < 1e-6


def test_link_rot(spark):
    """Unfetched targets stay unknown (never dead); duplicate edges
    collapse; an all-unresolved domain reports NULL share."""
    from sparkcrawl.plans.analytics import link_rot

    edges = spark.createDataFrame(
        [
            ("a", "http://t/1"), ("a", "http://t/1"),   # dup edge
            ("a", "http://t/2"), ("a", "http://t/3"),
            ("b", "http://t/9"),                         # never fetched
        ],
        ["src_domain", "dst_url"])
    outcomes = spark.createDataFrame(
        [
            ("http://t/1", "not_found"),
            ("http://t/2", "success"),
            # t/3 never fetched
        ],
        ["url", "outcome"])
    got = {r["src_domain"]: r for r in link_rot(edges, outcomes).collect()}
    a = got["a"]
    assert (a["n_links"], a["n_resolved"], a["n_dead"]) == (3, 2, 1)
    assert a["dead_share"] == 0.5
    b = got["b"]
    assert (b["n_links"], b["n_resolved"], b["n_dead"]) == (1, 0, 0)
    assert b["dead_share"] is None


def test_priority_drift_psi(spark):
    """Identical snapshots -> PSI 0 ('stable'); a wholesale shift to a
    new bin -> 'major'; hand-checked smoothed arithmetic on a tiny
    case with a vanished bin."""
    import math

    from sparkcrawl.plans.analytics import priority_drift_psi

    same = spark.createDataFrame([(1,)] * 6 + [(2,)] * 4, ["priority"])
    row = priority_drift_psi(same, same).collect()[0]
    assert row["psi"] == 0.0 and row["drift"] == "stable"
    assert (row["total_before"], row["total_after"]) == (10, 10)

    before = spark.createDataFrame([(1,)] * 8 + [(2,)] * 2, ["priority"])
    after = spark.createDataFrame([(3,)] * 10, ["priority"])
    row = priority_drift_psi(before, after).collect()[0]
    assert row["n_bins"] == 3 and row["drift"] == "major"
    pa = [(8 + .5) / 11.5, (2 + .5) / 11.5, .5 / 11.5]
    pb = [.5 / 11.5, .5 / 11.5, (10 + .5) / 11.5]
    exp = sum((b - a) * math.log(b / a) for a, b in zip(pa, pb))
    assert abs(row["psi"] - exp) < 1e-6


def test_discovery_forecast(spark):
    """A clean halving series recovers r~0.5 with r2~1 and a finite
    ETA; a growing series yields NULL ETA; degenerate logs guard."""
    from sparkcrawl.plans.analytics import discovery_forecast

    cp = spark.createDataFrame(
        [(t, 1 << (12 - t)) for t in range(10)],
        ["superstep", "new_urls"])
    row = discovery_forecast(cp).collect()[0]
    assert row["n_points"] == 10
    assert abs(row["decay_r"] - 0.5) < 1e-6
    assert row["r2"] == 1.0
    assert row["next_yield"] == 4.0            # 2^(12-10)
    assert 12 <= row["eta_supersteps"] <= 13   # 2^(12-t) < 1 at t=13
    growing = spark.createDataFrame(
        [(t, 100 * (t + 1)) for t in range(6)], ["superstep", "new_urls"])
    g = discovery_forecast(growing).collect()[0]
    assert g["decay_r"] > 1.0 and g["eta_supersteps"] is None
    single = spark.createDataFrame([(0, 50)], ["superstep", "new_urls"])
    s = discovery_forecast(single).collect()[0]
    assert s["n_points"] == 1 and s["decay_r"] is None


def test_sitemap_gate_conflicts(spark):
    """Declared-but-denied URLs count through the real gate; an
    allow-all host reports zero share; duplicate locs collapse."""
    from pyspark.sql import functions as F

    from sparkcrawl.plans.analytics import sitemap_gate_conflicts

    locs = spark.createDataFrame(
        [("http://a.example/secret/1",),
         ("http://a.example/secret/1",),      # dup declaration
         ("http://a.example/keep/2",),
         ("http://b.example/anything",)],
        ["loc"])
    rules = spark.createDataFrame(
        [("a.example", "*", False, "/secret/", None)],
        "host string, agent string, allow boolean, "
        "path_prefix string, crawl_delay double")
    got = {r["host"]: r
           for r in sitemap_gate_conflicts(locs, rules).collect()}
    a = got["a.example"]
    assert (a["n_declared"], a["n_denied"]) == (2, 1)
    assert a["denied_share"] == 0.5
    b = got["b.example"]
    assert b["n_denied"] == 0 and b["denied_share"] == 0.0
