"""URL-level quality filtering (RefinedWeb-style pre-fetch gate)."""

from pyspark.sql import functions as F


def test_url_quality_filter_rules(spark):
    from sparkcrawl.operators.urlfilter import url_quality_filter

    rows = [
        (1, "http://good.example.com/page"),
        (2, "http://x.blocked.example/page"),          # blocklisted domain
        (3, "http://good.example.com/casino/slots"),   # keyword hit
        (4, "http://1234567890123.ex/p"),              # digit-heavy host
        (5, "http://good.example.com/p?" + "&".join(f"k{i}=1" for i in range(12))),
        (6, "http://good.example.com/" + "p" * 600),   # overlong
    ]
    bl = spark.createDataFrame([("blocked.example",)], ["domain"])
    out = {
        r["id"]: r
        for r in url_quality_filter(
            spark.createDataFrame(rows, ["id", "url"]), blocklist=bl
        ).collect()
    }
    assert out[1]["keep"]
    assert out[2]["blocked"] and not out[2]["keep"]
    assert out[3]["kw_hits"] == 1 and not out[3]["keep"]
    assert out[4]["host_digit_frac"] > 0.5 and not out[4]["keep"]
    assert out[5]["n_params"] == 12 and not out[5]["keep"]
    assert out[6]["url_len"] > 512 and not out[6]["keep"]
    # registered domain feeds the blocklist join (not the raw host)
    assert out[2]["registered_domain"] == "blocked.example"


def test_url_quality_filter_no_blocklist(spark):
    from sparkcrawl.operators.urlfilter import url_quality_filter

    urls = spark.createDataFrame([(1, "http://a.example.com/x")], ["id", "url"])
    row = url_quality_filter(urls).collect()[0]
    assert not row["blocked"] and row["keep"]


def test_url_quality_filter_blocklist_is_broadcast(spark):
    """The blocklist join must be a broadcast, never a shuffle of the
    URL table onto a tiny dim."""
    import contextlib
    import io

    from sparkcrawl.operators.urlfilter import url_quality_filter

    urls = spark.range(1000).select(
        F.concat(F.lit("http://h"), F.col("id").cast("string"),
                 F.lit(".example.com/p")).alias("url")
    )
    bl = spark.createDataFrame([("blocked.example",)], ["domain"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        url_quality_filter(urls, blocklist=bl).explain("simple")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_confusable_domain_pairs(spark):
    """FastSS deletion-neighborhood join + levenshtein verify: finds
    exactly the distance<=1 pairs (substitution, deletion, insertion),
    never distance-2 collisions; output matches brute force."""
    from sparkcrawl.operators.urlfilter import confusable_domain_pairs

    rows = [
        ("paypal.example",),
        ("paypa1.example",),     # substitution
        ("paypall.example",),    # insertion
        ("papal.example",),      # deletion (y removed)
        ("amazon.example",),     # unrelated
        ("amazom.example",),     # substitution of amazon
        ("short",),              # below min_len=6
    ]
    hosts = spark.createDataFrame(rows, ["host"])
    got = {(r["domain_a"], r["domain_b"]): r["distance"]
           for r in confusable_domain_pairs(hosts, min_len=6).collect()}
    # brute-force ground truth over the eligible set
    import itertools
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]
    elig = sorted(r[0] for r in rows if len(r[0]) >= 6)
    want = {(x, y): lev(x, y) for x, y in itertools.combinations(elig, 2)
            if lev(x, y) <= 1}
    assert got == want
    assert ("amazom.example", "amazon.example") in got
    assert ("papal.example", "paypal.example") in got
    assert ("paypa1.example", "paypal.example") in got
    assert all("short" not in p for pair in got for p in pair)


def test_pagination_ranges(spark):
    """Query page= beats /page/N beats trailing /N; contiguity over
    observed counters; singletons dropped."""
    from sparkcrawl.operators.urlfilter import pagination_ranges

    rows = [
        ("http://h/list?page=1",), ("http://h/list?page=2",),
        ("http://h/list?page=4",),                      # gap -> not contiguous
        ("http://h/blog/page/7/",), ("http://h/blog/page/8/",),
        ("http://h/item/3",), ("http://h/item/4",), ("http://h/item/5",),
        ("http://h/one/9",),                            # singleton family
        ("http://h/nopage",),                           # no counter
        # page= in query wins even with a trailing numeric segment
        ("http://h/x/5?page=11",), ("http://h/x/5?page=12",),
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = {r["template"]: r for r in pagination_ranges(df).collect()}
    q = got["http://h/list?page={}"]
    assert (q["pages"], q["min_n"], q["max_n"], q["contiguous"]) \
        == (3, 1, 4, False)
    p = got["http://h/blog/page/{}/"]
    assert (p["pages"], p["min_n"], p["max_n"], p["contiguous"]) \
        == (2, 7, 8, True)
    t = got["http://h/item/{}"]
    assert (t["pages"], t["contiguous"]) == (3, True)
    assert got["http://h/x/5?page={}"]["pages"] == 2
    assert "http://h/one/{}" not in got          # singleton
    assert all("nopage" not in k for k in got)


def test_parked_domain_flags_and_hosts(spark):
    """Phrase landers park regardless of links; the ad block only
    parks together with link-deadness; the host rollup needs both the
    doc floor and the share bar."""
    from sparkcrawl.operators.urlfilter import (
        parked_domain_flags,
        parked_hosts,
    )

    rows = [
        ("sale.example", 1, "This DOMAIN is for sale today", 40),
        ("sale.example", 2, "Buy this domain now", 0),
        ("ads.example", 3, "related searches: pills", 1),
        ("ads.example", 4, "Sponsored Listings below", 2),
        ("rich.example", 5, "related links section", 90),   # not thin
        ("blog.example", 6, "my essay about domain names", 12),
        ("mixed.example", 7, "domain parking lot review essay "
                             "about the parked domain industry", 25),
        ("mixed.example", 8, "an ordinary article", 9),
    ]
    df = spark.createDataFrame(rows, ["host", "doc_id", "text", "n_links"])
    flags = parked_domain_flags(df)
    got = {r["doc_id"]: r for r in flags.collect()}
    assert got[1]["parked"] and got[1]["phrase_match"]
    assert got[2]["parked"]
    assert got[3]["parked"] and got[3]["ads_match"] and got[3]["thin"]
    assert not got[5]["parked"]          # ads but 90 links
    assert not got[6]["parked"]
    assert got[7]["phrase_match"]        # essay mentions the phrases...
    hosts = {r["host"]: r for r in parked_hosts(flags).collect()}
    assert hosts["sale.example"]["parked_host"]
    assert hosts["ads.example"]["parked_host"]
    assert not hosts["rich.example"]["parked_host"]
    # ...but the host share bar saves mixed.example (1 of 2 docs)
    assert not hosts["mixed.example"]["parked_host"]
    assert hosts["mixed.example"]["parked_share"] == 0.5


def test_shared_hosting_fan(spark):
    """Duplicate DNS rows collapse; subdomain families count many
    hosts but one registered domain; the fan bar flags."""
    from sparkcrawl.operators.urlfilter import shared_hosting_fan

    rows = [
        ("a.example.org", "1.1.1.1"), ("a.example.org", "1.1.1.1"),
        ("b.example.org", "1.1.1.1"), ("other.net", "1.1.1.1"),
        ("solo.net", "2.2.2.2"),
    ]
    df = spark.createDataFrame(rows, ["host", "ip"])
    got = {r["ip"]: r for r in shared_hosting_fan(df, min_hosts=3).collect()}
    fan = got["1.1.1.1"]
    assert fan["n_hosts"] == 3
    assert fan["n_domains"] == 2          # example.org + other.net
    assert fan["example_host"] == "a.example.org"
    assert fan["mass_hosting"]
    assert not got["2.2.2.2"]["mass_hosting"]


def test_host_ip_fan(spark):
    """A one-prefix CDN fan is multihomed but not scattered; a
    many-prefix flux fan is both; duplicates collapse."""
    from sparkcrawl.operators.urlfilter import host_ip_fan

    rows = (
        [("cdn.example", f"203.0.{i}.7") for i in range(10)]
        + [("cdn.example", "203.0.0.7")]          # dup
        + [("flux.example", f"{10 + i}.{i}.9.9") for i in range(9)]
        + [("plain.example", "198.51.100.1")]
    )
    df = spark.createDataFrame(rows, ["host", "ip"])
    got = {r["host"]: r for r in host_ip_fan(df, min_ips=8).collect()}
    cdn = got["cdn.example"]
    assert (cdn["n_ips"], cdn["n_prefixes"]) == (10, 1)
    assert cdn["multihomed"] and not cdn["scattered"]
    flux = got["flux.example"]
    assert flux["n_ips"] == 9 and flux["n_prefixes"] == 9
    assert flux["scattered"]
    assert not got["plain.example"]["multihomed"]
