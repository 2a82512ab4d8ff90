"""C9: eTLD+1 registered-domain extraction (public-suffix snapshot)."""

from pyspark.sql import functions as F

from sparkcrawl.config import CrawlConfig
from sparkcrawl.functions.domains import registered_domain, registered_domain_py

CASES = {
    # 2-label ICANN suffix: both subdomains share example.co.uk
    "a.shop.example.co.uk": "example.co.uk",
    "b.shop.example.co.uk": "example.co.uk",
    "example.co.uk": "example.co.uk",
    # plain gTLD
    "foo.example.com": "example.com",
    "example.com": "example.com",
    # private registry: each user site is its own registrable domain
    "alice.github.io": "alice.github.io",
    "deep.alice.github.io": "alice.github.io",
    # a public suffix used as a host stays itself
    "co.uk": "co.uk",
    # unknown TLD: last two labels
    "host003.example": "host003.example",
    "www.host003.example": "host003.example",
    # IPv4 + single label
    "192.168.0.1": "192.168.0.1",
    "localhost": "localhost",
    # label that merely ENDS with a suffix string is not a match
    "xco.uk": "xco.uk",
    # wildcard rule *.ck: any single label under .ck is a public suffix
    "foo.bar.ck": "foo.bar.ck",
    "deep.foo.bar.ck": "foo.bar.ck",
    # a wildcard public suffix used as a host falls back (last two)
    "bar.ck": "bar.ck",
    # exception rule !www.ck beats the covering wildcard
    "www.ck": "www.ck",
    "a.www.ck": "www.ck",
    # 2-label wildcard base *.kawasaki.jp + its exception
    "x.y.kawasaki.jp": "x.y.kawasaki.jp",
    "city.kawasaki.jp": "city.kawasaki.jp",
    "sub.city.kawasaki.jp": "city.kawasaki.jp",
}


def test_registered_domain_py():
    for host, want in CASES.items():
        assert registered_domain_py(host) == want, host


def test_registered_domain_column_matches_py(spark):
    df = spark.createDataFrame([(h,) for h in CASES], ["host"])
    got = {
        r["host"]: r["rd"]
        for r in df.select("host", registered_domain(F.col("host")).alias("rd")).collect()
    }
    assert got == CASES


def test_alternation_matches_py_spec_fuzz(spark):
    """The single-alternation-regex column must agree with the
    longest-suffix-first Python spec on generated multi-label hosts."""
    import itertools

    labels = ["a", "b9", "shop", "xco", "blogspot", "s3", "co", "uk",
              "com", "github", "io", "example", "internal"]
    hosts = {".".join(p) for n in (1, 2, 3)
             for p in itertools.islice(itertools.permutations(labels, n), 300)}
    hosts |= {"x." + s for s in ("co.uk", "blogspot.com", "s3.amazonaws.com", "uk")}
    df = spark.createDataFrame([(h,) for h in sorted(hosts)], ["host"])
    got = {r["host"]: r["rd"] for r in
           df.select("host", registered_domain(F.col("host")).alias("rd")).collect()}
    for h in hosts:
        assert got[h] == registered_domain_py(h), h


def test_subdomains_share_politeness_queue(spark):
    """north_star: grouping by registered domain puts sibling subdomains
    in ONE politeness domain (host mode would split them)."""
    from sparkcrawl.plans.superstep import frontier_rows_from_urls

    urls = spark.createDataFrame(
        [("http://a.shop.example.co.uk/p",), ("http://b.shop.example.co.uk/q",)],
        ["url"],
    )
    cfg_on = CrawlConfig(use_public_suffix=True)
    rows = frontier_rows_from_urls(urls, cfg_on, superstep=0, t0=cfg_on.t0).collect()
    assert {r["registered_domain"] for r in rows} == {"example.co.uk"}
    assert len({r["queue"] for r in rows}) == 1

    cfg_off = CrawlConfig()  # parity default: host-based
    rows = frontier_rows_from_urls(urls, cfg_off, superstep=0, t0=cfg_off.t0).collect()
    assert {r["registered_domain"] for r in rows} == {
        "a.shop.example.co.uk", "b.shop.example.co.uk"
    }


def test_load_real_psl_file_syntax(spark, tmp_path):
    """load_public_suffix_list parses the REAL public_suffix_list.dat
    syntax — comments, blank lines, section markers, trailing junk
    after whitespace, wildcard + exception rules — and the swapped-in
    rule set changes registered_domain plan-wide (then restores)."""
    from sparkcrawl.functions.domains import (
        load_public_suffix_list,
        registered_domain,
        registered_domain_py,
        set_public_suffix_rules,
    )

    dat = tmp_path / "public_suffix_list.dat"
    dat.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "\n"
        "// ck : https://example\n"
        "*.ck\n"
        "!www.ck\n"
        "com\n"
        "co.uk   // trailing comment after whitespace is ignored\n"
        "// ===BEGIN PRIVATE DOMAINS===\n"
        "EXAMPLE.dyndns.org\n"          # case-folded on load
        "// ===END PRIVATE DOMAINS===\n",
        encoding="utf-8",
    )
    rules = load_public_suffix_list(str(dat))
    assert rules == ("*.ck", "!www.ck", "com", "co.uk", "example.dyndns.org")

    set_public_suffix_rules(rules)
    try:
        cases = {
            "a.b.www.ck": "www.ck",          # exception beats wildcard
            "x.other.ck": "x.other.ck",      # wildcard: other.ck is a suffix
            "a.shop.co.uk": "shop.co.uk",
            # example.dyndns.org is a SUFFIX: registrable = suffix + 1 label
            "deep.sub.example.dyndns.org": "sub.example.dyndns.org",
            "foo.bar.com": "bar.com",
            # dyndns.org itself is NOT a suffix in this file: last-two fallback
            "me.dyndns.org": "dyndns.org",
        }
        df = spark.createDataFrame([(h,) for h in cases], ["host"])
        got = {
            r["host"]: r["rd"]
            for r in df.select(
                "host", registered_domain(F.col("host")).alias("rd")
            ).collect()
        }
        for h, want in cases.items():
            assert got[h] == want, (h, got[h])
            assert registered_domain_py(h) == want, h  # python twin agrees
    finally:
        set_public_suffix_rules(None)  # restore the bundled snapshot
    # restored: snapshot semantics back in force
    df2 = spark.createDataFrame([("me.dyndns.org",)], ["host"])
    assert df2.select(
        registered_domain(F.col("host")).alias("rd")
    ).collect()[0]["rd"] == "dyndns.org"


def test_bundled_psl_file_full_scale(spark):
    """The bundled sparkcrawl/data/public_suffix_list.dat (real PSL
    format, 800+ rules incl. wildcards + exceptions in both the c9
    families and the wider ICANN/private sections) loads, activates,
    and is RESULT-COMPATIBLE with the inline snapshot on every c9
    fixture host class — the compatibility gate that lets a deployment
    swap in the full publicsuffix.org list without moving the oracle."""
    from sparkcrawl.functions.domains import (
        bundled_psl_path,
        load_public_suffix_list,
        registered_domain,
        registered_domain_py,
        set_public_suffix_rules,
    )

    rules = load_public_suffix_list(bundled_psl_path())
    assert len(rules) > 800
    assert "*.ck" in rules and "!www.ck" in rules
    assert "*.kawasaki.jp" in rules and "!city.kawasaki.jp" in rules
    assert "example" not in rules  # fixture hosts must keep last-two fallback

    hosts = [
        "a0.shop.example.co.uk", "b1.example.com.au", "c2.github.io",
        "e3.island.ck", "f4.www.ck", "g0.pref.kawasaki.jp",
        "city.kawasaki.jp", "d1.host7.example", "10.1.2.3",
        "x.co.il", "y.com.tw", "deep.a.netlify.app", "n.city.nagoya.jp",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])

    def run():
        return {
            r["host"]: r["rd"]
            for r in df.select(
                "host", registered_domain(F.col("host")).alias("rd")
            ).collect()
        }

    before = run()
    set_public_suffix_rules(rules)
    try:
        after = run()
        # python twin agrees under the file rules (full PSL semantics)
        for h in hosts:
            assert registered_domain_py(h) == after[h], h
        # file-only rules actually bite...
        assert after["x.co.il"] == "x.co.il"           # co.il is a suffix now
        assert after["deep.a.netlify.app"] == "a.netlify.app"
        # exception !city.nagoya.jp beats wildcard *.nagoya.jp
        assert after["n.city.nagoya.jp"] == "city.nagoya.jp"
        # ...while every inline-covered class is unchanged (c9 parity)
        for h in ("a0.shop.example.co.uk", "b1.example.com.au",
                  "c2.github.io", "e3.island.ck", "f4.www.ck",
                  "g0.pref.kawasaki.jp", "city.kawasaki.jp",
                  "d1.host7.example", "10.1.2.3"):
            assert after[h] == before[h], h
    finally:
        set_public_suffix_rules(None)
