"""Bitext mining (URL-structure parallel pages) + mirror-host detection."""

import pytest
from pyspark.sql import functions as F

from sparkcrawl.operators import bitext, mirrors


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # one logical page in three languages, three marker positions
        (1, "http://en.site0.example/about", 100),
        (2, "http://fr.site0.example/about", 110),
        (3, "http://de.site0.example/about", 95),
        # path-segment markers
        (4, "http://site1.example/en/docs/intro", 200),
        (5, "http://site1.example/fr/docs/intro", 220),
        # query-param marker
        (6, "http://site2.example/view?id=7&hl=en", 50),
        (7, "http://site2.example/view?id=7&hl=es", 60),
        # same language twice -> never pairs
        (8, "http://site3.example/en/a", 80),
        (9, "http://en.site3.example/a", 80),
        # no marker -> cannot pair
        (10, "http://site4.example/plain", 70),
        # length-ratio violation (en vs ru of wildly different size)
        (11, "http://site5.example/en/big", 1000),
        (12, "http://site5.example/ru/big", 10),
    ]
    return spark.createDataFrame(rows, ["doc_id", "url", "n_chars"])


def test_skeleton_positions(pages):
    got = {
        r["doc_id"]: (r["skeleton"], r["url_lang"])
        for r in bitext.url_language_skeleton(pages).collect()
    }
    assert got[1] == ("http://_L_.site0.example/about", "en")
    assert got[4] == ("http://site1.example/_L_/docs/intro", "en")
    assert got[6] == ("http://site2.example/view?id=7&hl=_L_", "en")
    assert got[10] == ("http://site4.example/plain", None)


def test_skeleton_query_param_boundary(spark):
    """?lang=eng / ?locale=ens must NOT match the 'en' prefix (the code
    needs a value boundary); ?lang=en& and ?lang=en$ must."""
    rows = [
        (1, "http://h.example/p?lang=eng", 10),     # prefix, no match
        (2, "http://h.example/p?locale=ens", 10),   # prefix, no match
        (3, "http://h.example/p?lang=en&x=1", 10),  # &-terminated
        (4, "http://h.example/p?lang=en", 10),      # end-terminated
    ]
    pages = spark.createDataFrame(rows, ["doc_id", "url", "n_chars"])
    got = {
        r["doc_id"]: (r["skeleton"], r["url_lang"])
        for r in bitext.url_language_skeleton(pages).collect()
    }
    assert got[1] == ("http://h.example/p?lang=eng", None)
    assert got[2] == ("http://h.example/p?locale=ens", None)
    assert got[3] == ("http://h.example/p?lang=_L_&x=1", "en")
    assert got[4] == ("http://h.example/p?lang=_L_", "en")


def test_parallel_candidates(pages):
    out = bitext.parallel_page_candidates(pages).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in out}
    # subdomain trio pairs in all 3 cross-language combos (lang-sorted)
    assert (3, 1) in pairs and (3, 2) in pairs and (1, 2) in pairs
    assert pairs[(3, 1)]["lang_a"] == "de" and pairs[(3, 1)]["lang_b"] == "en"
    # path and query pairs found
    assert (4, 5) in pairs and (6, 7) in pairs
    # same-language skeleton (8,9): different skeletons anyway, and even
    # same-lang pairs are excluded by lang_a < lang_b
    assert not any({a, b} == {8, 9} for a, b in pairs)
    # unmarked page pairs with nothing
    assert all(10 not in (a, b) for a, b in pairs)
    # length-ratio prune
    assert not any({a, b} == {11, 12} for a, b in pairs)
    # ratio computed from the larger/smaller lengths
    assert pairs[(4, 5)]["len_ratio"] == round(220 / 200, 6)


def test_group_cap(spark):
    """A spam skeleton with 40 language variants is capped before the
    square: pairs come only from the max_group retained rows."""
    codes = bitext.DEFAULT_LANG_CODES
    rows = [
        (i, f"http://spam.example/{codes[i % len(codes)]}/offer", 100)
        for i in range(40)
    ]
    pages = spark.createDataFrame(rows, ["doc_id", "url", "n_chars"])
    out = bitext.parallel_page_candidates(pages, max_group=4).collect()
    ids = {r["id_a"] for r in out} | {r["id_b"] for r in out}
    assert len(ids) <= 4
    # deterministic: first 4 in (url_lang, id) order
    marked = bitext.url_language_skeleton(pages).collect()
    expect = {r["doc_id"] for r in sorted(
        marked, key=lambda r: (r["url_lang"], r["doc_id"]))[:4]}
    assert ids <= expect


@pytest.fixture(scope="module")
def mirror_pages(spark):
    rows = []
    # m1/m2: perfect mirrors (4 shared paths), m3 shares 1 page only
    for p in ("a", "b", "c", "d"):
        rows.append((f"http://m1.example/{p}", f"content-{p}"))
        rows.append((f"http://m2.example/{p}", f"content-{p}"))
    rows.append(("http://m3.example/a", "content-a"))
    rows.append(("http://m3.example/z", "unique-z"))
    # boilerplate: same (path, content) on 30 hosts — must be pruned
    for h in range(30):
        rows.append((f"http://bp{h}.example/index", "default index page"))
    df = spark.createDataFrame(rows, ["url", "text"])
    return df.withColumn("doc_id", F.monotonically_increasing_id())


def test_mirror_pairs(mirror_pages):
    out = mirrors.mirror_host_pairs(
        mirror_pages, min_shared=2, min_score=0.5, max_hosts_per_key=5)
    got = {(r["host_a"], r["host_b"]): r for r in out.collect()}
    assert ("m1.example", "m2.example") in got
    r = got[("m1.example", "m2.example")]
    assert r["n_shared"] == 4 and r["mirror_score"] == 1.0
    # m3 shares only one page -> below min_shared
    assert all("m3.example" not in k for k in got)
    # the 30-host boilerplate key was pruned -> no bp pairs at all
    assert all(not a.startswith("bp") for a, _ in got)


def test_host_path_projection(spark):
    df = spark.createDataFrame(
        [("HTTP://WWW.Ex.example", "t1"),
         ("http://h.example/p?q=1#f", "t2")],
        ["url", "text"])
    # scheme matching is lowercase-anchored: uppercase scheme yields no
    # host (defensive: canonicalization upstream lowercases schemes)
    got = {r["host"]: r["path"]
           for r in mirrors.host_path_content(df).collect()}
    assert got.get("h.example") == "/p"


def test_skeleton_idempotent_and_lang_closed(spark):
    """Property check in ONE Spark job over 300 adversarial synthesized
    URLs: applying the skeleton projection to an already-skeletonized
    URL is a no-op (the _L_ placeholder is outside the code
    alternation), and url_lang is always a known code or NULL."""
    from pyspark.sql import functions as F

    codes = bitext.DEFAULT_LANG_CODES
    base = spark.range(300).select(
        F.col("id"),
        F.concat(
            F.lit("http://"),
            F.when(F.col("id") % 4 == 0,
                   F.element_at(F.array(*[F.lit(c) for c in codes]),
                                (F.col("id") % len(codes) + 1).cast("int")))
            .otherwise(F.lit("www")),
            F.lit(".s"), (F.col("id") % 9).cast("string"),
            F.lit(".example/"),
            F.when(F.col("id") % 3 == 0, F.lit("en/"))
            .when(F.col("id") % 3 == 1, F.lit("enx/"))   # NOT a marker
            .otherwise(F.lit("")),
            F.lit("p/"), F.col("id").cast("string"),
            F.when(F.col("id") % 5 == 0, F.lit("?hl=fr&x=1"))
            .otherwise(F.lit("")),
        ).alias("url"))
    once = bitext.url_language_skeleton(base).select(
        "id", F.col("skeleton").alias("url"), F.col("url_lang").alias("l1"))
    twice = bitext.url_language_skeleton(once).select(
        "id", F.col("skeleton").alias("s2"), F.col("url_lang").alias("l2"),
        F.col("url").alias("s1"), "l1")
    bad = twice.filter(
        (F.col("s2") != F.col("s1"))
        | (F.col("l1").isNotNull()
           & ~F.col("l1").isin(*codes))
        | F.col("l2").isNotNull()   # a skeleton carries no marker
    ).count()
    assert bad == 0


def _hl_page(url, decls, extra_head=""):
    links = "".join(
        f'<link rel="alternate" hreflang="{lg}" href="{href}">'
        for lg, href in decls
    )
    return (url, 200, "text/html; charset=utf-8",
            f"<html><head>{links}{extra_head}</head><body>t</body></html>")


def test_parse_document_hreflang_unit():
    from sparkcrawl.operators.extract import parse_document_hreflang

    body = (
        '<html><head><base href="http://s.example/en/">'
        '<link rel="alternate" hreflang="DE" href="/de/p">'
        '<link rel="alternate" hreflang="fr" href="fr/p">'   # base-relative
        '<link rel="alternate" hreflang="de" href="/de/p">'  # dup -> dropped
        '<link rel="alternate" hreflang="x-default" href="/">'
        '<link rel="alternate" hreflang="es" href="mailto:x@y">'  # non-http
        '<link rel="alternate" href="/no-lang">'             # no hreflang
        '<link rel="stylesheet" hreflang="it" href="/css">'  # wrong rel
        '<a hreflang="pt" href="/pt/p">a-tag carries no declaration</a>'
        "</head></html>"
    )
    got = parse_document_hreflang("http://s.example/en/p", body)
    assert got == [
        {"lang": "de", "href": "http://s.example/de/p"},
        {"lang": "fr", "href": "http://s.example/en/fr/p"},
        {"lang": "x-default", "href": "http://s.example/"},
    ]


def test_reciprocal_hreflang_pairs(spark):
    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.operators.extract import extract_hreflang_declarations

    en, de, fr = ("http://a.example/en", "http://a.example/de",
                  "http://a.example/fr")
    one_en, one_de = "http://b.example/en", "http://b.example/de"
    rows = [
        # full reciprocal trio (each page declares itself too)
        _hl_page(en, [("en", en), ("de", de), ("fr", fr)]),
        _hl_page(de, [("en", en), ("de", de), ("fr", fr)]),
        _hl_page(fr, [("en", en), ("de", de), ("fr", fr)]),
        # one-way: en declares de, de never returns -> no pair
        _hl_page(one_en, [("de", one_de)]),
        _hl_page(one_de, []),
        # x-default-only page -> nothing
        _hl_page("http://c.example/", [("x-default", "http://c.example/")]),
        # non-200 page: declarations gated by the F5 limiter
        ("http://d.example/en", 404, "text/html",
         '<link rel="alternate" hreflang="de" href="http://d.example/de">'),
    ]
    fetched = spark.createDataFrame(
        rows, ["url", "status_code", "content_type", "body"])
    decls = extract_hreflang_declarations(fetched, CrawlConfig())
    pairs = bitext.reciprocal_hreflang_pairs(decls)
    got = {tuple(r) for r in pairs.collect()}
    assert got == {
        (de, "de", en, "en"),
        (de, "de", fr, "fr"),
        (en, "en", fr, "fr"),
    }
    plan_df = pairs
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("simple")
    p = buf.getvalue()
    assert "CartesianProduct" not in p and "Window" not in p


def test_hreflang_fast_lane_matches_python_parser(spark):
    """Differential gate for the codegen hreflang lane: the operator's
    output over a corpus of tricky fixtures must equal the pure-Python
    SpanLinkParser reference page-for-page — fast-class pages exercise
    the regexp lane, every hazard class must route to (and agree with)
    the parser lane."""
    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.operators.extract import (
        _extraction_finished, extract_hreflang_declarations,
        parse_document_hreflang)

    A = "http://t.example/a"
    pages = [
        # fast class: plain, multiple declarations, dup dedup, x-default
        ("http://f1.example/", '<link rel="alternate" hreflang="en" href="http://f1.example/en">'
         '<link rel="alternate" hreflang="DE" href="http://f1.example/de">'
         '<link rel="alternate" hreflang="de" href="http://f1.example/de">'
         '<link rel="alternate" hreflang="x-default" href="http://f1.example/">'),
        # fast class: single quotes, unquoted value, uppercase names, rel token list
        ("http://f2.example/", "<LINK REL='alternate stylesheet' HREFLANG='fr' HREF=http://f2.example/fr>"
         '<link rel="alternate" hreflang=" es " href="http://f2.example/es#frag">'),
        # fast class: canonicalization work (default port, fragment, session param)
        ("http://f3.example/", '<link rel="alternate" hreflang="en" href="http://f3.example:80/p;jsessionid=abc">'),
        # wrong rel / missing attrs / empty values -> nothing
        ("http://f4.example/", '<link rel="stylesheet" hreflang="it" href="http://f4.example/css">'
         '<link rel="alternate" hreflang="" href="http://f4.example/x">'
         '<link rel="alternate" hreflang="pt">'),
        # hazard: base-href resolution + relative links -> Python lane
        ("http://h1.example/en/p", '<base href="http://h1.example/en/">'
         '<link rel="alternate" hreflang="de" href="/de/p">'
         '<link rel="alternate" hreflang="fr" href="fr/p">'),
        # hazard: charrefs in href -> Python lane
        ("http://h2.example/", '<link rel="alternate" hreflang="en" href="http://h2.example/p?a=1&amp;b=2">'),
        # hazard: link inside a script CDATA block must NOT be extracted
        ("http://h3.example/", '<script>var x = \'<link rel="alternate" hreflang="de" href="http://h3.example/de">\';</script>'
         '<link rel="alternate" hreflang="en" href="http://h3.example/en">'),
        # hazard: commented-out declaration must NOT be extracted
        ("http://h4.example/", '<!-- <link rel="alternate" hreflang="de" href="http://h4.example/de"> -->'
         '<link rel="alternate" hreflang="en" href="http://h4.example/en">'),
        # hazard: quoted value with whitespace in a link tag
        ("http://h5.example/", '<link rel="alternate" title="the en version" hreflang="en" href="http://h5.example/en">'),
        # hazard: non-fast-class hrefs (uppercase host, userinfo, query)
        ("http://h6.example/", '<link rel="alternate" hreflang="en" href="http://H6.example/EN">'
         '<link rel="alternate" hreflang="de" href="http://u:p@h6.example/de">'
         '<link rel="alternate" hreflang="fr" href="http://h6.example/fr?x=1">'),
        # hazard: embedded tag inside another tag's attribute
        ("http://h7.example/", '<img alt=\'<link rel="alternate" hreflang="de" href="http://h7.example/de">\'>'
         '<link rel="alternate" hreflang="en" href="http://h7.example/en">'),
        # hazard: slash-delimited attrs (html.parser tolerates them)
        ("http://h8.example/", '<link/rel="alternate"/hreflang="de"/href="http://h8.example/de">'),
        # hreflang substring only in text: no declarations either lane
        ("http://n1.example/", "<p>what is hreflang?</p>"),
        # no hreflang at all: dropped before any lane
        ("http://n2.example/", "<p>plain page</p>"),
    ]
    rows = [(u, 200, "text/html; charset=utf-8", b) for u, b in pages]
    # limiter classes: non-200 / wrong type / oversize
    rows += [
        ("http://l1.example/", 404, "text/html",
         '<link rel="alternate" hreflang="de" href="http://l1.example/de">'),
        ("http://l2.example/", 200, "application/json",
         '<link rel="alternate" hreflang="de" href="http://l2.example/de">'),
        ("http://l3.example/", 200, "text/html",
         '<link rel="alternate" hreflang="de" href="http://l3.example/de">'
         + "x" * 2_000_001),
    ]
    cfg = CrawlConfig()
    fetched = spark.createDataFrame(
        rows, ["url", "status_code", "content_type", "body"])
    got = {(r["url"], r["lang"], r["alt_url"])
           for r in extract_hreflang_declarations(fetched, cfg).collect()}
    want = set()
    for url, status, ctype, body in rows:
        if _extraction_finished(status, ctype, body, cfg):
            continue
        for d in parse_document_hreflang(url, body, ctype):
            want.add((url, d["lang"], d["href"]))
    assert got == want
    # sanity: the fixture set really produces declarations on both lanes
    assert ("http://f1.example/", "de", "http://f1.example/de") in want
    assert ("http://h1.example/en/p", "fr", "http://h1.example/en/fr/p") in want
    assert not any(u.startswith("http://h3") and lg == "de" for u, lg, _ in want)
