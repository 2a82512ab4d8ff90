"""C3/C4/C5 extractor spec tests — span-sequence parity surface."""

from sparkcrawl.operators.extract import parse_document, sniff_charset


HTML = (
    "<html><head><title>T</title></head><body>"
    "<p>hello   world</p>"
    '<img src="/static/a.png">'
    '<a href="/page/2">two</a>'
    "<p>tail</p>"
    '<a href="http://other.example/x#frag">abs</a>'
    "<script>var x = 'not a span';</script>"
    "</body></html>"
)


def test_parse_document_spans_interleaved():
    links, spans = parse_document("http://h.example/page/1", HTML)
    assert [(s["kind"], s["text"], s["media_ref"]) for s in spans] == [
        ("text", "T", ""),
        ("text", "hello world", ""),
        ("media", "", "http://h.example/static/a.png"),
        ("text", "two", ""),
        ("text", "tail", ""),
        ("text", "abs", ""),
    ]
    assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_parse_document_links_canonical():
    links, _ = parse_document("http://h.example/page/1", HTML)
    assert links == [
        "http://h.example/page/2",
        "http://other.example/x",  # fragment dropped
    ]


def test_base_href_honored():
    html = '<base href="http://cdn.example/root/"><a href="x/y">l</a><img src="i.png">'
    links, spans = parse_document("http://h.example/p", html)
    assert links == ["http://cdn.example/root/x/y"]
    media = [s for s in spans if s["kind"] == "media"]
    assert media[0]["media_ref"] == "http://cdn.example/root/i.png"


def test_malformed_html_no_crash():
    links, spans = parse_document("http://h.example/p", "<a href='/x'><<<&&& <p>t")
    assert "http://h.example/x" in links


def test_non_http_links_dropped():
    html = '<a href="mailto:x@y">m</a><a href="javascript:void(0)">j</a><a href="/ok">k</a>'
    links, _ = parse_document("http://h.example/p", html)
    assert links == ["http://h.example/ok"]


def test_charset_sniff():
    assert sniff_charset("text/html; charset=ISO-8859-1") == "iso-8859-1"
    assert sniff_charset("text/html") == "utf-8"
    assert sniff_charset(None) == "utf-8"


def test_bytes_body_decoded():
    body = "<p>héllo</p>".encode("iso-8859-1")
    _, spans = parse_document("http://h.example/p", body, "text/html; charset=iso-8859-1")
    assert spans[0]["text"] == "héllo"


def test_parse_sitemap_urlset_and_index():
    from sparkcrawl.operators.extract import is_sitemap, parse_sitemap

    body = """<?xml version="1.0" encoding="UTF-8"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>http://h.example/a?x=1&amp;y=2</loc><lastmod>2026-01-01</lastmod></url>
      <url><loc> http://h.example/b </loc></url>
      <url><loc><![CDATA[http://h.example/c]]></loc></url>
      <url><loc>/relative/d</loc></url>
      <url><loc>ftp://h.example/skip</loc></url>
    </urlset>"""
    links = parse_sitemap("http://h.example/sitemap.xml", body)
    assert "http://h.example/a?x=1&y=2" in links      # entity unescaped
    assert "http://h.example/b" in links               # whitespace trimmed
    assert "http://h.example/c" in links               # CDATA stripped
    assert "http://h.example/relative/d" in links      # base-resolved
    assert not any(u.startswith("ftp") for u in links)

    index = """<sitemapindex><sitemap><loc>http://h.example/s1.xml</loc></sitemap>
    <sitemap><loc>http://h.example/s2.xml</loc></sitemap></sitemapindex>"""
    assert parse_sitemap("http://h.example/sitemap.xml", index) == [
        "http://h.example/s1.xml", "http://h.example/s2.xml"]

    assert is_sitemap("application/xml", "<foo/>")
    assert is_sitemap("text/plain", body)              # body sniff beats ctype
    assert not is_sitemap("text/html", "<html></html>")
    assert parse_sitemap("http://h.example/s.xml", None) == []


def test_extract_routes_sitemap_bodies(spark):
    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.operators.extract import extract_links_and_spans

    cfg = CrawlConfig()
    sm_body = ("<urlset><url><loc>http://h.example/from-sitemap</loc></url>"
               "</urlset>")
    rows = [
        ("http://h.example/sitemap.xml", 200, "application/xml", None, sm_body),
        ("http://h.example/page", 200, "text/html", None,
         '<a href="/linked">x</a>'),
    ]
    fetched = spark.createDataFrame(
        rows,
        "url string, status_code int, content_type string, "
        "location string, body string",
    )
    out = {r["url"]: r for r in extract_links_and_spans(fetched, cfg).collect()}
    sm = out["http://h.example/sitemap.xml"]
    assert sm["links"] == ["http://h.example/from-sitemap"]
    assert sm["extraction_finished"] and sm["spans"] == []  # no document emitted
    assert out["http://h.example/page"]["links"] == ["http://h.example/linked"]

    # flag off: sitemap goes back to being an ignored non-HTML body
    import dataclasses
    off = dataclasses.replace(cfg, parse_sitemaps=False)
    out2 = {r["url"]: r for r in extract_links_and_spans(fetched, off).collect()}
    assert out2["http://h.example/sitemap.xml"]["links"] == []


def test_sitemaps_from_robots_column_path(spark):
    from sparkcrawl.operators.robots import sitemaps_from_robots

    bodies = spark.createDataFrame(
        [
            ("h1.example",
             "User-agent: *\nDisallow: /p\nSitemap: http://h1.example/s.xml\n"
             " SITEMAP:\thttp://h1.example/s2.xml \r\nAllow: /"),
            ("h2.example", "User-agent: *\nDisallow:"),
            ("h3.example", None),
        ],
        ["host", "body"],
    )
    got = {(r["host"], r["sitemap_url"])
           for r in sitemaps_from_robots(bodies).collect()}
    assert got == {
        ("h1.example", "http://h1.example/s.xml"),
        ("h1.example", "http://h1.example/s2.xml"),
    }


# ---- anchor-text extraction (web-graph description signal) ----------


def test_parse_document_anchors_semantics():
    from sparkcrawl.operators.extract import parse_document, parse_document_anchors

    html = (
        '<html><body><a href="/one">First  Link</a>'
        '<a href="/two"><b>bold</b> text</a>'
        '<link href="/css"><area href="/map">'
        '<a href="/x">ok<script>var a=1;</script>fine</a>'
        '<a href="/p">pp<a href="/q">qq</a>'
        '<a href="/unclosed">tail text'
    )
    pairs = parse_document_anchors("http://h.example/", html)
    got = {p["link"]: p["anchor"] for p in pairs}
    assert got["http://h.example/one"] == "First Link"  # ws collapsed
    assert got["http://h.example/two"] == "bold text"  # nested inline tags
    assert got["http://h.example/css"] == ""  # non-<a> link tags: no anchor
    assert got["http://h.example/map"] == ""
    assert got["http://h.example/x"] == "okfine"  # script text excluded
    assert got["http://h.example/p"] == "pp"  # implied close by next <a>
    assert got["http://h.example/q"] == "qq"
    assert got["http://h.example/unclosed"] == "tail text"  # EOF close
    # link set/order identical to parse_document (same canonicalization)
    links, _ = parse_document("http://h.example/", html)
    assert links == [p["link"] for p in pairs]


def test_extract_anchor_texts_and_summary(spark):
    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.operators.extract import (
        anchor_term_summary,
        extract_anchor_texts,
    )

    rows = [
        ("http://a.example/", 200, "text/html",
         '<a href="http://t.example/x">spark fast</a>'),
        ("http://b.example/", 200, "text/html",
         '<a href="http://t.example/x">spark engine</a>'),
        ("http://c.example/", 404, "text/html",
         '<a href="http://t.example/x">never parsed</a>'),  # limiter gate
    ]
    fetched = spark.createDataFrame(
        rows, "url string, status_code int, content_type string, body string"
    )
    pairs = extract_anchor_texts(fetched, CrawlConfig()).collect()
    assert {(r["url"], r["anchor"]) for r in pairs} == {
        ("http://a.example/", "spark fast"),
        ("http://b.example/", "spark engine"),
    }
    summary = anchor_term_summary(
        extract_anchor_texts(fetched, CrawlConfig())
    ).collect()
    assert len(summary) == 1
    s = summary[0]
    assert s["link"] == "http://t.example/x"
    assert s["n_docs"] == 2 and s["n_terms"] == 4
    assert s["top_term"] == "spark" and s["top_count"] == 2


def test_anchor_summary_plan_no_window(spark):
    import contextlib
    import io

    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.operators.extract import (
        anchor_term_summary,
        extract_anchor_texts,
    )

    fetched = spark.createDataFrame(
        [("http://a.example/", 200, "text/html", '<a href="/x">t</a>')],
        "url string, status_code int, content_type string, body string",
    )
    df = anchor_term_summary(extract_anchor_texts(fetched, CrawlConfig()))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    assert "Window" not in buf.getvalue()


def test_parse_feed_rss_and_atom():
    from sparkcrawl.operators.extract import is_feed, parse_feed

    rss = """<?xml version="1.0"?>
    <rss version="2.0"><channel>
      <title>news</title><link>http://h.example/</link>
      <item><link>http://h.example/story-1?a=1&amp;b=2</link></item>
      <item><link><![CDATA[http://h.example/story-2]]></link></item>
      <item><link>/relative-3</link></item>
    </channel></rss>"""
    links = parse_feed("http://h.example/feed.xml", rss)
    assert "http://h.example/story-1?a=1&b=2" in links  # entity unescaped
    assert "http://h.example/story-2" in links          # CDATA stripped
    assert "http://h.example/relative-3" in links       # base-resolved
    assert "http://h.example/" in links                 # channel link kept

    atom = """<feed xmlns="http://www.w3.org/2005/Atom">
      <link rel="self" href="http://h.example/atom.xml"/>
      <entry><link rel="alternate" href="http://h.example/e1"/></entry>
      <entry><link href='http://h.example/e2'/></entry>
      <entry><link href='http://h.example/e2'/></entry>
    </feed>"""
    alinks = parse_feed("http://h.example/atom.xml", atom)
    assert "http://h.example/e1" in alinks and "http://h.example/e2" in alinks
    assert alinks.count("http://h.example/e2") == 1      # deduped

    assert is_feed("application/rss+xml", "<x/>")
    assert is_feed("text/plain", rss)                    # root-marker sniff
    assert not is_feed("text/html", "<html></html>")
    assert parse_feed("http://h.example/f.xml", None) == []


def test_extract_routes_feed_bodies(spark):
    """An RSS feed fetched by the crawler is a link source (no document
    spans), exactly like a sitemap; parse_feeds=False turns it off."""
    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.operators.extract import extract_links_and_spans

    cfg = CrawlConfig()
    feed = ("<rss version='2.0'><channel>"
            "<item><link>http://h.example/from-feed</link></item>"
            "</channel></rss>")
    rows = [
        ("http://h.example/feed", 200, "application/rss+xml", None, feed),
    ]
    fetched = spark.createDataFrame(
        rows,
        "url string, status_code int, content_type string, "
        "location string, body string",
    )
    out = {r["url"]: r for r in extract_links_and_spans(fetched, cfg).collect()}
    fr = out["http://h.example/feed"]
    assert fr["links"] == ["http://h.example/from-feed"]
    assert fr["extraction_finished"] and fr["spans"] == []

    import dataclasses
    off = dataclasses.replace(cfg, parse_feeds=False)
    out2 = {r["url"]: r for r in extract_links_and_spans(fetched, off).collect()}
    assert out2["http://h.example/feed"]["links"] == []


def test_sitemap_entries_metadata(spark):
    """Per-entry lastmod/changefreq/priority hints — the fields the
    link-only sitemap path drops; pure-regexp codegen, no UDF."""
    from sparkcrawl.operators.extract import sitemap_entries

    body = """<?xml version="1.0"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>http://h.example/a</loc>
        <lastmod>2026-01-05T10:00:00Z</lastmod>
        <changefreq>Daily</changefreq><priority>0.8</priority></url>
      <url><loc> http://h.example/b </loc></url>
      <url><loc><![CDATA[http://h.example/c]]></loc>
        <changefreq>never</changefreq><priority>bogus</priority></url>
      <url><lastmod>2026-01-01</lastmod></url>
    </urlset>"""
    df = spark.createDataFrame([("http://h.example/sm.xml", body)],
                               ["url", "body"])
    rows = {r["loc"]: r for r in sitemap_entries(df).collect()}
    assert set(rows) == {"http://h.example/a", "http://h.example/b",
                         "http://h.example/c"}  # loc-less entry dropped
    a = rows["http://h.example/a"]
    assert a["lastmod"] == "2026-01-05T10:00:00Z"
    assert a["changefreq"] == "daily" and a["changefreq_sec"] == 86400
    assert a["priority"] == 0.8
    b = rows["http://h.example/b"]
    assert b["lastmod"] is None and b["changefreq"] is None \
        and b["priority"] is None
    c = rows["http://h.example/c"]
    assert c["changefreq"] == "never" and c["changefreq_sec"] is None
    assert c["priority"] is None                       # bogus -> NULL

    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sitemap_entries(df).explain("simple")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p


def test_nofollow_discovery_policy():
    """REP robots-meta compliance: rel=nofollow drops that link,
    page-level meta nofollow/none drops all links; text spans and
    followed links are unaffected."""
    from sparkcrawl.operators.extract import parse_document

    body = ('<html><a href="/ok">yes</a>'
            '<a href="/no" rel="nofollow">no</a>'
            '<a href="/also-no" rel="ugc nofollow">ugc</a></html>')
    links, spans = parse_document("http://h.example/p", body)
    assert links == ["http://h.example/ok"]
    assert [s["text"] for s in spans] == ["yes", "no", "ugc"]  # text kept

    meta = ('<html><meta name="robots" content="noindex, NOFOLLOW">'
            '<a href="/x">x</a><p>body</p></html>')
    mlinks, mspans = parse_document("http://h.example/q", meta)
    assert mlinks == []
    assert [s["text"] for s in mspans] == ["x", "body"]

    none = '<html><meta name="robots" content="none"><a href="/y">y</a></html>'
    assert parse_document("http://h.example/r", none)[0] == []

    # other meta tags don't trigger it
    other = ('<html><meta name="viewport" content="nofollow-looking">'
             '<a href="/z">z</a></html>')
    assert parse_document("http://h.example/s", other)[0] == \
        ["http://h.example/z"]


def test_nofollow_excluded_from_anchor_signal():
    from sparkcrawl.operators.extract import parse_document_anchors

    body = ('<html><a href="/ok">good anchor</a>'
            '<a href="/no" rel="nofollow">spam anchor</a></html>')
    pairs = parse_document_anchors("http://h.example/p", body)
    assert pairs == [{"link": "http://h.example/ok", "anchor": "good anchor"}]


def test_canonical_extraction_and_dedup(spark):
    """rel=canonical: parse (first wins, base-resolved), pair
    extraction through the limiter, and the variant-collapse rollup
    (self-canonical doc preferred, min doc_id tie-break, no Window)."""
    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.operators.extract import (
        canonical_dedup,
        extract_canonical_pairs,
        parse_document_canonical,
    )

    html = ('<html><link rel="canonical" href="/page">'
            '<link rel="canonical" href="/second-ignored">'
            '<p>x</p></html>')
    assert parse_document_canonical("http://h.example/page?utm=1", html) \
        == "http://h.example/page"
    assert parse_document_canonical("http://h.example/p", "<html></html>") is None

    fetched = spark.createDataFrame(
        [("http://h.example/page?utm=1", 200, "text/html", None, html),
         ("http://h.example/plain", 200, "text/html", None, "<p>y</p>"),
         ("http://h.example/err", 500, "text/html", None, html)],
        "url string, status_code int, content_type string, "
        "location string, body string")
    pairs = extract_canonical_pairs(fetched, CrawlConfig())
    assert [tuple(r) for r in pairs.collect()] == [
        ("http://h.example/page?utm=1", "http://h.example/page")]

    docs = spark.createDataFrame(
        [("http://h.example/page?utm=1", "dup content"),
         ("http://h.example/page", "the real one"),
         ("http://h.example/plain", "standalone")],
        ["doc_id", "text"])
    out = {r["canonical_url"]: r for r in
           canonical_dedup(docs, pairs).collect()}
    page = out["http://h.example/page"]
    assert page["doc_id"] == "http://h.example/page"   # self preferred
    assert page["text"] == "the real one" and page["n_variants"] == 2
    assert out["http://h.example/plain"]["n_variants"] == 1

    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        canonical_dedup(docs, pairs).explain("simple")
    assert "Window" not in buf.getvalue()


def test_usage_rights_flags(spark):
    """Robots/googlebot meta directives: attribute order free, quoted
    or bare, comma/space lists; non-robots meta ignored; noai family
    detected."""
    from sparkcrawl.operators.extract import usage_rights_flags

    rows = [
        (1, '<html><meta name="robots" content="noindex, nofollow">'),
        (2, '<meta content="noai,noimageai" name="GOOGLEBOT"><p>x</p>'),
        (3, "<meta name='robots' content=noarchive>"),
        (4, '<meta name="description" content="noai noindex">'),  # ignored
        (5, "<p>no meta at all</p>"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "html"])
    got = {r["doc_id"]: r for r in usage_rights_flags(df).collect()}
    assert got[1]["noindex"] and got[1]["nofollow"] and not got[1]["noai"]
    assert got[2]["noai"] and got[2]["noimageai"] and not got[2]["noindex"]
    assert got[3]["noarchive"] and not got[3]["nofollow"]
    assert not any([got[4][c] for c in
                    ("noindex", "nofollow", "noarchive", "noai",
                     "noimageai")])
    assert not got[5]["noai"]


def test_markup_ratio(spark):
    """Script/style bodies and comments vanish from visible text; tag
    count and byte accounting hand-checked; empty html -> NULL ratio."""
    from sparkcrawl.operators.extract import markup_ratio

    rows = [
        (1, "<p>hello world</p>"),
        (2, "<script type='x'>junk()</script><p>hi</p><!-- note -->"),
        (3, "<STYLE>b{}</STYLE>"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "html"])
    got = {r["doc_id"]: r for r in markup_ratio(df).collect()}
    assert got[1]["visible_len"] == len("hello world")
    assert got[1]["tag_count"] == 2
    assert got[1]["text_ratio"] == round(11 / 18, 6)
    assert got[2]["visible_len"] == 2          # just "hi"
    assert got[2]["script_style_len"] == len("<script type='x'>junk()</script>")
    assert got[3]["visible_len"] == 0          # case-folded style block
    assert got[4]["text_ratio"] is None


def test_title_dup_stats(spark):
    """Whitespace/case-normalized titles cluster; missing titles form
    the '' class; struct-max tie-break on equal counts."""
    from sparkcrawl.operators.extract import title_dup_stats

    mk = lambda t: f"<html><head><title>{t}</title></head><body/></html>"
    rows = [
        ("cms.example", mk("  Home -   Site ")),
        ("cms.example", mk("home - site")),
        ("cms.example", mk("About Us")),
        ("blog.example", mk("Post 1")),
        ("blog.example", mk("Post 2")),
        ("bare.example", "<html><body>no title</body></html>"),
        ("bare.example", "<html><body>also none</body></html>"),
        ("tie.example", mk("aaa")), ("tie.example", mk("bbb")),
    ]
    df = spark.createDataFrame(rows, ["host", "html"])
    got = {r["host"]: r for r in title_dup_stats(df).collect()}
    cms = got["cms.example"]
    assert (cms["n_pages"], cms["n_titles"]) == (3, 2)
    assert cms["top_title"] == "home - site" and cms["top_count"] == 2
    assert cms["templated"] is False          # dup_share 1/3 < 0.5
    blog = got["blog.example"]
    assert blog["dup_share"] == 0.0 and not blog["templated"]
    bare = got["bare.example"]
    assert bare["top_title"] == "" and bare["templated"]
    assert got["tie.example"]["top_title"] == "bbb"   # tie -> larger
