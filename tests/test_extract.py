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
