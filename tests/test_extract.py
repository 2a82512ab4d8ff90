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
