"""URL-level quality filtering — the RefinedWeb/C4 pre-fetch gate
(public method: Penedo et al. 2023 §3.1 "URL filtering": a domain
blocklist, a weighted URL keyword score, and shape heuristics applied
BEFORE a page is ever fetched or its text scored).

This sits upstream of the text-quality family (gopher/C4/perplexity):
at crawl scale, dropping a URL costs nothing while dropping a fetched
document already paid fetch + parse. The crawl engine's scoper (F2,
functions/scope.py) handles parity-pinned regex scoping; this module is
the corpus-curation policy layer on top.

Everything is JVM column expressions plus ONE broadcast join for the
blocklist — no Python, no extra shuffle on the URL table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkcrawl.functions.domains import registered_domain
from sparkcrawl.functions.urlnorm import host_of_canonical_col

# default soft-score keyword list (RefinedWeb-style categories; the
# public method weights adult/gambling/piracy terms — this is a compact
# deterministic stand-in, swappable per deployment)
URL_BAD_KEYWORDS: tuple[str, ...] = (
    "casino", "porn", "xxx", "viagra", "warez", "crack", "torrent",
)


def url_quality_filter(
    urls: DataFrame,
    blocklist: DataFrame | None = None,
    bad_keywords: tuple[str, ...] = URL_BAD_KEYWORDS,
    max_kw_hits: int = 0,
    max_digit_frac: float = 0.5,
    max_url_len: int = 512,
    max_params: int = 8,
    url_col: str = "url",
) -> DataFrame:
    """Per-URL verdict columns + overall ``keep`` conjunction.

    - ``blocked``: registered domain appears in ``blocklist`` (a small
      (domain) DataFrame — broadcast; NULL blocklist = nothing blocked)
    - ``kw_hits``: count of ``bad_keywords`` appearing in the lowered
      URL (soft score; keep iff <= ``max_kw_hits``)
    - ``host_digit_frac``: digits / length of the host (DGA-ish or
      session-y hosts)
    - ``url_len`` / ``n_params``: shape heuristics (crawler traps and
      tracking overload)

    Verdicts stay per-rule so ablations are a column select, mirroring
    gopher_quality_rules / c4_quality_filters.
    """
    url = F.col(url_col)
    host = host_of_canonical_col(url)
    rd = registered_domain(host)
    low = F.lower(url)
    kw_hits = F.lit(0)
    for kw in bad_keywords:
        kw_hits = kw_hits + low.contains(kw).cast("int")
    host_len = F.greatest(F.length(host), F.lit(1))
    digit_frac = F.round(
        (host_len - F.length(F.regexp_replace(host, r"[0-9]", ""))) / host_len, 6
    )
    # n_params: '&' count in the query string + 1 if a query exists
    q = F.substring_index(url, "?", -1)
    has_q = url.contains("?")
    n_params = F.when(
        has_q,
        F.length(q) - F.length(F.replace(q, F.lit("&"), F.lit(""))) + 1,
    ).otherwise(F.lit(0))
    out = urls.withColumns(
        {
            "host": host,
            "registered_domain": rd,
            "kw_hits": kw_hits.cast("int"),
            "host_digit_frac": digit_frac,
            "url_len": F.length(url).cast("int"),
            "n_params": n_params.cast("int"),
        }
    )
    if blocklist is not None:
        bl = blocklist.select(
            F.col(blocklist.columns[0]).alias("registered_domain"),
            F.lit(True).alias("blocked"),
        ).distinct()
        out = out.join(F.broadcast(bl), "registered_domain", "left").withColumn(
            "blocked", F.coalesce("blocked", F.lit(False))
        )
    else:
        out = out.withColumn("blocked", F.lit(False))
    keep = (
        ~F.col("blocked")
        & (F.col("kw_hits") <= max_kw_hits)
        & (F.col("host_digit_frac") <= max_digit_frac)
        & (F.col("url_len") <= max_url_len)
        & (F.col("n_params") <= max_params)
    )
    return out.withColumn("keep", keep)


def confusable_domain_pairs(
    hosts: DataFrame,
    host_col: str = "host",
    min_len: int = 5,
    max_group: int = 50,
) -> DataFrame:
    """Edit-distance-1 domain pairs — (domain_a, domain_b, distance) —
    the typo-squatting / confusable-domain detector.

    A crawl that discovers ``paypa1.example`` next to
    ``paypal.example`` is usually looking at a phishing or
    typo-squatting clone; flagging near-identical registered domains is
    standard crawl hygiene. The naive form is an all-pairs edit
    distance (impossible at 10^8 domains); this uses the FastSS /
    SymSpell deletion-neighborhood trick (Bocek et al., 2007, public
    method): every string x with |edit(x, y)| <= 1 shares at least one
    member of {x} ∪ deletions(x) with {y} ∪ deletions(y), so an
    equi-join on the deletion variant finds every candidate, and a
    built-in ``levenshtein`` verify (identical in Spark and DuckDB)
    keeps the join exact — candidates at distance 2 (two different
    single deletions colliding) are discarded.

    Scale shape: variants come from one higher-order transform (|s|+1
    rows per domain after explode), the join key is the variant string
    with a ``max_group`` cap pruning degenerate hubs (very short or
    templated labels) BEFORE the pair square — the same high-frequency-
    key defense as every other pair search here. ``min_len`` skips
    short domains where distance 1 is meaningless.
    """
    doms = (
        hosts.select(F.lower(F.col(host_col)).alias("d"))
        .filter(F.length("d") >= min_len)
        .distinct()
    )
    # variants = the domain itself + every single-character deletion
    variants = F.concat(
        F.array(F.col("d")),
        F.transform(
            F.sequence(F.lit(1), F.length("d")),
            lambda i: F.concat(
                F.col("d").substr(F.lit(1), i - 1),
                F.col("d").substr(i + 1, F.length("d")),
            ),
        ),
    )
    v = doms.select("d", F.explode(variants).alias("v")).distinct()
    key_counts = v.groupBy("v").agg(F.count("*").alias("_n"))
    rare = key_counts.filter(F.col("_n") <= max_group).drop("_n")
    vp = v.join(rare, "v")
    a = vp.select("v", F.col("d").alias("domain_a"))
    b = vp.select("v", F.col("d").alias("domain_b"))
    cand = (
        a.join(b, "v")
        .filter(F.col("domain_a") < F.col("domain_b"))
        .select("domain_a", "domain_b")
        .distinct()
    )
    dist = F.levenshtein("domain_a", "domain_b")
    return (
        cand.withColumn("distance", dist.cast("long"))
        .filter(F.col("distance") <= 1)
    )


def pagination_ranges(urls: DataFrame, url_col: str = "url",
                      min_pages: int = 2) -> DataFrame:
    """Mine enumerable pagination sequences from the URL set: URLs that
    differ only in a page counter (?page=N, /page/N/, or a trailing
    /N) collapse to one template row with the observed counter range.
    A crawler uses this two ways: CAP a runaway sequence (page=1..
    50000 of a calendar trap — the complement of traps.py's shape
    features, grounded in observed counters instead of URL shape), and
    PLAN coverage (contiguous=false means pages the frontier never
    saw — synthesize the gaps instead of waiting for links).

    Template = the URL with the matched counter replaced by ``{}``;
    first matching rule wins (query ``page=`` beats path ``/page/N``
    beats a bare trailing segment, so one URL lands in exactly one
    family). Output per template with >= ``min_pages`` observed:
    (template, pages, min_n, max_n, contiguous) where contiguous means
    the observed counters form exactly [min_n .. max_n].

    One codegen projection (three regexes) + one hash agg on the
    template key. No UDF, no window, no join.
    """
    u = F.col(url_col)
    # materialize the three counter extractions once per row (Generate
    # boundary): the rule-precedence CASEs below reference each counter
    # several times, and projection collapse would re-run every regex
    # per reference (and again in the notNull filter)
    staged = urls.select(
        u.alias("_u"),
        F.explode(F.array(F.struct(
            F.regexp_extract(u, r"[?&]page=(\d+)", 1).alias("q"),
            F.regexp_extract(u, r"/page/(\d+)(/|$)", 1).alias("p"),
            F.regexp_extract(u, r"/(\d+)/?$", 1).alias("t"),
        ))).alias("_n"),
    )
    u2 = F.col("_u")
    q_n, p_n, t_n = F.col("_n.q"), F.col("_n.p"), F.col("_n.t")
    n = (F.when(q_n != "", q_n).when(p_n != "", p_n)
         .when(t_n != "", t_n).otherwise(F.lit(None))).cast("bigint")
    template = (
        F.when(q_n != "", F.regexp_replace(u2, r"([?&]page=)\d+", r"$1{}"))
        .when(p_n != "", F.regexp_replace(u2, r"(/page/)\d+", r"$1{}"))
        .when(t_n != "", F.regexp_replace(u2, r"/\d+(/?)$", r"/{}$1"))
    )
    rows = staged.select(template.alias("template"), n.alias("n")) \
        .filter(F.col("n").isNotNull()).distinct()
    agg = rows.groupBy("template").agg(
        F.count(F.lit(1)).alias("pages"),
        F.min("n").alias("min_n"),
        F.max("n").alias("max_n"),
    )
    return agg.filter(F.col("pages") >= min_pages).select(
        "template", "pages", "min_n", "max_n",
        (F.col("max_n") - F.col("min_n") + 1 == F.col("pages"))
        .alias("contiguous"),
    )


#: Registrar-lander phrases (case-insensitive). Public signal set —
#: every parked-domain study keys on the for-sale/parking boilerplate.
PARKED_PHRASES = (
    r"(?i)domain\s+(name\s+)?(is\s+)?for\s+sale"
    r"|buy\s+this\s+domain|purchase\s+this\s+domain"
    r"|domain\s+parking|parked\s+(free|domain)"
    r"|this\s+domain\s+(has\s+been|was)\s+registered"
    r"|make\s+an\s+offer\s+on\s+this\s+domain"
)

#: The ad-block boilerplate parked landers render instead of content.
PARKED_AD_PHRASES = r"(?i)related\s+(searches|links)|sponsored\s+(listings|results)"


def parked_domain_flags(
    docs: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    links_col: str = "n_links",
    max_links: int = 3,
    max_chars: int = 2000,
) -> DataFrame:
    """Parked / for-sale domain detection — registrar landers are a
    crawl-budget sink (every path on the domain serves the same sales
    pitch) and a corpus pollutant (near-identical boilerplate at scale;
    see Vissers, Joosen & Nikiforakis, "Parking Sensors: Analyzing and
    Detecting Parked Domains", NDSS 2015 for the public signal set).
    Per-doc flags, pure codegen:

    - ``phrase_match``: for-sale/parking boilerplate
      (:data:`PARKED_PHRASES`);
    - ``ads_match``: the related-searches/sponsored-listings ad block
      parked landers render instead of content;
    - ``thin``: <= ``max_chars`` visible chars AND <= ``max_links``
      outlinks (registrar landers are link-dead by design);
    - ``parked`` = phrase_match OR (ads_match AND thin) — the ad block
      alone also appears on legitimate thin pages, so it only votes
      together with link-deadness.

    One projection, no shuffle; roll up per host downstream with
    :func:`parked_hosts`.
    """
    t = F.col(text_col)
    phrase = F.coalesce(t.rlike(PARKED_PHRASES), F.lit(False))
    ads = F.coalesce(t.rlike(PARKED_AD_PHRASES), F.lit(False))
    thin = ((F.length(t) <= max_chars)
            & (F.col(links_col) <= max_links))
    return docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("doc_id"),
        phrase.alias("phrase_match"),
        ads.alias("ads_match"),
        thin.alias("thin"),
        (phrase | (ads & thin)).alias("parked"),
    )


def parked_hosts(
    flags: DataFrame,
    min_docs: int = 2,
    min_share: float = 0.8,
) -> DataFrame:
    """Host rollup of :func:`parked_domain_flags`: a host is parked
    when (nearly) EVERY sampled page is a lander — one page matching
    the phrases may be an article ABOUT domain sales. ONE
    map-combinable host agg; the output is the host blocklist feed for
    url_quality_filter's broadcast side."""
    agg = flags.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("parked").cast("long")).alias("n_parked"),
    )
    share_raw = F.col("n_parked") / F.col("n_docs")
    return agg.select(
        "host", "n_docs", "n_parked",
        F.round(share_raw, 6).alias("parked_share"),
        ((F.col("n_docs") >= min_docs)
         & (share_raw >= min_share)).alias("parked_host"),
    )


def shared_hosting_fan(
    host_ip: DataFrame,
    min_hosts: int = 50,
    host_col: str = "host",
    ip_col: str = "ip",
) -> DataFrame:
    """Hosts-per-IP fan — the shared-hosting/spam-farm signal
    (Fetterly, Manasse & Najork, "Spam, Damn Spam, and Statistics",
    WebDB 2004: machines hosting thousands of hostnames are
    overwhelmingly spam): a DNS-cache export (host, ip) collapses to a
    per-IP fan count, and IPs whose fan crosses ``min_hosts`` feed the
    same review/blocklist lane as parked_hosts. Also the capacity
    readout for ip-keyed politeness (a 1000-host IP fan means those
    1000 'hosts' share one real politeness budget —
    schedule.ip_politeness_slots).

    Per IP over distinct (host, ip): (ip, n_hosts, n_domains,
    example_host = lexicographic min, mass_hosting). TWO map-combinable
    aggs ((ip,host) dedupe then ip), output |IPs|-sized; no window, no
    join, no UDF.
    """
    from sparkcrawl.functions.domains import registered_domain

    pairs = host_ip.select(
        F.col(ip_col).alias("ip"), F.col(host_col).alias("host")).distinct()
    return pairs.groupBy("ip").agg(
        F.count("*").alias("n_hosts"),
        F.countDistinct(registered_domain(F.col("host")))
        .alias("n_domains"),
        F.min("host").alias("example_host"),
        (F.count("*") >= min_hosts).alias("mass_hosting"),
    )


def host_ip_fan(
    host_ip: DataFrame,
    min_ips: int = 8,
    host_col: str = "host",
    ip_col: str = "ip",
) -> DataFrame:
    """IPs-per-host fan — the inverse readout of
    :func:`shared_hosting_fan`, with two distinct operational uses: a
    large STABLE fan is a CDN/anycast host (politeness must key by
    host, never by IP — the ip_politeness mode would fragment one
    origin's budget across replicas), while a large fan of
    single-shot, widely-scattered addresses is the classic fast-flux
    service-network signature (Holz, Gorecki, Rieck & Freiling,
    NDSS 2008). The /16-prefix spread separates the two: CDNs
    concentrate in few prefixes, flux nets scatter.

    Per host over distinct (host, ip): (host, n_ips, n_prefixes,
    example_ip, multihomed = n_ips >= ``min_ips``, scattered =
    multihomed AND prefixes > n_ips/2). TWO map-combinable aggs,
    |hosts|-sized output.
    """
    prefix = F.regexp_extract(F.col(ip_col), r"^(\d+\.\d+)\.", 1)
    pairs = host_ip.select(
        F.col(host_col).alias("host"), F.col(ip_col).alias("ip"),
        prefix.alias("p16")).distinct()
    return pairs.groupBy("host").agg(
        F.count("*").alias("n_ips"),
        F.countDistinct("p16").alias("n_prefixes"),
        F.min("ip").alias("example_ip"),
        (F.count("*") >= min_ips).alias("multihomed"),
        ((F.count("*") >= min_ips)
         & (F.countDistinct("p16") > F.count("*") / 2))
        .alias("scattered"),
    )
