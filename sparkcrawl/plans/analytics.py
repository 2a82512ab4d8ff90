"""Crawl-progress analytics over the checkpoint log.

"Is the crawl saturating?" is the operations question every long
crawl answers weekly: as a frontier exhausts its reachable set, the
fraction of discovered links that are NEW falls toward zero and fetch
budget stops buying coverage (the diminishing-returns curve measured
on real crawls by Baeza-Yates et al., "Crawling a country", and
visible in every Common Crawl release report). The engine already
commits one checkpoint row per superstep (T5:
sources/store.py::CheckpointLog) with seen/fetched/discovered
counters — this module turns that log into the decision table.

Scale note: the checkpoint table has ONE ROW PER SUPERSTEP — it is
config-bounded (thousands of rows after months of crawling), never
data-sized, so the single ordered window here is deliberately fine;
it sorts supersteps, not URLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def curation_audit(
    docs: DataFrame,
    min_quality: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document curation audit trail: (doc_id, drop_reason, kept).

    "Why did my document disappear?" is the first question every
    corpus-pipeline user asks; the answer must name the FIRST stage
    that rejected it, in pipeline order, because downstream stages
    never saw it (a quality-dropped doc is not also an "exact dup" —
    dedup keepers are chosen among the docs that passed the gates, so
    the audit matches what the sequential pipeline actually does).

    Stages audited, in run_corpus order: composite quality floor ->
    Gopher rule verdicts -> C4 cleaning heuristics -> exact dedup
    (min-id keeper among gate-passers). All stage verdicts come from
    the real operators; the composition is three id-keyed joins + one
    hash agg on the content digest — no window, no extra text scans
    beyond the operators' own single passes.
    """
    from sparkcrawl.operators.repetition import (
        c4_quality_filters,
        gopher_quality_rules,
    )
    from sparkcrawl.operators.textops import quality_score

    q = quality_score(docs, text_col, id_col).select(
        "id", (F.col("quality") >= min_quality).alias("_q"))
    g = gopher_quality_rules(docs, text_col=text_col, id_col=id_col).select(
        "id", F.col("keep").alias("_g"))
    c = c4_quality_filters(docs, text_col=text_col, id_col=id_col).select(
        "id", F.col("keep").alias("_c"))
    base = docs.select(
        F.col(id_col).alias("id"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h"))
    v = base.join(q, "id").join(g, "id").join(c, "id")
    keepers = (
        v.filter(F.col("_q") & F.col("_g") & F.col("_c"))
        .groupBy("_h").agg(F.min("id").alias("_kid"))
    )
    out = v.join(keepers, "_h", "left")
    reason = (
        F.when(~F.col("_q"), "quality")
        .when(~F.col("_g"), "gopher")
        .when(~F.col("_c"), "c4")
        .when(F.col("_kid") != F.col("id"), "exact_dup")
    )
    return out.select(
        F.col("id").alias(id_col),
        reason.alias("drop_reason"),
        reason.isNull().alias("kept"),
    )


def crawl_saturation(checkpoints: DataFrame) -> DataFrame:
    """Per-superstep crawl-progress metrics from the checkpoint log:

      - ``new_seen``: URL-seen growth this superstep (first row counts
        its full seen set — the seeds plus its own discoveries);
      - ``yield_per_fetch``: discovered links per fetched page (the
        branching factor actually realized);
      - ``novelty_rate``: fraction of discovered links that were new
        (the number that decays as the crawl saturates);
      - ``saturation``: 1 - novelty_rate, the headline curve;
      - ``seen_growth_rate``: new_seen / prior seen total (relative
        frontier expansion).

    All ratios are round(...,6) with zero-denominator guards; rates are
    NULL where undefined (a superstep that fetched nothing has no
    yield). One lag window over the superstep-count-sized table.
    """
    base = checkpoints.select(
        F.col("superstep").cast("long").alias("superstep"),
        F.col("urls_seen_count").alias("seen_total"),
        F.col("fetched_count").alias("fetched"),
        F.col("discovered_count").alias("discovered"),
    )
    w = W.orderBy("superstep")
    prev_seen = F.lag("seen_total").over(w)
    new_seen = (F.col("seen_total")
                - F.coalesce(prev_seen, F.lit(0))).cast("long")
    ypf = F.when(
        F.col("fetched") > 0,
        F.round(F.col("discovered") / F.col("fetched"), 6))
    novelty = F.when(
        F.col("discovered") > 0,
        F.round(new_seen / F.col("discovered"), 6))
    growth = F.when(
        F.coalesce(prev_seen, F.lit(0)) > 0,
        F.round(new_seen / prev_seen, 6))
    return (
        base.withColumn("new_seen", new_seen)
        .withColumn("yield_per_fetch", ypf)
        .withColumn("novelty_rate", novelty)
        .withColumn("saturation",
                    F.when(novelty.isNotNull(), F.round(1 - novelty, 6)))
        .withColumn("seen_growth_rate", growth)
    )


def sitemap_coverage(sitemap_locs: DataFrame, seen: DataFrame,
                     loc_col: str = "loc",
                     url_col: str = "url") -> DataFrame:
    """(host, n_declared, n_seen, coverage): how much of what each site
    DECLARES (its sitemap <loc> entries) the crawl has actually seen.

    The complement of the saturation curve: saturation says discovery
    is drying up; coverage says whether that is because the site is
    exhausted or because the scheduler never got there. Sites with low
    coverage and high declared counts are where the next budget
    increment buys the most pages (sitemaps are the publisher's own
    completeness claim — Schonfeld & Shivakumar, "Sitemaps: above and
    beyond the crawl of duty", WWW 2009, measured exactly this gap at
    Google scale).

    Both sides are canonicalized (C1 hybrid path) before matching:
    sitemap_entries returns ``<loc>`` strings RAW, while the frontier
    stores canonical URLs — equi-joining raw against canonical would
    silently miss every loc whose raw form differs (uppercase host,
    default port, fragment, session params) and understate coverage.
    Rather than canonicalizing each side separately and joining (two
    Arrow lanes, one shuffle join, one agg), both sides union into ONE
    tagged pass through the canonicalizer, then a per-loc max-agg
    replaces the join entirely: declared = any declared-side row,
    seen = any seen-side row, per canonical loc. One Arrow lane, two
    map-side-combined hash aggs, no join, no window. ``n_declared``
    counts DISTINCT canonical locs (raw variants of one URL are one
    declaration). Unparseable locs (canonical NULL) count as
    declared-but-never-seen under host NULL.
    """
    from sparkcrawl.functions.urlnorm import with_canonical_host

    tagged = sitemap_locs.select(
        F.col(loc_col).alias("_raw"),
        F.lit(1).alias("_d"), F.lit(0).alias("_s"),
    ).unionByName(seen.select(
        F.col(url_col).alias("_raw"),
        F.lit(0).alias("_d"), F.lit(1).alias("_s"),
    ))
    canon = with_canonical_host(
        tagged, url_col="_raw", out_url="_loc", out_host="_host")
    per_loc = canon.groupBy("_loc").agg(
        F.max("_d").alias("_declared"),
        F.max("_s").alias("_seen"),
        F.max("_host").alias("_host"),  # host is a function of the loc
    )
    decl = per_loc.filter(F.col("_declared") == 1)
    seen_cnt = F.count_if(F.col("_seen") == 1)
    return decl.groupBy(F.col("_host").alias("host")).agg(
        F.count("*").alias("n_declared"),
        seen_cnt.alias("n_seen"),
        F.round(seen_cnt / F.count("*"), 6).alias("coverage"),
    )

def domain_token_yield(
    fetched: DataFrame,
    alpha: float = 1.0,
    domain_col: str = "domain",
    bytes_col: str = "n_bytes",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Crawl-value accounting per registered domain: how many usable
    training tokens each domain yields per fetched kilobyte, and the
    smoothed budget weight the next superstep's apportionment (A2)
    should give it. Crawls optimizing for LLM-corpus value steer
    budget toward token-dense domains and away from byte-heavy,
    text-poor ones (media CDNs, tag farms); the additive ``alpha``
    smoothing keeps newly discovered domains explorable instead of
    starving them on one bad sample.

    Input: one row per fetched document with its registered domain,
    fetched byte size, and extracted token count. Output per domain:
    ``n_docs``, ``total_bytes``, ``total_tokens``, ``tokens_per_kb``,
    and ``budget_weight`` (sums to ~1 over domains).

    Plan shape: one map-side-combinable groupBy on the domain key,
    then a broadcast join of the single-row global total back onto
    the per-domain table — no window, no second shuffle, no driver
    collect; cardinality after the agg is the registered-domain
    count, never the document count.
    """
    agg = fetched.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(bytes_col)).cast("bigint").alias("total_bytes"),
        F.sum(F.col(tokens_col)).cast("bigint").alias("total_tokens"),
    )
    totals = agg.agg(
        F.sum("total_tokens").alias("_grand_tokens"),
        F.count(F.lit(1)).alias("_n_domains"),
    )
    return (
        agg.crossJoin(F.broadcast(totals))
        .select(
            "domain",
            "n_docs",
            "total_bytes",
            "total_tokens",
            F.round(
                F.col("total_tokens") * 1024.0 / F.col("total_bytes"), 6
            ).alias("tokens_per_kb"),
            F.round(
                (F.col("total_tokens") + F.lit(float(alpha)))
                / (
                    F.col("_grand_tokens")
                    + F.lit(float(alpha)) * F.col("_n_domains")
                ),
                6,
            ).alias("budget_weight"),
        )
    )


def domain_dup_rate(
    docs: DataFrame,
    domain_col: str = "domain",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain duplicate-rate: the budget-steering complement of
    :func:`domain_token_yield`. A domain whose fetches keep hashing to
    content already crawled (mirror farms, boilerplate-only hosts,
    scraped republishers) burns budget without adding tokens; this
    reports, per registered domain, how much of its fetched volume was
    exactly-duplicate content — split into ``self`` dups (first copy on
    the SAME domain: template/boilerplate pages) and ``cross`` dups
    (first copy elsewhere: the mirror signal mirrors.py acts on).

    First-wins attribution matches the curation pipeline's exact-dedup
    stage: the lowest ``id`` owning a content hash is the original.

    Output per domain: (domain, n_docs, n_dups, dup_rate,
    cross_domain_dups).

    Plan shape: one hash agg on the content hash (min-id + min-by
    first-domain — NO window, no collect_list), one self-equi-join on
    the hash key (both sides co-partitioned by the agg's exchange),
    one map-combinable domain agg. Content hashes, not texts, flow
    through the shuffle.
    """
    hashed = docs.select(
        F.col(id_col).alias("id"),
        F.col(domain_col).alias("domain"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("h"),
    )
    firsts = hashed.groupBy("h").agg(
        F.min("id").alias("first_id"),
        F.min_by("domain", "id").alias("first_domain"),
    )
    flagged = hashed.join(firsts, "h").select(
        "domain",
        (F.col("id") != F.col("first_id")).alias("is_dup"),
        ((F.col("id") != F.col("first_id"))
         & (F.col("domain") != F.col("first_domain"))).alias("is_cross"),
    )
    n, d = F.count(F.lit(1)), F.count_if(F.col("is_dup"))
    return flagged.groupBy("domain").agg(
        n.alias("n_docs"),
        d.alias("n_dups"),
        F.round(d / n, 6).alias("dup_rate"),
        F.count_if(F.col("is_cross")).alias("cross_domain_dups"),
    )


def crawl_value_weights(
    yields: DataFrame,
    dup_rates: DataFrame,
    alpha: float = 1.0,
) -> DataFrame:
    """Dedup-discounted crawl-value steering: composes
    :func:`domain_token_yield` (how many tokens a domain yields) with
    :func:`domain_dup_rate` (how much of that is duplicate content)
    into ONE budget weight per domain — effective_tokens =
    total_tokens * (1 - dup_rate), then the same additive-``alpha``
    share rule the yield weights use. A mirror farm can look
    token-dense to the yield signal alone; the discount is what stops
    the apportionment from feeding it. Output: (domain, total_tokens,
    dup_rate, effective_tokens, weight); weights sum to ~1 and drop
    straight into schedule.allocate_budgets.

    Plan shape: one equi-join of two already-domain-cardinality
    tables (left join — domains the dup pass never saw keep their
    full yield), one 1-row global agg broadcast back. Nothing here
    touches document-cardinality data.
    """
    j = yields.select("domain", "total_tokens").join(
        dup_rates.select("domain", "dup_rate"), "domain", "left"
    ).select(
        "domain", "total_tokens",
        F.coalesce(F.col("dup_rate"), F.lit(0.0)).alias("dup_rate"),
        (F.col("total_tokens")
         * (F.lit(1.0) - F.coalesce(F.col("dup_rate"), F.lit(0.0))))
        .alias("effective_tokens"),
    )
    tot = j.agg(F.sum("effective_tokens").alias("_grand"),
                F.count(F.lit(1)).alias("_n"))
    return j.crossJoin(F.broadcast(tot)).select(
        "domain", "total_tokens",
        F.round("dup_rate", 6).alias("dup_rate"),
        F.round("effective_tokens", 6).alias("effective_tokens"),
        F.round((F.col("effective_tokens") + F.lit(float(alpha)))
                / (F.col("_grand") + F.lit(float(alpha)) * F.col("_n")),
                6).alias("weight"),
    )


def depth_yield(fetched: DataFrame, url_col: str = "url",
                tokens_col: str = "n_tokens") -> DataFrame:
    """Token yield by URL path depth: how much training-token value
    lives N path segments below the root — the empirical basis for a
    crawl's depth cap (trap_max_depth) and for per-level priority
    decay. A corpus whose yield collapses past depth 3 should not
    spend frontier budget at depth 8; one whose deep pages carry the
    tokens (forums, docs sites) should.

    Depth = count of non-empty '/'-segments in the path (query/
    fragment excluded; root = 0). Output per depth: (depth, n_docs,
    total_tokens, tokens_per_doc, token_share). One codegen projection
    (regexp path extract + split/filter/size) + one map-combinable
    agg on the tiny depth key + a broadcast 1-row total.
    """
    path = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    depth = F.size(F.filter(F.split(path, "/"),
                            lambda s: s != "")).alias("depth")
    per = fetched.select(depth, F.col(tokens_col).alias("t")).groupBy(
        "depth").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("t").cast("bigint").alias("total_tokens"),
    )
    tot = per.agg(F.sum("total_tokens").cast("double").alias("_g"))
    return per.crossJoin(F.broadcast(tot)).select(
        "depth", "n_docs", "total_tokens",
        F.round(F.col("total_tokens") / F.col("n_docs"), 6)
        .alias("tokens_per_doc"),
        F.round(F.col("total_tokens") / F.col("_g"), 6)
        .alias("token_share"),
    )


def link_rot(
    edges: DataFrame,
    outcomes: DataFrame,
    src_col: str = "src_domain",
    dst_col: str = "dst_url",
    url_col: str = "url",
    outcome_col: str = "outcome",
    dead_outcomes: tuple[str, ...] = ("not_found", "gone"),
) -> DataFrame:
    """Link-rot accounting per source domain: of the outlinks a domain
    publishes, how many point at targets the crawl has observed dead
    (404/410 outcomes). High rot marks stale link farms and decaying
    archives — their link-graph endorsements (PageRank mass, anchor
    evidence) should be discounted, and their pages deprioritized for
    recrawl-driven discovery since the frontier gains nothing by
    re-walking dead pointers.

    Targets never fetched stay ``unknown`` — absence of evidence is
    not death. Output per src domain: (src_domain, n_links,
    n_resolved, n_dead, dead_share = dead/resolved, NULL when nothing
    resolved).

    Scale shape: dedupe the edge list on (src, dst), ONE hash join on
    the dst URL key against the |seen|-sized outcome table (both sides
    shuffle on the same url key the engine co-partitions everywhere
    else), then one map-combinable domain agg. No window, no UDF.
    """
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct()
    o = outcomes.select(F.col(url_col).alias("dst"),
                        F.col(outcome_col).alias("_oc"))
    j = e.join(o, "dst", "left")
    dead = F.col("_oc").isin(*dead_outcomes)
    agg = j.groupBy(F.col("src").alias("src_domain")).agg(
        F.count("*").alias("n_links"),
        F.sum(F.col("_oc").isNotNull().cast("long")).alias("n_resolved"),
        F.sum(dead.cast("long")).alias("n_dead"),
    )
    return agg.select(
        "src_domain", "n_links", "n_resolved",
        F.coalesce(F.col("n_dead"), F.lit(0)).alias("n_dead"),
        F.when(F.col("n_resolved") > 0,
               F.round(F.coalesce(F.col("n_dead"), F.lit(0))
                       / F.col("n_resolved"), 6)).alias("dead_share"),
    )


def priority_drift_psi(
    before: DataFrame,
    after: DataFrame,
    col: str = "priority",
    alpha: float = 0.5,
) -> DataFrame:
    """Population Stability Index between two frontier snapshots'
    priority distributions — the standard drift score (credit-risk
    monitoring vocabulary, applied here to the scheduler): a config
    push or a prioritizer bug that silently reshapes the priority
    histogram shows up as PSI long before throughput or fairness move.
    PSI = sum over bins of (p_after - p_before)·ln(p_after/p_before),
    with additive ``alpha``-smoothing on the UNION bin set so new or
    vanished bins stay finite (the deterministic stand-in for the
    ad-hoc 'replace 0 with 0.0001' rule).

    ONE summary row: (n_bins, total_before, total_after, psi, drift =
    'stable' < 0.1 <= 'moderate' < 0.25 <= 'major' — the conventional
    PSI bands). Scale shape: two map-combinable bin aggs (bin
    cardinality = priority levels, tiny), one full outer join on bin,
    one 1-row rollup. No window, no UDF.
    """
    a = before.groupBy(F.col(col).alias("bin")).agg(
        F.count("*").alias("ca"))
    b = after.groupBy(F.col(col).alias("bin")).agg(
        F.count("*").alias("cb"))
    bins = (
        a.join(b, "bin", "full_outer")
        .select("bin",
                F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
                F.coalesce(F.col("cb"), F.lit(0)).alias("cb"))
    )
    tot = bins.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"),
                   F.count("*").alias("nb"))
    sm = bins.crossJoin(F.broadcast(tot)).select(
        "nb", "ta", "tb",
        ((F.col("ca") + alpha)
         / (F.col("ta") + alpha * F.col("nb"))).alias("pa"),
        ((F.col("cb") + alpha)
         / (F.col("tb") + alpha * F.col("nb"))).alias("pb"),
    )
    psi = F.sum((F.col("pb") - F.col("pa"))
                * F.log(F.col("pb") / F.col("pa")))
    out = sm.groupBy("nb", "ta", "tb").agg(F.round(psi, 6).alias("psi"))
    return out.select(
        F.col("nb").cast("bigint").alias("n_bins"),
        F.col("ta").cast("bigint").alias("total_before"),
        F.col("tb").cast("bigint").alias("total_after"),
        "psi",
        F.when(F.col("psi") < 0.1, F.lit("stable"))
        .when(F.col("psi") < 0.25, F.lit("moderate"))
        .otherwise(F.lit("major")).alias("drift"),
    )


def discovery_forecast(
    checkpoints: DataFrame,
    superstep_col: str = "superstep",
    yield_col: str = "new_urls",
) -> DataFrame:
    """Discovery-decay forecast from the checkpoint history: frontier
    yield under a fixed scope decays ~geometrically as the reachable
    set saturates, so fitting ln(yield) = ln a + t·ln r by OLS over
    the observed supersteps (the Heaps/Zipf-style moment fit this
    engine already uses for vocabulary growth) turns the saturation
    CURVE into a decision number: how many more supersteps until new
    URLs per round drops below one — i.e. when to stop paying for
    this crawl scope.

    ONE summary row: (n_points, ln_a, decay_r, r2, next_yield =
    a·r^(t_max+1), eta_supersteps = ceil(-ln a / ln r) — the t where
    a·r^t < 1 — NULL when the fit says yield is NOT decaying
    (r >= 1) or the fit is degenerate). Zero-yield supersteps are
    excluded from the log fit (ln 0), which biases r upward — the
    conservative direction for a stop decision.

    Scale shape: guarded covar_pop/var_pop moments over the
    checkpoint log (supersteps-sized metadata) — one tiny agg, no
    window, no collect.
    """
    pts = checkpoints.select(
        F.col(superstep_col).cast("double").alias("t"),
        F.log(F.col(yield_col).cast("double")).alias("y"),
    ).filter(F.col("y").isNotNull())
    m = pts.agg(
        F.count("*").alias("n"),
        F.covar_pop("t", "y").alias("cov"),
        F.var_pop("t").alias("vt"),
        F.var_pop("y").alias("vy"),
        F.avg("t").alias("mt"),
        F.avg("y").alias("my"),
        F.max("t").alias("tmax"),
    )
    ok = (F.col("n") >= 2) & (F.col("vt") > 0)
    slope = F.col("cov") / F.col("vt")
    ln_a = F.col("my") - slope * F.col("mt")
    r2 = F.when(F.col("vy") > 0,
                (F.col("cov") * F.col("cov"))
                / (F.col("vt") * F.col("vy")))
    nxt = F.exp(ln_a + slope * (F.col("tmax") + 1))
    eta = F.when(slope < 0,
                 F.ceil(-ln_a / slope).cast("bigint"))
    return m.select(
        F.col("n").cast("bigint").alias("n_points"),
        F.when(ok, F.round(ln_a, 6)).alias("ln_a"),
        F.when(ok, F.round(F.exp(slope), 6)).alias("decay_r"),
        F.when(ok, F.round(r2, 6)).alias("r2"),
        F.when(ok, F.round(nxt, 6)).alias("next_yield"),
        F.when(ok, eta).alias("eta_supersteps"),
    )


def sitemap_gate_conflicts(
    sitemap_locs: DataFrame,
    robots: DataFrame,
    user_agent: str = "*",
    loc_col: str = "loc",
) -> DataFrame:
    """Publisher self-contradiction audit: URLs a host DECLARES in its
    sitemaps but DENIES through robots.txt. The sitemaps protocol and
    REP are maintained independently on real sites, and the conflict
    set is operationally important both ways — the crawler must not
    fetch them (REP wins), and a host where most declared URLs are
    denied has a broken publishing pipeline whose sitemap hints
    (lastmod cadence, priority) should not be trusted
    (cf. freshness.hint_trust).

    Composes the real R2 gate over the declared set. Per host:
    (n_declared, n_denied, denied_share). Locs are expected canonical
    (the C1 seed-ingestion path, same contract as sitemap_coverage).

    Scale shape: one distinct on the loc set, the gate's broadcast
    longest-match join, one host agg.
    """
    from sparkcrawl.functions.urlnorm import host_of_canonical_col
    from sparkcrawl.operators.robots import robots_gate

    locs = sitemap_locs.select(F.col(loc_col).alias("url")).distinct()
    batch = locs.select(
        host_of_canonical_col(F.col("url")).alias("host"),
        "url", F.md5("url").alias("url_hash"))
    gated = robots_gate(batch, robots, user_agent)
    agg = gated.groupBy("host").agg(
        F.count("*").alias("n_declared"),
        F.sum((~F.col("robots_allowed")).cast("long")).alias("n_denied"),
    )
    return agg.select(
        "host", "n_declared", "n_denied",
        F.round(F.col("n_denied") / F.col("n_declared"), 6)
        .alias("denied_share"),
    )
