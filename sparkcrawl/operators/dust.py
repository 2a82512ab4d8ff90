"""DUST rule mining — "Different URLs with Similar Text".

A large crawl wastes budget re-fetching aliases of pages it already
has: ``/a/`` vs ``/a/index.html``, ``http://`` vs ``https://``,
``host`` vs ``www.host``, tracking-parameter variants. The public
DustBuster method (Bar-Yossef, Keidar & Schonfeld, WWW 2007 — "Do not
crawl in the DUST") mines SITE-SPECIFIC string-substitution rules from
pairs of URLs already observed to carry the same content, then applies
the high-support rules as a pre-fetch canonicalizer — cheaper than
fetching and hashing the alias.

Relational re-expression (no reference code — the original is an
offline log-mining algorithm):

1. group fetched URLs by content key (the content-seen hash the crawl
   already computes), CAP each group (top-``max_group`` by URL order —
   a mega-duplicate group contributes rule evidence quadratically and
   is exactly the group that needs no more evidence);
2. self-join within groups (u1 < u2): each pair is one observation of
   an alias relation;
3. factor each pair as (shared prefix, differing middles, shared
   suffix) via longest-common-prefix/suffix — pure higher-order
   column functions (``sequence``/``filter``/``size``), no UDF: prefix
   equality is monotone, so COUNTING the prefix lengths that match IS
   the LCP;
4. the differing middles are the candidate rule (a -> b); aggregate
   support = number of observing pairs and breadth = distinct hosts.

Rules with high support + breadth are the crawl's DUST canonicalizer
(fed to urlnorm as site rewrite rules). Cost model at scale: one
capped self-join per content group + one hash agg over pair-bounded
rows; the per-pair LCP is O(len^2) character compares on short URL
strings, inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def mine_dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    content_col: str = "content_key",
    max_group: int = 6,
    min_support: int = 2,
) -> DataFrame:
    """Mine (rule_from, rule_to) substitution rules from same-content
    URL pairs. Output: (rule_from, rule_to, support, n_hosts,
    example_from, example_to), support >= min_support, rules ordered
    by the (u1 < u2) pair orientation so each rule is canonical."""
    rn = F.row_number().over(W.partitionBy("ck").orderBy("u"))
    capped = (
        pages.select(F.col(content_col).alias("ck"), F.col(url_col).alias("u"))
        .distinct()
        .withColumn("rn", rn)
        .filter(F.col("rn") <= max_group)
        .drop("rn")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.ck") == F.col("b.ck")) & (F.col("a.u") < F.col("b.u")),
    ).select(F.col("a.u").alias("u1"), F.col("b.u").alias("u2"))

    u1, u2 = F.col("u1"), F.col("u2")
    m = F.least(F.length(u1), F.length(u2))

    def _common_len(x, y):
        # prefix equality is monotone in i, so the match count == LCP
        return F.size(
            F.filter(
                F.sequence(F.lit(1), m),
                lambda i: F.substr(x, F.lit(1), i) == F.substr(y, F.lit(1), i),
            )
        )

    lcp = _common_len(u1, u2)
    lcs_raw = _common_len(F.reverse(u1), F.reverse(u2))
    d = pairs.select(
        "u1", "u2",
        lcp.alias("lcp"),
        F.least(lcs_raw, m - lcp).alias("lcs"),
    )
    rule_from = F.substr(
        u1, F.col("lcp") + 1, F.length(u1) - F.col("lcp") - F.col("lcs")
    )
    rule_to = F.substr(
        u2, F.col("lcp") + 1, F.length(u2) - F.col("lcp") - F.col("lcs")
    )
    host = F.regexp_extract(u1, r"^[a-z]+://([^/]+)", 1)
    # Orient every rule longer->shorter (tie: lexicographic) so the
    # canonical direction is the REMOVING rewrite — 'index.html' -> ''
    # not '' -> 'index.html'. An insertion rule has no anchor to apply
    # at and is useless to a canonicalizer; the alias relation is
    # symmetric so orientation is free.
    fwd = (F.length(rule_from) > F.length(rule_to)) | (
        (F.length(rule_from) == F.length(rule_to)) & (rule_from > rule_to)
    )
    rules = d.select(
        F.when(fwd, rule_from).otherwise(rule_to).alias("rule_from"),
        F.when(fwd, rule_to).otherwise(rule_from).alias("rule_to"),
        host.alias("host"),
        F.when(fwd, u1).otherwise(u2).alias("u1"),
        F.when(fwd, u2).otherwise(u1).alias("u2"),
    )
    return (
        rules.groupBy("rule_from", "rule_to")
        .agg(
            F.count("*").alias("support"),
            F.countDistinct("host").alias("n_hosts"),
            F.min("u1").alias("example_from"),
            F.min("u2").alias("example_to"),
        )
        .filter(F.col("support") >= min_support)
    )


def dust_rewrite_column(url, rules: list[tuple[str, str]]):
    """Compile a (small, curated) rule list into ONE codegen CASE
    chain: the first matching rule rewrites, checked in list order —
    callers pass rules sorted by support descending, so this equals
    :func:`apply_dust_rules`'s max_by-support choice with ZERO joins
    and zero shuffle, the shape the crawl engine wants on its hottest
    intermediate (the exploded link stream). Rule count is bounded by
    contract (cfg.dust_max_rules) exactly like the politeness/queue
    tables: mined DUST rules are top-support site rewrites, dozens in
    practice, never data-sized."""
    col = url
    for frm, to in reversed(rules):
        col = F.when(
            url.contains(F.lit(frm)), F.replace(url, F.lit(frm), F.lit(to))
        ).otherwise(col)
    return col


def load_dust_rules(
    spark,
    path: str,
    min_support: int = 3,
    min_hosts: int = 1,
    max_rules: int = 200,
) -> list[tuple[str, str]]:
    """Read a mined-rules parquet (``mine_dust_rules`` output) and
    return the top rules as an ordered list for
    :func:`dust_rewrite_column`. The collect is config-bounded
    (``max_rules``) — never data-sized. Deterministic order:
    (support desc, rule_from, rule_to)."""
    rows = (
        spark.read.parquet(path)
        .filter(
            (F.col("support") >= min_support)
            & (F.col("n_hosts") >= min_hosts)
            & (F.length("rule_from") > 0)
        )
        .orderBy(F.desc("support"), "rule_from", "rule_to")
        .limit(max_rules)
        .select("rule_from", "rule_to")
        .collect()
    )
    return [(r.rule_from, r.rule_to) for r in rows]


def apply_dust_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    min_support: int = 3,
    min_hosts: int = 1,
) -> DataFrame:
    """Apply mined rules as a pre-fetch canonicalizer: rewrite each URL
    by its single highest-support applicable rule (one pass — DustBuster
    applies rules iteratively offline; one pass already collapses the
    dominant alias classes). Broadcast the (small, curated) rule table;
    a URL no rule matches passes through unchanged.

    Output: urls' columns + ``dust_canonical``.
    """
    r = (
        rules.filter(
            (F.col("support") >= min_support) & (F.col("n_hosts") >= min_hosts)
        )
        .select("rule_from", "rule_to", "support")
        .filter(F.length("rule_from") > 0)  # insertion rules need anchors
    )
    u = urls.withColumn("_u", F.col(url_col))
    j = u.join(
        F.broadcast(r),
        F.col("_u").contains(F.col("rule_from")),
        "left",
    )
    best = (
        j.groupBy(*[F.col(c) for c in urls.columns])
        .agg(
            F.max_by(
                F.struct("rule_from", "rule_to"), F.struct("support", "rule_from")
            ).alias("_rule")
        )
    )
    rewritten = F.when(
        F.col("_rule.rule_from").isNotNull(),
        F.replace(F.col(url_col), F.col("_rule.rule_from"), F.col("_rule.rule_to")),
    ).otherwise(F.col(url_col))
    return best.select(*urls.columns, rewritten.alias("dust_canonical"))


def param_value_entropy(
    urls: DataFrame,
    url_col: str = "url",
    min_obs: int = 2,
    id_ratio: float = 0.9,
    max_enum_values: int = 64,
) -> DataFrame:
    """Per-(host, query-param) value-entropy mining — the statistical
    companion to :func:`mine_dust_rules`. DustBuster needs same-content
    PAIRS as evidence; the value-shape signal works pre-fetch, from
    the URL log alone: a parameter whose value is new on (almost)
    every observation (session ids, cache busters, click trackers) is
    a strip candidate, while a low-cardinality parameter (page=, sort=,
    lang=) selects content and must be kept. This is the standard
    "URL parameter handling" heuristic search engines document
    publicly, re-expressed relationally.

    Per (host, param):

    - ``n_obs`` observations, ``n_values`` distinct values,
      ``distinct_ratio`` = n_values/n_obs,
    - ``entropy_nats`` = ln(n_obs) - sum(c*ln c)/n_obs over the value
      counts c (the map-combinable entropy identity — no per-value
      probability column, both aggs are plain hash aggregations),
    - ``param_class``: ``id_like`` when n_obs >= ``min_obs`` and
      distinct_ratio >= ``id_ratio`` (strip candidate), else
      ``enum_like`` when n_values <= ``max_enum_values`` (keep), else
      ``mixed`` (high-cardinality but repeating — needs DUST pair
      evidence to decide).

    Scale shape: explode bounded by params-per-URL (small constant),
    then TWO hash aggs — (host,param,value) then (host,param) — both
    map-side combinable; output is dimension-sized. No window, no UDF,
    no self-join.
    """
    u = F.col(url_col)
    host = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    qs = F.regexp_extract(u, r"\?([^#]*)", 1)
    kv = (
        urls.select(host.alias("host"),
                    F.explode(F.split(qs, "&")).alias("pair"))
        .filter(F.col("pair") != "")
        .select(
            "host",
            F.substring_index("pair", "=", 1).alias("param"),
            F.regexp_extract("pair", r"^[^=]*(?:=(.*))?$", 1).alias("value"),
        )
        .filter(F.col("param") != "")
    )
    per_val = kv.groupBy("host", "param", "value").agg(
        F.count("*").alias("c"))
    agg = per_val.groupBy("host", "param").agg(
        F.sum("c").alias("n_obs"),
        F.count("*").alias("n_values"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("_clnc"),
    )
    ratio_raw = F.col("n_values") / F.col("n_obs")
    cls = (
        F.when((F.col("n_obs") >= min_obs) & (ratio_raw >= id_ratio),
               F.lit("id_like"))
        .when(F.col("n_values") <= max_enum_values, F.lit("enum_like"))
        .otherwise(F.lit("mixed"))
    )
    return agg.select(
        "host",
        "param",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.round(ratio_raw, 6).alias("distinct_ratio"),
        F.round(F.log(F.col("n_obs")) - F.col("_clnc") / F.col("n_obs"),
                6).alias("entropy_nats"),
        cls.alias("param_class"),
    )
