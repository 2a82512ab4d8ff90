"""Mirror-host detection — hosts serving the same content at the same paths.

Mirrors waste crawl budget (every page fetched once per replica) and
skew corpus statistics. Bharat & Broder's mirror study ("A comparison
of techniques to find mirrored hosts on the WWW", WWW 1999) showed
that the strongest cheap signal is agreement on (path, content) pairs
between two hosts. This module is that test as one capped relational
plan:

  1. project every page to (host, path, content md5) — 32-byte keys
     travel the shuffles, never bodies;
  2. keep one row per (host, path) (min content hash — deterministic
     under re-crawl races);
  3. drop (path, content) keys shared by more than ``max_hosts_per_key``
     hosts BEFORE the pair square — web-wide boilerplate ("/robots.txt"
     with an empty body, default index pages) would otherwise create a
     quadratic hub exactly like a high-df shingle in MinHash-LSH;
  4. self-equi-join on (path, md5) with host_a < host_b and count the
     agreements; normalize by the smaller host's page count.

Scale: the join key group size is bounded by the cap, so worst-case
work per key is max_hosts_per_key^2 — the same defense every pair
search in this engine uses (cocitation, LSH bands, kNN buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_HOST_PAT = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_URL_PATH_PAT = r"^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?"


def host_path_content(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(host, path, content_md5), one row per (host, path).

    Pure regexp/md5 codegen projection, then ONE hash agg (min md5 per
    host+path) — no window, no UDF. Missing paths normalize to "/".
    """
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, _URL_HOST_PAT, 1))
    path = F.regexp_extract(u, _URL_PATH_PAT, 1)
    return (
        pages.select(
            host.alias("host"),
            F.when(path == "", "/").otherwise(path).alias("path"),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("content_md5"),
        )
        .groupBy("host", "path")
        .agg(F.min("content_md5").alias("content_md5"))
    )


def mirror_host_pairs(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_shared: int = 2,
    min_score: float = 0.5,
    max_hosts_per_key: int = 20,
) -> DataFrame:
    """(host_a, host_b, n_shared, size_a, size_b, mirror_score) for
    host pairs agreeing on >= ``min_shared`` (path, content) keys with
    agreement >= ``min_score`` of the smaller host's footprint.

    ``max_hosts_per_key`` prunes boilerplate keys before the self-join
    (step 3 in the module docstring); host sizes are computed from the
    UNPRUNED projection so the score denominator stays honest.
    """
    hpc = host_path_content(pages, url_col, text_col)
    sizes = hpc.groupBy("host").agg(F.count("*").alias("size"))

    key_df = hpc.groupBy("path", "content_md5").agg(
        F.count("*").alias("_nh"))
    rare = key_df.filter(F.col("_nh") <= max_hosts_per_key).drop("_nh")
    pruned = hpc.join(rare, ["path", "content_md5"])

    a = pruned.select("path", "content_md5", F.col("host").alias("host_a"))
    b = pruned.select("path", "content_md5", F.col("host").alias("host_b"))
    shared = (
        a.join(b, ["path", "content_md5"])
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    za = sizes.select(F.col("host").alias("host_a"),
                      F.col("size").alias("size_a"))
    zb = sizes.select(F.col("host").alias("host_b"),
                      F.col("size").alias("size_b"))
    score = F.round(
        F.col("n_shared") / F.least("size_a", "size_b").cast("double"), 6)
    return (
        shared.join(za, "host_a").join(zb, "host_b")
        .withColumn("mirror_score", score)
        .filter(F.col("mirror_score") >= F.lit(float(min_score)))
        .select("host_a", "host_b", "n_shared", "size_a", "size_b",
                "mirror_score")
    )

def mirror_canonicalize(
    urls: DataFrame,
    mirror_pairs: DataFrame,
    url_col: str = "url",
    max_iters: int = 25,
) -> DataFrame:
    """Apply mined mirror pairs PRE-FETCH: elect one canonical host per
    mirror cluster and rewrite frontier URLs onto it, so every replica
    family is crawled once (the budget fix the detector exists for —
    same apply-the-mined-rules placement as the DUST CASE rewrite).

    Canonical election: connected components over the (host_a, host_b)
    pair graph — mirror families can chain through partial overlaps,
    so a plain pair lookup would elect two different canonicals for
    one family — with the MINIMUM host name as the cluster label
    (deterministic, no tie-break state).

    Output: (url, host, canonical_host, canonical_url, rewritten);
    non-mirrored URLs pass through with canonical_host NULL and
    canonical_url = url, so the result is a drop-in frontier
    projection.

    Plan shape: the CC iterations run on the HOST-PAIR graph (mirror
    clusters are tiny next to the frontier — label propagation costs
    one equi-join + min-agg per round with scalar-only convergence
    reads); the frontier itself sees ONE broadcast hash join on the
    extracted host plus pure regexp/concat codegen for the rewrite —
    no shuffle of frontier rows at any scale.
    """
    from sparkcrawl.operators.textops import connected_components

    mapping = (
        connected_components(
            mirror_pairs, "host_a", "host_b", max_iters=max_iters
        )
        .select(
            F.col("id").alias("host"),
            F.col("comp").alias("canonical_host"),
        )
        .filter(F.col("host") != F.col("canonical_host"))
    )
    u = F.col(url_col)
    scheme = F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*://)", 1)
    host = F.lower(F.regexp_extract(u, _URL_HOST_PAT, 1))
    rest = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]+(.*)$", 1)
    joined = urls.withColumn("host", host).join(
        F.broadcast(mapping), "host", "left"
    )
    rewritten = F.col("canonical_host").isNotNull()
    return joined.select(
        u.alias("url"),
        "host",
        "canonical_host",
        F.when(
            rewritten, F.concat(scheme, F.col("canonical_host"), rest)
        ).otherwise(u).alias("canonical_url"),
        rewritten.alias("rewritten"),
    )


def scheme_migration_report(
    urls: DataFrame,
    url_col: str = "url",
    min_paths: int = 3,
    migrate_share: float = 0.8,
) -> DataFrame:
    """HTTP->HTTPS migration detector — the intra-host special case of
    mirroring: the same host serving the same paths on both schemes is
    the single most common duplicate family on the web since the
    HTTPS-everywhere migration. A frontier that treats the two schemes
    as distinct URLs fetches everything twice; once a host is observed
    serving (nearly) everything over https, its http frontier rows
    should be folded into https pre-fetch (cf. the HSTS upgrade
    browsers apply — here derived from crawl observation instead of a
    header).

    Per host over DISTINCT (host, rest-of-URL) path keys:
    ``n_paths``, ``n_http_only``, ``n_https_only``, ``n_both``,
    ``https_share`` = (n_both + n_https_only)/n_paths, and ``migrate``
    = n_paths >= ``min_paths`` AND https_share >= ``migrate_share``.

    Scale shape: one projection, then TWO hash aggs — (host, rest)
    with two bool max's (absorbs re-crawl duplicates), then host —
    both map-side combinable; output is |hosts|-sized. No join, no
    window, no UDF.
    """
    u = F.col(url_col)
    scheme = F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*)://", 1)
    host = F.regexp_extract(u, _URL_HOST_PAT, 1)
    rest = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]+(.*)$", 1)
    per_path = (
        urls.select(scheme.alias("scheme"), host.alias("host"),
                    rest.alias("rest"))
        .filter((F.col("host") != "")
                & F.col("scheme").isin("http", "https"))
        .groupBy("host", "rest")
        .agg(F.max((F.col("scheme") == "http").cast("int")).alias("h"),
             F.max((F.col("scheme") == "https").cast("int")).alias("s"))
    )
    agg = per_path.groupBy("host").agg(
        F.count("*").alias("n_paths"),
        F.sum(((F.col("h") == 1) & (F.col("s") == 0)).cast("long"))
        .alias("n_http_only"),
        F.sum(((F.col("h") == 0) & (F.col("s") == 1)).cast("long"))
        .alias("n_https_only"),
        F.sum(((F.col("h") == 1) & (F.col("s") == 1)).cast("long"))
        .alias("n_both"),
    )
    share_raw = (F.col("n_both") + F.col("n_https_only")) / F.col("n_paths")
    return agg.select(
        "host", "n_paths", "n_http_only", "n_https_only", "n_both",
        F.round(share_raw, 6).alias("https_share"),
        ((F.col("n_paths") >= min_paths)
         & (share_raw >= migrate_share)).alias("migrate"),
    )


def scheme_merge_map(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """The pre-fetch rewrite list for :func:`scheme_migration_report`:
    one (url_from, url_to) row per path observed under BOTH schemes —
    the http variant folds into the https one (dedup merge before the
    seen-filter, exactly like the DUST CASE rewrite). Same two-agg
    shape; the pair is reconstructed by concatenation, so nothing but
    (host, rest) keys ever shuffles."""
    u = F.col(url_col)
    scheme = F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*)://", 1)
    host = F.regexp_extract(u, _URL_HOST_PAT, 1)
    rest = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]+(.*)$", 1)
    both = (
        urls.select(scheme.alias("scheme"), host.alias("host"),
                    rest.alias("rest"))
        .filter((F.col("host") != "")
                & F.col("scheme").isin("http", "https"))
        .groupBy("host", "rest")
        .agg(F.max((F.col("scheme") == "http").cast("int")).alias("h"),
             F.max((F.col("scheme") == "https").cast("int")).alias("s"))
        .filter((F.col("h") == 1) & (F.col("s") == 1))
    )
    return both.select(
        F.concat(F.lit("http://"), F.col("host"), F.col("rest"))
        .alias("url_from"),
        F.concat(F.lit("https://"), F.col("host"), F.col("rest"))
        .alias("url_to"),
    )
