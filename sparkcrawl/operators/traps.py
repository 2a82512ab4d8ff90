"""Crawler-trap detection: URL-shape features + host template fanout.

Traps are the classic crawl failure mode the reference era knew well
(calendar pages, session-id mazes, cycles like /a/a/a/... created by
relative-link bugs): an infinite or combinatorially huge URL space on
one host that starves the rest of the frontier. Spyder's answer was
the regex scoper (F2) — manual, per-crawl. At 10^10-URL scale the
engine should *detect* trap shapes from the frontier itself and feed
the verdict back as scope rules or priority demotion.

Two complementary detectors, both pure relational:

  1. per-URL shape features (``url_trap_features``) — depth, adjacent
     path-segment repetition (the /a/a/a signature), digit-run count,
     query-parameter count. Pure column expressions over split/filter
     higher-order functions: whole-stage codegen, no UDF, no shuffle.
  2. host-template fanout (``host_template_fanout``) — collapse every
     digit run in the path to 'N' and count URLs per (host, template).
     A calendar trap collapses to ONE template with a huge count
     (/2024/01/03 -> /N/N/N); legitimate content spreads over many
     low-count templates. One hash aggregation on (host, template) —
     map-side combined, and the output is aggregate-sized (one row
     per template), so the flag join back to URLs broadcasts at any
     input scale where it matters.

``flag_traps`` combines both: a URL is trap-suspect if its own shape
is degenerate OR it instantiates a template whose fanout exceeds the
threshold. Indexing inside lambdas uses 1-based ``element_at`` so the
DuckDB oracle (1-based lists) is the literal same expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# path = everything after the authority, before ?/# ; query = after ?
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)?"
_QUERY_RE = r"\?([^#]*)"


def _segments(path: F.Column) -> F.Column:
    return F.filter(F.split(path, "/"), lambda s: s != "")


def url_trap_features(df: DataFrame, url: str = "url") -> DataFrame:
    """Append per-URL shape feature columns.

    Adds: path, host_template (host + digit-collapsed path), depth,
    adjacent_repeats, digit_runs, n_params.
    """
    u = F.col(url)
    # materialize the parsed pieces ONCE, then derive features from the
    # columns — referencing the regexp expressions directly would
    # re-evaluate each extract per consuming feature (lambda captures
    # defeat codegen subexpression elimination)
    parsed = df.withColumns(
        {
            "path": F.coalesce(F.regexp_extract(u, _PATH_RE, 1), F.lit("")),
            "_q": F.regexp_extract(u, _QUERY_RE, 1),
            "_host": F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1),
        }
    ).withColumn("_segs", _segments(F.col("path")))
    segs = F.col("_segs")
    # i ranges over 1-based positions 1..size-1; repeat when seg[i+1]==seg[i]
    adjacent = F.size(
        F.filter(
            F.sequence(F.lit(1), F.size(segs) - 1),
            lambda i: F.element_at(segs, i + 1) == F.element_at(segs, i),
        )
    )
    return (
        parsed.withColumns(
            {
                "host_template": F.concat(
                    F.col("_host"), F.regexp_replace(F.col("path"), "[0-9]+", "N")
                ),
                "depth": F.size(segs),
                "adjacent_repeats": F.when(
                    F.size(segs) > 1, adjacent
                ).otherwise(F.lit(0)),
                # split on digit runs yields (runs+1) pieces
                "digit_runs": F.size(F.split(F.col("path"), "[0-9]+")) - 1,
                "n_params": F.when(F.col("_q") == "", F.lit(0)).otherwise(
                    F.size(F.split(F.col("_q"), "&"))
                ),
            }
        )
        .drop("_q", "_host", "_segs")
    )


def host_template_fanout(featured: DataFrame) -> DataFrame:
    """(host_template, fanout) — URL count per digit-collapsed template.
    Input must already carry ``host_template`` (from url_trap_features)."""
    return featured.groupBy("host_template").agg(F.count("*").alias("fanout"))


def filter_trap_candidates(
    links: DataFrame,
    cfg,
    rules: DataFrame | None = None,
    url: str = "url",
) -> DataFrame:
    """Engine-path candidate gate: drop discovered links whose shape is
    degenerate, plus links instantiating a known-trap template.

    The shape gate is pure codegen over the link batch (no shuffle);
    the template gate is a left-anti join against the trap-rules table
    (template cardinality is aggregate-sized, so AQE broadcasts it).
    Input columns are preserved exactly — features are computed, used,
    and dropped.
    """
    in_cols = links.columns
    featured = url_trap_features(links, url=url)
    kept = featured.filter(
        (F.col("depth") <= cfg.trap_max_depth)
        & (F.col("adjacent_repeats") < cfg.trap_max_adjacent_repeats)
        & (F.col("n_params") <= cfg.trap_max_params)
    )
    if rules is not None:
        kept = kept.join(
            F.broadcast(rules.select("host_template")), "host_template", "left_anti"
        )
    return kept.select(*in_cols)


def flag_traps(
    df: DataFrame,
    url: str = "url",
    max_depth: int = 12,
    max_adjacent_repeats: int = 2,
    max_params: int = 8,
    max_template_fanout: int = 1000,
) -> DataFrame:
    """Append ``trap_suspect`` (+ the feature columns) to each URL row.

    The fanout side is an aggregate over the input itself; joining it
    back on host_template is a self-aggregation join AQE broadcasts
    when the template table fits (it is smaller than the input by the
    fanout factor being detected).
    """
    from sparkcrawl.operators._caching import tracked_persist

    # the fanout agg and the flag join both consume the regex-heavy
    # feature subplan — persist it once (tracked: callers release via
    # operators._caching.release_caches(), the repo-wide pattern)
    featured = tracked_persist(url_trap_features(df, url=url))
    fanout = host_template_fanout(featured)
    shape_trap = (
        (F.col("depth") > max_depth)
        | (F.col("adjacent_repeats") >= max_adjacent_repeats)
        | (F.col("n_params") > max_params)
    )
    return (
        featured.join(fanout, "host_template")
        .withColumn(
            "trap_suspect",
            shape_trap | (F.col("fanout") > max_template_fanout),
        )
    )
