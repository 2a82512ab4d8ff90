"""Parallel-page (bitext) candidate mining from URL structure.

Multilingual sites publish translations under systematic URL variants —
a language subdomain (``en.site.example``), a language path segment
(``/en/``), or a language query parameter (``?hl=en``). STRAND (Resnik
& Smith, Computational Linguistics 2003) showed that stripping the
language marker and joining pages on the remaining URL "skeleton"
recovers translation pairs at web scale; Bitextor and the WMT shared
tasks use the same structural signal before any content alignment.
This module is that structural stage, expressed relationally:

  - ``url_language_skeleton``: pure-codegen regexp projection — three
    marker positions recognized (subdomain / path segment / query
    param), marker replaced by a ``_L_`` placeholder, detected language
    emitted alongside. No UDF, no shuffle.
  - ``parallel_page_candidates``: groups capped BEFORE the pair square
    (row_number rank-limit -> WindowGroupLimit, same shape as
    cocitation_pairs), then ONE self-equi-join on the skeleton — never
    an all-pairs product. A STRAND-style length-ratio filter prunes
    implausible pairs (translations have comparable lengths).

Scale: the join key is the skeleton, whose group size is bounded by
``max_group`` (a real site exposes one page per language, so dozens at
most; the cap defends against aggregator/spam skeletons). Worst-case
work per skeleton is max_group^2 rows — constant — so the whole plan is
one capped shuffle at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ISO-639-1 codes recognized as URL language markers by default; any
# alternation passed by the caller must stay RE2-safe (no lookaround)
# so the DuckDB oracle can run the identical pattern.
DEFAULT_LANG_CODES = (
    "ar", "de", "en", "es", "fr", "it", "ja", "ko",
    "nl", "pl", "pt", "ru", "tr", "zh",
)


def _alt(codes: tuple[str, ...]) -> str:
    return "|".join(codes)


def url_language_skeleton(
    pages: DataFrame,
    url_col: str = "url",
    codes: tuple[str, ...] = DEFAULT_LANG_CODES,
) -> DataFrame:
    """Add ``skeleton`` and ``url_lang`` columns derived from the URL.

    Marker positions, checked in precedence order (subdomain > path >
    query param): ``http://en.host/..`` / ``../en/..`` / ``?lang=en``
    (also ``hl=`` and ``locale=``). All occurrences are normalized to
    ``_L_`` in the skeleton; ``url_lang`` is the first marker found or
    NULL when the URL carries none (such pages cannot pair).

    Pure regexp codegen — the patterns avoid lookaround so both Java
    regex (Spark) and RE2 (DuckDB oracle) execute them identically.
    The query-param pattern therefore anchors the code's END by
    matching-and-re-emitting the terminator (``(&|$)`` via ``$3``)
    instead of a lookahead: without it ``?lang=eng`` matches ``en``
    and leaves ``?lang=_L_g`` residue, mislabeling url_lang. (Known
    limit: back-to-back markers ``?lang=en&hl=fr`` consume the ``&``,
    so only the first is normalized — same as the pre-fix behavior.)
    """
    alt = _alt(codes)
    sub_pat = rf"^(https?://)({alt})\."
    path_pat = rf"/({alt})/"
    query_pat = rf"([?&](?:lang|hl|locale)=)({alt})(&|$)"
    u = F.col(url_col)
    skeleton = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(u, sub_pat, "$1_L_."),
            path_pat, "/_L_/"),
        query_pat, "$1_L_$3")
    lang = F.coalesce(
        F.nullif(F.regexp_extract(u, rf"^https?://({alt})\.", 1), F.lit("")),
        F.nullif(F.regexp_extract(u, path_pat, 1), F.lit("")),
        F.nullif(
            F.regexp_extract(u, rf"[?&](?:lang|hl|locale)=({alt})(&|$)", 1),
            F.lit("")),
    )
    return pages.withColumn("skeleton", skeleton).withColumn("url_lang", lang)


def parallel_page_candidates(
    pages: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    len_col: str = "n_chars",
    codes: tuple[str, ...] = DEFAULT_LANG_CODES,
    max_group: int = 6,
    max_len_ratio: float = 2.0,
) -> DataFrame:
    """Translation-pair candidates: (skeleton, id_a, lang_a, len_a,
    id_b, lang_b, len_b, len_ratio) with lang_a < lang_b.

    Stages (all relational, one shuffle on the skeleton):
      1. skeleton projection (``url_language_skeleton``);
      2. per-skeleton cap at ``max_group`` rows, deterministic order
         (url_lang, id) — rank-limit form so Spark plans a
         WindowGroupLimit, never a full per-group sort spill;
      3. self-equi-join on skeleton, strictly cross-language
         (lang_a < lang_b also dedups the unordered pair);
      4. STRAND length-ratio prune: max(len)/min(len) <= max_len_ratio
         (empty docs clamped to length 1).
    """
    marked = (
        url_language_skeleton(pages, url_col, codes)
        .filter(F.col("url_lang").isNotNull())
        .select(
            F.col(id_col).alias("id"),
            "skeleton",
            "url_lang",
            F.greatest(F.col(len_col).cast("long"), F.lit(1)).alias("_len"),
        )
    )
    w = Window.partitionBy("skeleton").orderBy("url_lang", "id")
    capped = (
        marked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_group)
        .drop("_rn")
    )
    a = capped.select(
        "skeleton", F.col("id").alias("id_a"),
        F.col("url_lang").alias("lang_a"), F.col("_len").alias("len_a"))
    b = capped.select(
        "skeleton", F.col("id").alias("id_b"),
        F.col("url_lang").alias("lang_b"), F.col("_len").alias("len_b"))
    ratio = (F.greatest("len_a", "len_b").cast("double")
             / F.least("len_a", "len_b"))
    return (
        a.join(b, "skeleton")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .withColumn("len_ratio", F.round(ratio, 6))
        .filter(F.col("len_ratio") <= F.lit(float(max_len_ratio)))
        .select("skeleton", "id_a", "lang_a", "len_a",
                "id_b", "lang_b", "len_b", "len_ratio")
    )


def reciprocal_hreflang_pairs(decls: DataFrame) -> DataFrame:
    """Confirmed translation pairs from publisher hreflang annotations.

    Input: (url, lang, alt_url) declaration rows as produced by
    :func:`sparkcrawl.operators.extract.extract_hreflang_declarations`.
    Output: (url_a, lang_a, url_b, lang_b) with ``url_a < url_b``,
    where page A declares B as a language variant AND B declares A
    back — the "return link" confirmation Google's hreflang
    guidelines require before trusting the annotation (an unconfirmed
    one-way declaration is routinely wrong or stale, so it is
    dropped). Each page's language label is what its PARTNER declares
    for it: lang_a is B's declaration of A, lang_b is A's declaration
    of B. Self-declarations (``alt_url == url``) and ``x-default``
    selector entries carry no pairing information and are filtered
    first.

    Plan shape: distinct declaration triples, then ONE self-equi-join
    on the (alt_url = url, url = alt_url) key pair with the ``url_a <
    url_b`` orientation predicate folded into the join condition (so
    each unordered pair is emitted once, never double-joined then
    halved), then a distinct. Both joins keys are single URLs — an
    even hash shuffle with no skew pole (a site's hreflang fan-out is
    its language count, dozens at most) and no window anywhere.
    """
    from sparkcrawl.operators import tracked_persist

    # Both sides of the reciprocity self-join consume the SAME distinct
    # declaration table; without a materialization boundary the whole
    # upstream extraction pipeline is planned (and executed) twice —
    # once per join side (guide §5: persist when a DataFrame is reused
    # and recomputing beats the memory pressure; the fingerprint tables
    # in cross_corpus_contamination use the same pattern).
    d = tracked_persist(
        decls.filter(
            (F.col("alt_url") != F.col("url"))
            & (F.col("lang") != "x-default")
        )
        .select("url", "lang", "alt_url")
        .distinct()
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.alt_url") == F.col("b.url"))
            & (F.col("b.alt_url") == F.col("a.url"))
            & (F.col("a.url") < F.col("a.alt_url")),
        )
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b.lang").alias("lang_a"),
            F.col("a.alt_url").alias("url_b"),
            F.col("a.lang").alias("lang_b"),
        )
        .distinct()
    )
