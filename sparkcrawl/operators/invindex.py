"""Inverted index build + positional phrase search over the corpus.

A crawl is only as useful as the lookups it supports; the classic
serving structure is the inverted index (term -> sorted posting list,
delta-encoded — Witten/Moffat/Bell "Managing Gigabytes", and the
Zobel & Moffat survey, ACM CS 2006). Relationally the index IS a
table, and this module keeps it one:

  - ``token_positions``: (id, tok, pos) — the positional token table.
    Tokens come from one higher-order ``filter(split(...))`` projection
    (empties dropped BEFORE posexplode so positions are consecutive);
    no UDF, no shuffle.
  - ``inverted_index``: one distinct + one hash agg -> (term, df,
    postings, gaps). Posting lists are sorted doc-id arrays with
    delta-encoded gaps (the compression-ready form). ``max_df`` drops
    stopword-grade terms BEFORE any list is materialized — the same
    high-df defense the MinHash and winnowing paths use; an unbounded
    collect_list on the term "the" is the one thing this plan must
    never do at 10^10 docs.
  - ``phrase_search``: conjunctive positional intersection — one
    equi-join per phrase term on (id, pos - offset), which Spark plans
    as hash joins co-partitioned on the id. No window, no cartesian,
    cost proportional to the rarest term's postings.

Phrase semantics: occurrences may overlap ("a a a" contains "a a"
twice); count = number of start positions, the standard definition.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_positions(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, tok, pos): lowercase whitespace tokens with 0-based
    consecutive positions (empty tokens removed before numbering)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != "")
    return docs.select(F.col(id_col).alias("id"),
                       F.posexplode(toks).alias("pos", "tok"))


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """(term, df, postings, gaps): sorted doc-id posting lists with
    delta-encoded gaps.

    ``max_df`` is the stopword cut: terms in more than ``max_df``
    documents are dropped before their lists exist (df is computed by
    a count agg, never by materializing the list). At web scale this
    bound is what keeps every posting array executor-resident; callers
    wanting the dropped head can read it from the df agg directly.
    """
    td = (token_positions(docs, text_col, id_col)
          .select("id", "tok").distinct())
    agg = td.groupBy(F.col("tok").alias("term")).agg(
        F.count("*").alias("df"),
        F.sort_array(F.collect_list("id")).alias("postings"),
    ).filter(F.col("df") >= min_df)
    if max_df is not None:
        agg = agg.filter(F.col("df") <= max_df)
    gaps = F.transform(
        F.col("postings"),
        lambda x, i: x - F.coalesce(F.get(F.col("postings"), i - 1),
                                    F.lit(0)),
    )
    return agg.withColumn("gaps", gaps)


def phrase_search(docs: DataFrame, phrase: list[str],
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, n_matches) for documents containing the exact token phrase.

    Term i's positions are normalized to the phrase start (pos - i) and
    intersected by equi-join; the surviving (id, start) pairs are the
    match starts. Joins after the first reuse the (id, pos) partitioning,
    so the phrase costs one shuffle plus one hash join per extra term.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    tp = token_positions(docs, text_col, id_col)
    legs = [
        tp.filter(F.col("tok") == w.lower())
        .select("id", (F.col("pos") - i).alias("start"))
        for i, w in enumerate(phrase)
    ]
    starts = reduce(lambda a, b: a.join(b, ["id", "start"]), legs)
    return starts.groupBy("id").agg(F.count("*").alias("n_matches"))


def percolate(docs: DataFrame, standing: DataFrame,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Standing-query percolation: match every incoming document against
    a table of registered term queries (the inverse of search — the
    queries are the index, the documents are the probes; Elasticsearch
    calls this a percolator, crawl pipelines use it for topical alerts
    and crawl steering: "flag every fetched page mentioning X AND Y").

    ``standing``: (query_id, terms array<string>, mode 'all'|'any').
    Output: (id, query_id, matched_terms, n_terms, mode) — one row per
    (document, query) the query accepts: every term present for 'all',
    at least one for 'any'. Term matching is over the document's
    DISTINCT lowercase whitespace tokens (token_positions' tokenizer),
    so matched_terms counts query terms present, not occurrences.

    Plan shape: the standing side is exploded to (query_id, term) and
    BROADCAST (alerting rule sets are thousands of rows, never
    frontier-scale); the probe side is the distinct token table. One
    broadcast hash EQUI-join on the term — never a nested-loop over
    (docs x queries) — then one hash agg on (id, query_id) whose
    cardinality is bounded by actual hits. Documents sharing no term
    with any query exit at the join; at 10^10 docs the cost tracks
    hit volume, not corpus volume. No UDF, no window.
    """
    norm = F.array_distinct(F.transform("terms", F.lower))
    qterms = standing.select(
        "query_id", "mode",
        # n_terms over the SAME normalized set matched_terms counts
        # against — duplicate or mixed-case entries in a rule must not
        # make 'all' unsatisfiable.
        F.size(norm).alias("n_terms"),
        F.explode(norm).alias("tok"),
    )
    doc_toks = (token_positions(docs, text_col, id_col)
                .select("id", "tok").distinct())
    hits = doc_toks.join(F.broadcast(qterms), "tok")
    matched = hits.groupBy("id", "query_id", "mode", "n_terms").agg(
        F.count("*").alias("matched_terms"))
    return (
        matched.filter(
            (F.col("mode") == "any")
            | (F.col("matched_terms") == F.col("n_terms")))
        .select("id", "query_id", "matched_terms", "n_terms", "mode")
    )


def postings_size_estimate(index: DataFrame) -> DataFrame:
    """Index storage planning over :func:`inverted_index` output: per
    term, the posting list's size under fixed-width int64 vs
    delta+varint encoding (the standard layout — Witten/Moffat/Bell ch.
    3: gaps are small for dense terms, so 7-bit varint groups shrink
    exactly the lists that are big). The estimate decides shard counts
    and cache budgets BEFORE writing a 10^10-doc index: rare terms
    compress ~nothing, the head compresses ~8x.

    Output: (term, df, raw_bytes = 8*df, varint_bytes = sum over gaps
    of ceil(bits/7) bytes, savings_frac). Pure nested-HOF arithmetic
    over the existing gaps arrays — one projection, no explode, no
    shuffle, no UDF; doc ids up to 2^35 take <= 5 varint bytes (the
    CASE ladder is exact integer math, identical in the oracle).
    """
    def vbytes(g):
        return (
            F.when(g < F.lit(1 << 7), F.lit(1))
            .when(g < F.lit(1 << 14), F.lit(2))
            .when(g < F.lit(1 << 21), F.lit(3))
            .when(g < F.lit(1 << 28), F.lit(4))
            .otherwise(F.lit(5))
        )
    varint = F.aggregate(
        "gaps", F.lit(0).cast("bigint"),
        lambda acc, g: acc + vbytes(g).cast("bigint"),
    )
    raw = (F.col("df").cast("bigint") * 8)
    return index.select(
        "term",
        F.col("df").cast("bigint").alias("df"),
        raw.alias("raw_bytes"),
        varint.alias("varint_bytes"),
        F.round((raw - varint) / raw, 6).alias("savings_frac"),
    )
