"""Repetition & boilerplate quality filters for corpus curation.

Gopher-style repetition heuristics (Rae et al. 2021, table A1) and
corpus-level boilerplate n-gram detection — the standard pre-training
filters that remove pathologically repetitive documents (keyword
stuffing, templated spam) and shared boilerplate (navigation chrome,
cookie banners) before dedup/training.

Design for scale (the 100 TB shapes):

- **One pass over the text.** Per-doc word/bigram/trigram streams are
  built in a SINGLE projection (one ``split`` + three ``transform``
  lambdas over the same array, concatenated into one struct array and
  exploded once) — the document text is read and tokenized exactly
  once, entirely inside whole-stage codegen; no UDF, no second scan.
- **Two hash aggregations, no windows.** (id, n, gram) counts get
  map-side combine; the per-doc rollup is conditional aggregation over
  the tagged stream. Nothing sorts, nothing collects.
- **Boilerplate is a broadcast-back join.** The global n-gram
  doc-frequency table is filtered to ``min_docs`` BEFORE the join back
  to per-doc grams (dimension-sized by construction: boilerplate is,
  by definition, the small head of the distribution), so the join
  broadcasts.

All fractions are ``round(…, 6)`` to pin cross-engine float parity
with the DuckDB oracles (repo convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkcrawl.operators._caching import tracked_persist

__all__ = [
    "repetition_metrics",
    "boilerplate_ngrams",
    "boilerplate_share",
]


def _tagged_grams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n, gram) for word n-grams, n ∈ {1,2,3}, from ONE projection.

    Documents with fewer than 3 words are dropped (no trigram — the
    metrics are undefined; mirrored in the oracle SQL).
    """
    base = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.col(text_col)), " ").alias("ws"),
    ).filter(F.size("ws") >= 3)
    tagged = base.select(
        "id",
        F.explode(
            F.expr(
                """
                concat(
                  transform(ws, w -> struct(1 AS n, w AS gram)),
                  transform(
                    slice(ws, 1, size(ws) - 1),
                    (w, i) -> struct(
                      2 AS n,
                      concat_ws(' ', w, element_at(ws, i + 2)) AS gram)),
                  transform(
                    slice(ws, 1, size(ws) - 2),
                    (w, i) -> struct(
                      3 AS n,
                      concat_ws(' ', w, element_at(ws, i + 2),
                                element_at(ws, i + 3)) AS gram))
                )
                """
            )
        ).alias("g"),
    )
    return tagged.select("id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))


def repetition_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition heuristics (Gopher rules, word-level):

    - ``n_words``           — whitespace token count
    - ``dup_word_frac``     — fraction of word OCCURRENCES that are
                              repeats of an earlier word:
                              (total − distinct) / total
    - ``top_bigram_frac``   — occurrences of the most frequent bigram
                              / total bigrams (keyword-stuffing signal)
    - ``dup_trigram_frac``  — fraction of trigram occurrences that are
                              repeats (templated-text signal)

    Plan: one explode of the tagged n-gram stream, then
    ``groupBy(id, n, gram).count`` → ``groupBy(id)`` conditional
    aggregation. Two shuffles on bounded keys, map-side partials on
    both, no window, no UDF.
    """
    cnt = _tagged_grams(docs, text_col, id_col).groupBy("id", "n", "gram").agg(
        F.count("*").alias("cnt")
    )
    per = cnt.groupBy("id").agg(
        F.sum(F.when(F.col("n") == 1, F.col("cnt"))).alias("w_total"),
        F.count(F.when(F.col("n") == 1, True)).alias("w_dist"),
        F.sum(F.when(F.col("n") == 2, F.col("cnt"))).alias("b_total"),
        F.max(F.when(F.col("n") == 2, F.col("cnt"))).alias("b_top"),
        F.sum(F.when(F.col("n") == 3, F.col("cnt"))).alias("t_total"),
        F.count(F.when(F.col("n") == 3, True)).alias("t_dist"),
    )
    return per.select(
        "id",
        F.col("w_total").alias("n_words"),
        F.round((F.col("w_total") - F.col("w_dist")) / F.col("w_total"), 6).alias(
            "dup_word_frac"
        ),
        F.round(F.col("b_top") / F.col("b_total"), 6).alias("top_bigram_frac"),
        F.round((F.col("t_total") - F.col("t_dist")) / F.col("t_total"), 6).alias(
            "dup_trigram_frac"
        ),
    )


def _word_ngrams(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, gram) word n-grams via one transform lambda — no UDF."""
    nexts = ", ".join(f"element_at(ws, i + {j})" for j in range(2, n + 1))
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.split(F.lower(F.col(text_col)), " ").alias("ws"),
        )
        .filter(F.size("ws") >= n)
        .select(
            "id",
            F.explode(
                F.expr(
                    f"transform(slice(ws, 1, size(ws) - {n - 1}),"
                    f" (w, i) -> concat_ws(' ', w, {nexts}))"
                )
            ).alias("gram"),
        )
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 5,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level boilerplate: word n-grams appearing in ≥ ``min_docs``
    DISTINCT documents, top-``k`` by document frequency.

    (gram, doc_freq, occurrences), ordered doc_freq DESC,
    occurrences DESC, gram ASC (fully deterministic at the k-boundary).

    Plan: explode → one hash aggregation per gram (count-distinct
    expands to a two-level agg with map-side partials) → global top-k
    (TakeOrderedAndProject: per-partition heads, no full sort).
    """
    g = _word_ngrams(docs, n, text_col, id_col)
    agg = g.groupBy("gram").agg(
        F.countDistinct("id").alias("doc_freq"),
        F.count("*").alias("occurrences"),
    )
    return (
        agg.filter(F.col("doc_freq") >= min_docs)
        .orderBy(F.desc("doc_freq"), F.desc("occurrences"), F.asc("gram"))
        .limit(k)
    )


def boilerplate_share(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document boilerplate exposure: of the doc's n-gram
    occurrences, what fraction are corpus-boilerplate n-grams (n-grams
    in ≥ ``min_docs`` distinct docs)? The doc-level filter signal:
    curation drops/strips docs whose ``bp_frac`` exceeds a threshold.

    (id, n_grams, bp_grams, bp_frac).

    Plan: the exploded gram stream is persisted once (tracked; callers
    release via ``release_caches()``) and feeds BOTH the global
    doc-frequency aggregate and the join back — without the cache the
    tokenization runs twice. The boilerplate table is filtered before
    the join and broadcast (head-of-distribution sized).
    """
    g = tracked_persist(_word_ngrams(docs, n, text_col, id_col))
    bp = (
        g.groupBy("gram")
        .agg(F.countDistinct("id").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
        .select("gram", F.lit(1).alias("is_bp"))
    )
    return (
        g.join(F.broadcast(bp), "gram", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("is_bp"), F.lit(0)).alias("bp_grams"),
        )
        .select(
            "id",
            "n_grams",
            "bp_grams",
            F.round(F.col("bp_grams") / F.col("n_grams"), 6).alias("bp_frac"),
        )
    )
