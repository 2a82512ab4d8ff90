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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkcrawl.operators._caching import tracked_persist

__all__ = [
    "repetition_metrics",
    "boilerplate_ngrams",
    "boilerplate_share",
    "gopher_quality_rules",
    "compression_ratio",
]


def compression_ratio(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """(id, n_bytes, n_compressed, ratio): deflate compression ratio of
    the UTF-8 text — the cheapest whole-document repetition detector.

    N-gram repetition rules (:func:`repetition_metrics`) see fixed-width
    patterns; a compressor sees ALL of them at once, which is why
    compression ratio is a standard corpus-quality signal (used by
    Dolma's and RedPajama-v2's quality taggers as the ``*_compression``
    feature). ratio = compressed_bytes / raw_bytes: pathological
    keyword-stuffed or templated docs land far below normal prose
    (~0.3–0.6 for English web text); near-random content exceeds 1.

    This is deliberately the Python slow lane done right: zlib is not
    expressible in SQL, so the kernel is ONE Arrow-batched pandas UDF
    (vectorized transfer, one Python roundtrip per batch, never
    per-row), computing both byte counts in a single pass. Everything
    around it — the ratio arithmetic, rounding, any thresholding —
    stays JVM-side codegen. Deterministic for a fixed zlib level, so
    goldens are stable; cross-engine SQL parity is impossible by
    nature (binary kernel), which is why this op ships rows-only.
    """
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _deflate_size(s: pd.Series) -> pd.Series:
        import zlib

        return s.fillna("").str.encode("utf-8").map(
            lambda b: len(zlib.compress(b, level))).astype("int64")

    sized = docs.select(
        F.col(id_col).alias("id"),
        # raw byte length stays JVM-side; only deflate crosses to Python
        F.octet_length(F.coalesce(F.col(text_col), F.lit("")))
        .cast("long").alias("n_bytes"),
        _deflate_size(F.col(text_col)).alias("n_compressed"),
    )
    return sized.withColumn(
        "ratio",
        F.round(F.col("n_compressed")
                / F.greatest(F.col("n_bytes"), F.lit(1)), 6),
    )


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


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher quality-rule verdicts (Rae et al. 2021, table A1 — the
    public rule set): per document, every rule's measured statistic AND
    its boolean verdict, plus the overall ``keep`` conjunction. Pipelines
    keep the per-rule booleans (not just the verdict) so filter ablations
    are a column select, not a recompute.

    Rules (defaults are the paper's):
      - word count in [min_words, max_words]
      - mean word length in [3, 10]
      - symbol-to-word ratio (# or ellipsis) <= 0.1
      - <= 90% of lines start with a bullet; <= 30% end with an ellipsis
      - >= 80% of words contain an alphabetic character
      - >= 2 of the 8 Gopher stop words present

    Shape at scale: a PURE per-row projection — words/lines arrays via
    split, statistics via higher-order filter/aggregate lambdas, all
    whole-stage codegen; no explode, no shuffle, no UDF. Fractions are
    round(…, 6) for cross-engine oracle parity (repo convention).
    """
    text = F.col(text_col)
    words = F.filter(F.split(text, " "), lambda w: w != "")
    lines = F.split(text, "\n")
    n_words = F.size(words)
    n_lines = F.size(lines)
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.round(total_word_chars / F.greatest(n_words, F.lit(1)), 6)
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = F.round(
        (n_hash + n_ellipsis) / F.greatest(n_words, F.lit(1)), 6
    )
    bullet_frac = F.round(
        F.size(
            F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
        ) / F.greatest(n_lines, F.lit(1)),
        6,
    )
    ellipsis_line_frac = F.round(
        F.size(F.filter(lines, lambda l: l.endswith("...")))
        / F.greatest(n_lines, F.lit(1)),
        6,
    )
    alpha_word_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        / F.greatest(n_words, F.lit(1)),
        6,
    )
    stop_hits = sum(
        [
            F.array_contains(words, sw).cast("int")
            for sw in GOPHER_STOPWORDS
        ],
        F.lit(0),
    )
    out = docs.select(
        F.col(id_col).alias("id"),
        n_words.cast("bigint").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_line_frac.alias("ellipsis_line_frac"),
        alpha_word_frac.alias("alpha_word_frac"),
        stop_hits.cast("int").alias("stopword_hits"),
    )
    r_words = F.col("n_words").between(min_words, max_words)
    r_mwl = F.col("mean_word_len").between(3.0, 10.0)
    r_sym = F.col("symbol_ratio") <= 0.1
    r_bullet = F.col("bullet_line_frac") <= 0.9
    r_ellipsis = F.col("ellipsis_line_frac") <= 0.3
    r_alpha = F.col("alpha_word_frac") >= 0.8
    r_stop = F.col("stopword_hits") >= 2
    return out.select(
        "*",
        r_words.alias("rule_word_count"),
        r_mwl.alias("rule_mean_word_len"),
        r_sym.alias("rule_symbol_ratio"),
        r_bullet.alias("rule_bullet_lines"),
        r_ellipsis.alias("rule_ellipsis_lines"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_mwl & r_sym & r_bullet & r_ellipsis & r_alpha & r_stop).alias("keep"),
    )


C4_BAD_PHRASES = ("lorem ipsum", "terms of use", "privacy policy",
                  "cookie policy", "uses cookies")


def c4_quality_filters(
    docs: DataFrame,
    min_sentences: int = 3,
    min_words_per_line: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4 cleaning-heuristic verdicts (Raffel et al. 2020 §2.2 — the
    public rule set): per document, the measured statistic AND the
    boolean verdict for each rule, plus the overall ``keep``
    conjunction. Like :func:`gopher_quality_rules`, verdicts are kept
    per-rule so filter ablations are a column select.

    Rules:
      - >= ``min_sentences`` sentences (terminal-punctuation count)
      - no curly brace (code markers)
      - no placeholder/boilerplate phrase (lorem ipsum, policy pages)
      - no line containing the word "javascript"
      - fraction of lines that END in terminal punctuation (C4 drops
        lines that don't; the doc-level fraction is the signal) and
        fraction with >= ``min_words_per_line`` words

    Shape at scale: pure per-row projection — split + higher-order
    filters, all whole-stage codegen; no explode, no shuffle, no UDF.
    """
    text = F.col(text_col)
    low = F.lower(text)
    lines = F.split(text, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    def _cnt(ch: str):
        return F.length(text) - F.length(F.replace(text, F.lit(ch), F.lit("")))

    n_sentences = _cnt(".") + _cnt("!") + _cnt("?")
    term_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"[.!?\"']\s*$"))) / n_lines, 6
    )
    longline_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda l: F.size(F.filter(F.split(l, " "), lambda w: w != ""))
                >= min_words_per_line,
            )
        )
        / n_lines,
        6,
    )
    has_phrase = F.lit(False)
    for p in C4_BAD_PHRASES:
        has_phrase = has_phrase | low.contains(p)
    out = docs.select(
        F.col(id_col).alias("id"),
        n_sentences.cast("int").alias("n_sentences"),
        term_frac.alias("terminal_punct_line_frac"),
        longline_frac.alias("long_line_frac"),
        low.contains("{").alias("has_curly_brace"),
        has_phrase.alias("has_bad_phrase"),
        low.rlike(r"\bjavascript\b").alias("has_javascript"),
    )
    keep = (
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_curly_brace")
        & ~F.col("has_bad_phrase")
        & ~F.col("has_javascript")
    )
    return out.select("*", keep.alias("keep"))
