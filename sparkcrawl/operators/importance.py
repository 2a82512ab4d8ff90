"""DSIR-style data selection: hashed n-gram importance resampling.

Public method: Xie et al., "Data Selection for Language Models via
Importance Resampling" (DSIR, arXiv:2302.03169) — estimate bag-of-
hashed-ngram distributions for a small TARGET corpus (the quality
domain you want more of) and the RAW web corpus, score every raw doc
with its log importance weight sum_b count_b * log(p_target[b] /
p_raw[b]), then sample without replacement proportionally to the
weights (Gumbel-top-k trick).

Everything is relational and JVM-side:
- features: unigrams + bigrams built with higher-order array functions
  (split / zip_with / filter — no per-row Python, no double explode),
  hashed into ``dim`` buckets with the repo's cross-engine md5 bucket.
- distributions: ONE hash agg per corpus; the bucket-ratio table is
  at most ``dim`` rows — broadcast to the per-doc scoring join. The
  vocabulary never materializes (the hashing trick's point at 10^10
  docs); the only driver-side values are the two corpus-total scalars.
- sampling: Gumbel keys derived from md5(salt||id) — deterministic,
  retry- and partition-stable, identically reproducible in the DuckDB
  oracle — and the global top-k is orderBy+limit, which Spark executes
  as TakeOrderedAndProject (per-partition heaps, no full sort).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkcrawl.functions.hashing import md5_bucket

__all__ = [
    "hashed_ngram_buckets",
    "dsir_log_weights",
    "gumbel_topk_sample",
]


def _gram_array(text_col: str):
    """Array of unigrams + space-joined bigrams, lowercased, empties
    dropped — built entirely with higher-order functions so the row
    count never blows up before the single explode in the caller."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    # zip_with pads to the LONGER side with null; concat(null) -> null,
    # filtered right back out. slice(toks, 2, size) is toks[1:].
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda g: g.isNotNull(),
    )
    return F.concat(toks, bigrams)


def hashed_ngram_buckets(
    docs: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket, cnt): per-doc hashed unigram+bigram counts.
    Sparse — the join-able shape; one explode + one hash agg with
    map-side combine, bucket keys uniform by md5 construction."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_gram_array(text_col)).alias("g"),
    )
    return (
        grams.withColumn("bucket", md5_bucket(F.col("g"), dim))
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per raw doc: (id, logw) — log importance weight under
    Laplace-smoothed hashed-ngram distributions, rounded to 6 (the
    repo's cross-engine float convention). Docs with no tokens score
    0. The two corpus-total gram counts are the only scalars collected;
    the ratio table (<= dim rows) is broadcast."""
    from sparkcrawl.operators._caching import tracked_persist

    # raw_b feeds BOTH the distribution estimate and the per-doc scoring
    # join; without the tracked persist the whole explode+agg runs twice
    raw_b = tracked_persist(hashed_ngram_buckets(raw, dim, text_col, id_col))
    tgt_b = hashed_ngram_buckets(target, dim, text_col, id_col)

    raw_counts = raw_b.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
    tgt_counts = tgt_b.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    r_total = raw_counts.agg(F.sum("rc")).first()[0] or 0
    t_total = tgt_counts.agg(F.sum("tc")).first()[0] or 0

    log_rden = math.log(r_total + dim)
    log_tden = math.log(t_total + dim)
    ratio = (
        raw_counts.join(tgt_counts, "bucket", "full_outer")
        .select(
            "bucket",
            (
                F.log(F.coalesce(F.col("tc"), F.lit(0)) + 1) - F.lit(log_tden)
                - F.log(F.coalesce(F.col("rc"), F.lit(0)) + 1) + F.lit(log_rden)
            ).alias("log_ratio"),
        )
    )
    # bucket unseen in BOTH corpora (possible when scoring docs outside
    # the estimation corpora): both Laplace numerators are 1
    default_ratio = log_rden - log_tden

    scored = (
        raw_b.join(F.broadcast(ratio), "bucket", "left")
        .groupBy("id")
        .agg(
            F.sum(
                F.col("cnt")
                * F.coalesce(F.col("log_ratio"), F.lit(default_ratio))
            ).alias("_lw")
        )
    )
    return (
        raw.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.round(F.coalesce(F.col("_lw"), F.lit(0.0)), 6).alias("logw"),
        )
    )


def gumbel_topk_sample(
    weighted: DataFrame,
    k: int,
    salt: str = "dsir",
    id_col: str = "id",
    weight_col: str = "logw",
) -> DataFrame:
    """Sample k rows WITHOUT replacement with probability proportional
    to exp(weight) — the Gumbel-top-k identity — using noise derived
    from md5(salt||id) instead of rand(), so the draw is deterministic,
    retry-stable, and bit-identical in the DuckDB oracle. The key is
    rounded to 6 with an id tie-break, making the cut cross-engine
    exact; the top-k runs as TakeOrderedAndProject (per-partition
    heaps), never a global sort."""
    hx = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("bigint")
    u = (hx.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.round(F.col(weight_col) - F.log(-F.log(u)), 6)
    return (
        weighted.withColumn("_k", key)
        .orderBy(F.col("_k").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_k")
    )
