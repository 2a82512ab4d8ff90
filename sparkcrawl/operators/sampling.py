"""Deterministic corpus splitting & sampling.

Training-data pipelines need REPRODUCIBLE splits and samples: the same
document must land in the same split on every run, on any cluster, in
any engine, regardless of partitioning — so none of this uses
``rand()`` (re-rolls per task retry) or ``sample()`` (partition-order
dependent). Everything keys off a salted md5 of the document id,
mapped to a uniform bucket in [0, 1): pure column expressions,
whole-stage codegen, zero shuffle, and bit-for-bit reproducible in
DuckDB for the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _unit_bucket(id_col: Column, salt: str) -> Column:
    """Uniform [0,1) bucket from the first 8 md5 hex chars of salt||id.

    Cross-engine: DuckDB reproduces it as
    CAST(concat('0x', substr(md5(salt || id), 1, 8)) AS BIGINT)
      % 1000000 / 1000000.0
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8),
        16, 10,
    ).cast("bigint")
    return (h % _BUCKETS) / F.lit(float(_BUCKETS))


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row a split label by cumulative weight ranges over
    the salted id hash — train/val/test that survives re-runs, retries
    and repartitioning. Weights are normalized; label order follows
    the dict order (make it deterministic in the caller)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    u = _unit_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    labels = list(weights)
    for name in labels[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(labels[-1]) if expr is None else expr.otherwise(F.lit(labels[-1]))
    )
    return docs.withColumn("split", expr)


def stratified_sample(
    docs: DataFrame,
    fractions: DataFrame | dict[str, float],
    strata_col: str,
    default_frac: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic ``frac`` of each stratum (e.g. per-language
    rebalancing of a crawl corpus). ``fractions`` is a (stratum, frac)
    mapping or DataFrame — dimension-sized by contract, broadcast
    joined; strata without an entry keep ``default_frac``. A row is
    kept iff its salted id bucket < frac, so the sample for a stratum
    is NESTED: raising frac only ever ADDS documents (stable samples
    across config changes)."""
    spark = docs.sparkSession
    if isinstance(fractions, dict):
        fractions = spark.createDataFrame(
            [(k, float(v)) for k, v in fractions.items()],
            [strata_col, "frac"],
        )
    u = _unit_bucket(F.col(id_col), salt)
    return (
        docs.join(F.broadcast(fractions), strata_col, "left")
        .withColumn("frac", F.coalesce(F.col("frac"), F.lit(default_frac)))
        .filter(u < F.col("frac"))
        .drop("frac")
    )


def domain_mixing_weights(
    docs: DataFrame,
    alpha: float = 0.7,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain sampling weights for a training mix:
    ``weight(d) ∝ tokens(d)^alpha`` (alpha < 1 up-weights small
    domains, the standard temperature-style mixing rule).

    (source, n_docs, tokens, weight) — weight rounded to 6, sums to ~1.

    Plan: one hash aggregation over the corpus (map-side combine;
    ``size(split(...))`` is codegen'd, the text is never exploded),
    then a single-partition window over the |domains|-sized AGGREGATE
    to normalize — bounded by the domain-count contract, never by the
    corpus (same rationale as the queue-stats windows, schedule.py).
    """
    from pyspark.sql.window import Window

    agg = docs.groupBy(F.col(strata_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("tokens"),
    )
    scaled = agg.withColumn("w_raw", F.pow(F.col("tokens").cast("double"), F.lit(alpha)))
    total = F.sum("w_raw").over(Window.partitionBy())
    return scaled.select(
        "source",
        "n_docs",
        "tokens",
        F.round(F.col("w_raw") / total, 6).alias("weight"),
    )
