"""Mergeable cardinality sketches — the at-scale form of the crawl's
distinct-URL metrics (A4).

Exact ``countDistinct`` over a 10^10-row frontier re-scans everything
each time a statistic is wanted. The production shape is a MERGEABLE
sketch: each superstep aggregates its batch into a per-group
HyperLogLog sketch (Apache DataSketches HLL via Spark's built-in
``hll_sketch_agg`` — JVM-side, no UDF), the small binary sketches are
stored with the superstep's stats, and any later question ("distinct
URLs per host this week", "cumulative frontier size") is answered by
UNIONING stored sketches — no rescan, error ~1.6% at lgK=12, sketch
size KB-scale regardless of input.

No DuckDB oracle: the sketch binary is engine-specific and the
estimate is approximate — the pytest pins the invariants instead
(estimate within tolerance of exact; union-of-parts agrees with
sketch-of-whole within the error bound and never double-counts the
parts' overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # 4096 buckets, ~1.6% relative standard error


def sketch_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Per-group HLL sketch of distinct ``value_col`` values.

    Output: group_cols + (sketch: binary, estimate: bigint). One hash
    aggregation, map-side combined; the sketch column is what gets
    STORED (per superstep / per partition) for later merging.
    """
    keys = [F.col(c) for c in (group_cols or [])]
    out = df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    )
    return out.withColumn(
        "estimate", F.hll_sketch_estimate(F.col("sketch")).cast("bigint")
    )


def merge_sketches(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union stored sketches (e.g. one per superstep) into per-group
    totals WITHOUT rescanning source data. The union never double-counts
    the overlap between parts; estimates agree with a
    sketch-of-the-whole within the configured error bound."""
    keys = [F.col(c) for c in (group_cols or [])]
    out = sketches.groupBy(*keys).agg(
        F.hll_union_agg(F.col(sketch_col)).alias("sketch")
    )
    return out.withColumn(
        "estimate", F.hll_sketch_estimate(F.col("sketch")).cast("bigint")
    )
