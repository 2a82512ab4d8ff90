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


# --------------------------------------------------------------------------
# count-min sketch (frequencies, mergeable, deterministic)
# --------------------------------------------------------------------------

def count_min_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) of item
    frequencies — the frequency-side companion to the HLL cardinality
    sketch: per-superstep host/URL-pattern counts collapse to a
    ``depth x width`` counter grid that answers "how often did X
    appear" later WITHOUT rescanning, merges across supersteps by
    plain cell-wise addition, and always over-estimates (never
    under): estimate(x) = min over rows of cell[row, h_row(x)].

    Hashes are md5-derived and therefore DETERMINISTIC AND
    CROSS-ENGINE — unlike library CMS implementations, the DuckDB
    oracle rebuilds the identical grid cell for cell, so this sketch
    is exactly testable, not just property-testable.

    Output: (row, bucket, cnt) — only touched cells are materialized
    (an empty cell is 0 by omission); one explode + one hash agg.
    """
    w = F.col(weight_col) if weight_col else F.lit(1).cast("bigint")
    rows = df.select(
        F.col(value_col).cast("string").alias("v"), w.alias("w")
    ).select(
        "w",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"cms{j}:"), F.col("v"))),
                                1, 8,
                            ),
                            16, 10,
                        ).cast("bigint") % width
                    ).cast("int").alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("rb"),
    )
    return (
        rows.groupBy(F.col("rb.row").alias("row"),
                     F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("w").alias("cnt"))
    )


def count_min_estimate(
    items: DataFrame,
    sketch: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each item's frequency from a (merged) sketch:
    join the item's ``depth`` cells (broadcastable grid — at most
    depth*width rows by construction) and take the min; absent cells
    count 0. Output: items' columns + ``est``."""
    probes = items.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(
                                    F.lit(f"cms{j}:"),
                                    F.col(value_col).cast("string"),
                                )),
                                1, 8,
                            ),
                            16, 10,
                        ).cast("bigint") % width
                    ).cast("int").alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("rb"),
    ).select("*", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    keys = [c for c in items.columns]
    return (
        joined.groupBy(*keys)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
