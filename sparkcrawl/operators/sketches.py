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


# --------------------------------------------------------------------------
# heavy hitters (count-min + threshold, mergeable, deterministic)
# --------------------------------------------------------------------------

def heavy_hitters(
    df: DataFrame,
    value_col: str,
    phi: float = 0.01,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """phi-heavy-hitters from the count-min grid: every item whose CMS
    estimate is >= ceil(phi * N). CMS never under-estimates, so this
    has NO false negatives — every true heavy hitter survives; the
    (bounded) false positives are exactly what a second exact pass
    over the SMALL survivor set would prune at scale. One build + one
    broadcast probe join; the grid and the N scalar are the only
    non-item state, so the operator merges across supersteps the same
    way the grid does (cell-wise add, N add).

    Output: (item, est, n_total, threshold), est >= threshold.
    """
    items = df.select(F.col(value_col).cast("string").alias("item"))
    sketch = count_min_build(items, "item", depth=depth, width=width)
    totals = items.groupBy().agg(F.count("*").alias("n_total"))
    est = count_min_estimate(
        items.distinct(), sketch, "item", depth=depth, width=width
    )
    out = est.crossJoin(F.broadcast(totals))
    thr = F.ceil(F.col("n_total") * F.lit(float(phi))).cast("bigint")
    return (
        out.withColumn("threshold", thr)
        .filter(F.col("est") >= F.col("threshold"))
        .select("item", "est", "n_total", "threshold")
    )


# --------------------------------------------------------------------------
# log-histogram quantile sketch (mergeable, integer-exact, deterministic)
# --------------------------------------------------------------------------

def log_histogram_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    sub_buckets: int = 8,
) -> DataFrame:
    """HDR-histogram-style log-linear bucketing of a positive INTEGER
    measure (latency ms, doc length, queue depth): bucket index =
    (exponent e = bit-length of v, linear sub-bucket within [2^(e-1),
    2^e)). All-integer arithmetic — no float log at the bucket edge —
    so the grid is deterministic and cross-engine, the quantile
    companion to the HLL (distinct) and CMS (frequency) sketches:
    store per-superstep (group, bucket, cnt) rows, merge by cell-wise
    addition, answer later percentile questions with NO rescan, with
    relative value error bounded by 1/sub_buckets.

    v <= 0 goes to bucket (0, 0) so the sketch is total. sub_buckets
    must be a power of two: sub-bucketing is then PURE INTEGER SHIFTS
    (sub = (v - 2^(e-1)) >> (e-1-s)), with no float division anywhere —
    the grid is bit-exact across engines by construction. Output:
    group_cols + (exp, sub, lo, hi, cnt) where [lo, hi] is the bucket's
    integer value range (hi is the value reported for quantiles).
    """
    s = int(sub_buckets).bit_length() - 1
    if (1 << s) != sub_buckets:
        raise ValueError("sub_buckets must be a power of two")
    keys = list(group_cols or [])
    # column-valued shift amounts need SQL-side shiftleft/shiftright
    # (the Python wrapper only takes literal bit counts)
    b = (
        df.select(*[F.col(c) for c in keys],
                  F.col(value_col).cast("bigint").alias("_v"))
        # bit_length(v) via length(bin(v)) — integer, exact in both engines
        .withColumn(
            "exp",
            F.expr("CASE WHEN _v <= 0 THEN 0 "
                   "ELSE CAST(length(bin(_v)) AS INT) END"),
        )
        .withColumn(
            "sub",
            F.expr(
                f"""CASE WHEN _v <= 0 THEN 0
                    WHEN exp - 1 <= {s} THEN CAST(_v - (
                      CASE WHEN exp <= 1 THEN 0
                           ELSE shiftleft(CAST(1 AS BIGINT), exp - 1) END
                    ) AS INT)
                    ELSE CAST(shiftright(
                      _v - shiftleft(CAST(1 AS BIGINT), exp - 1),
                      exp - 1 - {s}) AS INT) END"""
            ),
        )
    )
    out = b.groupBy(*[*keys, "exp", "sub"]).agg(F.count("*").alias("cnt"))
    return (
        out.withColumn(
            "_width",
            F.expr(
                f"CASE WHEN exp - 1 <= {s} THEN CAST(1 AS BIGINT) "
                f"ELSE shiftleft(CAST(1 AS BIGINT), exp - 1 - {s}) END"
            ),
        )
        .withColumn(
            "lo",
            F.expr(
                "CASE WHEN exp <= 0 THEN CAST(0 AS BIGINT) ELSE "
                "(CASE WHEN exp <= 1 THEN CAST(0 AS BIGINT) "
                " ELSE shiftleft(CAST(1 AS BIGINT), exp - 1) END)"
                " + CAST(sub AS BIGINT) * _width END"
            ),
        )
        .withColumn(
            "hi",
            F.expr("CASE WHEN exp <= 0 THEN CAST(0 AS BIGINT) "
                   "ELSE lo + _width - 1 END"),
        )
        .select(*keys, "exp", "sub", "lo", "hi", "cnt")
    )


def histogram_quantiles(
    hist: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group quantile readout from a (merged) log-histogram: the
    reported value for quantile q is the upper bound ``hi`` of the
    first bucket whose cumulative count reaches ceil(q * N) — a rank
    query, exact to within one bucket. One window pass in bucket order
    per group (the histogram is at most exp*sub rows per group — KB
    scale — so the window is over a bounded table, never over data).

    Output: group_cols + (q, value).
    """
    from pyspark.sql import Window as W

    keys = [F.col(c) for c in (group_cols or [])]
    key_names = list(group_cols or [])
    w = (
        W.partitionBy(*keys).orderBy("exp", "sub")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.select(
        *keys, "exp", "sub", "hi", "cnt",
        F.sum("cnt").over(w).alias("cum"),
    )
    totals = hist.groupBy(*keys).agg(F.sum("cnt").alias("n_total"))
    qs = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("q")
    probes = totals.select(*[F.col(c) for c in key_names], "n_total", qs)
    j = cum.join(probes, key_names) if key_names else cum.crossJoin(
        F.broadcast(probes)
    )
    hit = j.filter(
        F.col("cum") >= F.ceil(F.col("q") * F.col("n_total"))
    )
    return (
        hit.groupBy(*[F.col(c) for c in key_names], F.col("q"))
        .agg(F.min_by(F.col("hi"), F.struct("exp", "sub")).alias("value"))
    )
