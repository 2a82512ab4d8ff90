"""Mergeable HLL cardinality sketches (operators/sketches.py)."""

from pyspark.sql import functions as F

from sparkcrawl.operators.sketches import merge_sketches, sketch_distinct


def _urls(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        F.concat(F.lit("http://h/"), F.col("id").cast("string")).alias("url"),
    )


def test_estimate_close_to_exact(spark):
    df = _urls(spark, 0, 5000)
    out = sketch_distinct(df, "url").collect()
    assert len(out) == 1
    est = out[0]["estimate"]
    assert abs(est - 5000) / 5000 < 0.05  # lgK=12 -> ~1.6% rse


def test_grouped_sketches(spark):
    df = _urls(spark, 0, 700)
    out = {r["host"]: r["estimate"]
           for r in sketch_distinct(df, "url", ["host"]).collect()}
    assert set(out) == {f"h{i}" for i in range(7)}
    for est in out.values():
        assert abs(est - 100) / 100 < 0.1


def test_union_of_parts_equals_whole(spark):
    """The mergeability contract: per-superstep sketches unioned give
    the same answer (within the sketch's error bound) as one sketch
    over the concatenated input — the OVERLAP between parts is never
    double-counted. (Estimates are not byte-identical: union promotes
    the sketch's internal mode, so the two paths round differently.)"""
    part1 = sketch_distinct(_urls(spark, 0, 3000), "url", ["host"])
    part2 = sketch_distinct(_urls(spark, 2000, 5000), "url", ["host"])  # overlap
    merged = {r["host"]: r["estimate"]
              for r in merge_sketches(
                  part1.unionByName(part2), ["host"]).collect()}
    whole = {r["host"]: r["estimate"]
             for r in sketch_distinct(
                 _urls(spark, 0, 5000), "url", ["host"]).collect()}
    exact = 5000 / 7
    for h in whole:
        assert abs(merged[h] - whole[h]) / whole[h] < 0.03
        assert abs(merged[h] - exact) / exact < 0.10  # no overlap double-count


def test_plan_single_agg_no_python(spark):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sketch_distinct(_urls(spark, 0, 10), "url", ["host"]).explain("simple")
    p = buf.getvalue()
    assert p.count("Exchange") == 1, p
    assert "EvalPython" not in p


def test_count_min_never_underestimates_and_is_exact_when_sparse(spark):
    from sparkcrawl.operators.sketches import count_min_build, count_min_estimate

    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, ["v"])
    sk = count_min_build(df, "v", depth=4, width=256)
    est = {r["v"]: r["est"] for r in count_min_estimate(
        df.distinct(), sk, "v", depth=4, width=256).collect()}
    exact = {"a": 7, "b": 3, "c": 1}
    for k, n in exact.items():
        assert est[k] >= n          # CMS never underestimates
    # 3 items in a 4x256 grid: collisions need two of three md5 hashes
    # to agree per row across all 4 rows — est is exact here
    assert est == exact


def test_count_min_merges_by_cellwise_addition(spark):
    from pyspark.sql import functions as SF

    from sparkcrawl.operators.sketches import count_min_build, count_min_estimate

    half1 = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2, ["v"])
    half2 = spark.createDataFrame([("x",)] * 1 + [("z",)] * 5, ["v"])
    whole = half1.unionByName(half2)
    merged = (
        count_min_build(half1, "v").unionByName(count_min_build(half2, "v"))
        .groupBy("row", "bucket").agg(SF.sum("cnt").alias("cnt"))
    )
    direct = count_min_build(whole, "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    est = {r["v"]: r["est"] for r in count_min_estimate(
        whole.distinct(), merged, "v").collect()}
    assert est == {"x": 5, "y": 2, "z": 5}


def test_count_min_weighted_build(spark):
    from sparkcrawl.operators.sketches import count_min_build, count_min_estimate

    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 2)], ["v", "w"])
    sk = count_min_build(df, "v", weight_col="w")
    est = {r["v"]: r["est"] for r in count_min_estimate(
        df.select("v").distinct(), sk, "v").collect()}
    assert est == {"a": 15, "b": 2}


# --------------------------------------------------------------------------
# heavy hitters
# --------------------------------------------------------------------------

def test_heavy_hitters_has_no_false_negatives(spark):
    from sparkcrawl.operators.sketches import heavy_hitters

    rows = [("a",)] * 50 + [("b",)] * 30 + [(f"x{i}",) for i in range(120)]
    df = spark.createDataFrame(rows, "item string")
    got = {r.item for r in heavy_hitters(df, "item", phi=0.1).collect()}
    n = len(rows)
    import math
    true_hh = {"a", "b"}  # counts 50, 30 >= ceil(0.1 * 200) = 20
    assert true_hh <= got  # CMS never under-estimates -> no misses
    # and the threshold arithmetic matches
    [r] = [r for r in heavy_hitters(df, "item", phi=0.1).collect()
           if r.item == "a"]
    assert r.n_total == n and r.threshold == math.ceil(0.1 * n)
    assert r.est >= 50


def test_heavy_hitters_false_positives_are_bounded_by_grid(spark):
    from sparkcrawl.operators.sketches import heavy_hitters

    # wide grid + few distinct items -> no collisions -> exact survivors
    rows = [("a",)] * 40 + [(f"x{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "item string")
    got = {r.item for r in heavy_hitters(df, "item", phi=0.5,
                                         depth=4, width=1024).collect()}
    assert got == {"a"}


# --------------------------------------------------------------------------
# log histogram + quantile readout
# --------------------------------------------------------------------------

def test_log_histogram_buckets_contain_their_values(spark):
    from sparkcrawl.operators.sketches import log_histogram_build

    import pyspark.sql.functions as SF

    vals = [1, 2, 3, 5, 8, 13, 64, 77, 100, 1000, 0, -5]
    df = spark.createDataFrame([(v, "g") for v in vals], "v long, g string")
    hist = log_histogram_build(df, "v", ["g"], sub_buckets=4).collect()
    assert sum(r.cnt for r in hist) == len(vals)
    # every bucket's [lo, hi] really covers some input values, and
    # every positive input lands in exactly one bucket that covers it
    for v in vals:
        vv = max(v, 0)
        covering = [r for r in hist if r.lo <= vv <= r.hi]
        assert len(covering) == 1, (v, covering)


def test_log_histogram_merges_cellwise(spark):
    from sparkcrawl.operators.sketches import log_histogram_build

    import pyspark.sql.functions as SF

    h1 = spark.createDataFrame([(v,) for v in [1, 5, 9, 100]], "v long")
    h2 = spark.createDataFrame([(v,) for v in [5, 9, 1000]], "v long")
    whole = h1.unionByName(h2)
    merged = (
        log_histogram_build(h1, "v").unionByName(log_histogram_build(h2, "v"))
        .groupBy("exp", "sub", "lo", "hi").agg(SF.sum("cnt").alias("cnt"))
    )
    direct = log_histogram_build(whole, "v")
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_histogram_quantiles_bound_the_exact_quantile(spark):
    from sparkcrawl.operators.sketches import (
        histogram_quantiles,
        log_histogram_build,
    )

    import math

    vals = sorted([1, 2, 3, 5, 8, 13, 64, 77, 100, 1000])
    df = spark.createDataFrame([(v, "g") for v in vals], "v long, g string")
    hist = log_histogram_build(df, "v", ["g"], sub_buckets=4)
    got = {r.q: r.value
           for r in histogram_quantiles(hist, [0.5, 0.9], ["g"]).collect()}
    for q in (0.5, 0.9):
        exact = vals[math.ceil(q * len(vals)) - 1]
        # reported value is the covering bucket's upper bound: >= exact,
        # within one sub-bucket's relative width (1/4 per octave here)
        assert exact <= got[q] <= exact + max(exact // 4, 1) + 1, (q, got[q])


def test_histogram_quantiles_ungrouped(spark):
    from sparkcrawl.operators.sketches import (
        histogram_quantiles,
        log_histogram_build,
    )

    df = spark.createDataFrame([(v,) for v in range(1, 101)], "v long")
    hist = log_histogram_build(df, "v", sub_buckets=8)
    got = {r.q: r.value for r in histogram_quantiles(hist, [1.0]).collect()}
    assert got[1.0] >= 100
