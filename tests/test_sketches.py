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
