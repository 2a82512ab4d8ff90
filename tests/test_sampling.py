"""Deterministic hash split / stratified sample (operators/sampling.py)."""

from pyspark.sql import functions as F

from sparkcrawl.operators import sampling


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )


def test_hash_split_partitions_and_proportions(spark):
    docs = _docs(spark)
    out = sampling.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"]
              for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000  # exhaustive, disjoint by construction
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.06 < counts["val"] / 2000 < 0.14
    # determinism: identical assignment on recompute and under repartition
    again = sampling.hash_split(docs.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.select("doc_id", "split").exceptAll(
        again.select("doc_id", "split")).count() == 0


def test_hash_split_salt_changes_assignment(spark):
    docs = _docs(spark, 500)
    a = sampling.hash_split(docs, salt="s1").select("doc_id", "split")
    b = sampling.hash_split(docs, salt="s2").select("doc_id", "split")
    assert a.exceptAll(b).count() > 0


def test_stratified_sample_fracs_and_nesting(spark):
    docs = _docs(spark)
    small = sampling.stratified_sample(
        docs, {"en": 0.2, "de": 0.5}, strata_col="lang"
    )
    counts = {r["lang"]: r["n"]
              for r in small.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "fr" not in counts  # default_frac=0 drops unlisted strata
    n_en = docs.filter(F.col("lang") == "en").count()
    assert 0.12 < counts["en"] / n_en < 0.28
    assert 0.4 < counts["de"] / (2000 / 3) < 0.6
    # nested property: raising a frac only ADDS documents
    bigger = sampling.stratified_sample(
        docs, {"en": 0.6, "de": 0.5}, strata_col="lang"
    )
    assert small.select("doc_id").exceptAll(bigger.select("doc_id")).count() == 0


def test_sampling_plan_is_codegen_only(spark):
    docs = _docs(spark, 100)
    plan = (
        sampling.hash_split(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan       # zero shuffle
    assert "Python" not in plan, plan         # zero UDF
    splan = (
        sampling.stratified_sample(docs, {"en": 0.5}, strata_col="lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in splan, splan
