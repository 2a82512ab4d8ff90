"""Curated-corpus export sink (plans/export.py)."""

import os

from pyspark.sql import functions as F

from sparkcrawl.plans.export import curated_corpus, export_curated_corpus

SF = "/root/testdata/sf0.001"


def test_export_partition_layout_and_counts(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "corpus")
    counts = export_curated_corpus(spark, docs, out)

    expected = curated_corpus(spark, docs)
    assert sum(counts.values()) == expected.count()
    # the layout IS the contract: split=/pred_lang= directories exist
    splits = {d for d in os.listdir(out) if d.startswith("split=")}
    assert splits == {f"split={s}" for s in counts}
    some_split = sorted(splits)[0]
    langs = [d for d in os.listdir(os.path.join(out, some_split))
             if d.startswith("pred_lang=")]
    assert langs

    # a trainer's partition-pruned read matches the manifest count
    back = spark.read.parquet(out)
    for split, n in counts.items():
        assert back.filter(F.col("split") == split).count() == n
    # the payload survived the roundtrip
    assert back.filter(F.length("text") > 0).count() == sum(counts.values())


def test_export_prunes_partitions_in_plan(spark, tmp_path):
    """The split filter must become partition pruning, not a full scan."""
    import contextlib
    import io

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "corpus")
    export_curated_corpus(spark, docs, out)
    df = spark.read.parquet(out).filter(
        (F.col("split") == "train") & (F.col("pred_lang") == "en")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "split" in plan.split("PartitionFilters", 1)[1][:300]
