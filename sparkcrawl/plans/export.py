"""Curated-corpus export — the pipeline's terminal sink.

Materializes the curation pipeline's output (language-ID'd,
quality-gated, deduped, split-assigned documents) as a
``partitionBy(split, pred_lang)`` parquet layout: the directory
structure IS the training-data contract — a trainer lists
``out/split=train/pred_lang=en/`` and reads only the files it needs
(partition pruning on both axes, no scan of val/test).

Scale notes: partition columns are low-cardinality by construction
(3 splits x a handful of languages), so the write fans out without
small-file explosion; ``maxRecordsPerFile`` caps shard size so a
1000-executor read gets uniform work units. Everything upstream is
the oracled corpus_curation_pipeline composition — this job only adds
the text payload back and the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curated_corpus(spark: SparkSession, docs: DataFrame,
                   min_quality: float = 0.3) -> DataFrame:
    """(doc_id, text, pred_lang, quality, split) — the curation
    composition with the payload column retained for export."""
    from sparkcrawl.operators import sampling, textops

    base = docs.select("doc_id", "text")
    lang = textops.language_id(base).select(
        F.col("id").alias("doc_id"), "pred_lang"
    )
    qual = textops.quality_score(base).select(
        F.col("id").alias("doc_id"), "quality"
    )
    kept = (
        base.join(lang, "doc_id")
        .join(qual, "doc_id")
        .filter(
            (F.col("pred_lang") != "unknown")
            & (F.col("quality") >= min_quality)
        )
    )
    unique = textops.exact_dedup(kept)
    return sampling.hash_split(
        unique, {"train": 0.8, "val": 0.1, "test": 0.1}
    )


def export_curated(
    labeled: DataFrame,
    out_dir: str,
    max_records_per_file: int = 500_000,
) -> dict[str, int]:
    """Low-level sink: write an already-curated DataFrame (must carry a
    ``split`` column; ``pred_lang`` joins the partition layout when
    present) and return the per-split row-count manifest.

    One persist covers both the write and the manifest count so the
    curation plan upstream runs once, and it is released before return
    (no leaked cache blocks in long-lived drivers)."""
    part_cols = ["split"] + (["pred_lang"] if "pred_lang" in labeled.columns else [])
    labeled = labeled.persist()
    try:
        (
            labeled.write.mode("overwrite")
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy(*part_cols)
            .parquet(out_dir)
        )
        return {
            r["split"]: r["n"]
            for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
    finally:
        labeled.unpersist()


def export_curated_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    min_quality: float = 0.3,
    max_records_per_file: int = 500_000,
) -> dict[str, int]:
    """Write the curated corpus partitioned by (split, pred_lang).
    Returns per-split row counts (the export manifest a trainer
    sanity-checks against)."""
    curated = curated_corpus(spark, docs, min_quality=min_quality)
    return export_curated(curated, out_dir, max_records_per_file=max_records_per_file)
