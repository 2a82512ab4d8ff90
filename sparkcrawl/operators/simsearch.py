"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; LSH-bucketed (random-
hyperplane signs) is the scale path — bucket join instead of cross
join, so candidate generation is shuffle-bound, not O(N·Q).

All arithmetic is JVM-side (zip_with / aggregate fold) — no Python.
Dot products fold left-to-right, matching DuckDB's list functions, so
oracle value-hashes agree bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    # cast elements to double BEFORE multiplying: float32*float32 rounds
    # differently than double math and breaks oracle bit-parity
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(norm_sq(a))


def cosine(a: Column, b: Column) -> Column:
    # sqrt of the product (not product of sqrts): bit-matches the usual
    # cosine implementation (incl. DuckDB list_cosine_similarity)
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: cross join + rank-limit window.

    The cross join broadcasts the (small) query side; ranking rounds to
    6 decimals with id tie-break for deterministic, engine-portable
    ordering. At scale this is the verifier for the LSH path below.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", "rank")
    )


def hyperplane_bucket(vec: Column, n_planes: int = 4) -> Column:
    """LSH bucket id: sign bits of the first n_planes dimensions.

    A deterministic, engine-portable stand-in for random hyperplanes
    (axis-aligned planes ARE hyperplanes; with seeded projections the
    formula is the same — kept axis-aligned so DuckDB reproduces it).
    """
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit(2**i)).otherwise(F.lit(0))
        for i in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Candidate generation is an equi-join on bucket — at 10^9 vectors
    this shuffles by bucket instead of replicating every query against
    every vector. Recall is tunable via n_planes (fewer planes = bigger
    buckets = higher recall).
    """
    emb_b = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    q_b = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    scored = (
        emb_b.join(F.broadcast(q_b), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", "rank")
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (argmax).

    ``centroids`` is a small (centroid_id, vector) table — broadcast;
    assignment is a broadcast cross join + rank-1 window, so the only
    shuffle is the final window over |vectors| x |centroids| scored rows
    (bounded: K is config-small). Deterministic: ties break on
    centroid_id. For the sandbox, centroids are taken from the data
    (see :func:`ivf_topk`); on a real cluster they come from a k-means
    fit — the assignment/search operators are unchanged.
    """
    c = centroids.select(
        F.col("centroid_id"), F.col("c_vec")
    )
    scored = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).crossJoin(F.broadcast(c)).withColumn(
        "sim", F.round(cosine(F.col("vec"), F.col("c_vec")), 6)
    )
    w = W.partitionBy("id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("id", "vec", "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: search only the query's cell (nprobe=1).

    Sandbox-deterministic centroid choice: the ``n_cells`` vectors with
    the lowest ids act as centroids (reproducible in the SQL oracle; a
    k-means fit drops in without changing this operator). Candidate
    generation is an equi-join on centroid_id — the same
    shuffle-locality as the LSH variant, but with data-adaptive cells.
    """
    centroids = (
        embeddings.orderBy(F.asc(id_col))
        .limit(n_cells)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec")
        )
    )
    emb_cells = ivf_assign(embeddings, centroids, id_col, vec_col)
    q_cells = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("q_vec"),
        "centroid_id",
    )
    scored = (
        emb_cells.withColumnRenamed("id", "cand_id").withColumnRenamed("vec", "c_vec2")
        .join(F.broadcast(q_cells), "centroid_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("c_vec2")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucket self-join."""
    emb_b = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    return (
        emb_b.alias("a")
        .join(emb_b.alias("b"), "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("sim", F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6))
        .filter(F.col("sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "sim")
    )
