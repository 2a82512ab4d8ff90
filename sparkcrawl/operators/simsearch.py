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

from sparkcrawl.operators._caching import tracked_persist


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


def _pair_dot(da: Column, db: Column, dim: int | None = None) -> Column:
    """Dot of two pre-cast double arrays (same left-to-right fold as
    :func:`dot`, minus the per-element casts). ``dim`` is accepted for
    signature stability but an unrolled flat term sum was MEASURED 10x
    SLOWER than this fold (64 GetArrayItems + a 190-node arithmetic
    tree overflows codegen into the interpreted path), so the fold is
    always used."""
    return F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )


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


def hyperplane_weights(
    dim: int, n_planes: int, seed: int = 0, band: int = 0
) -> list[list[float]]:
    """Seeded random-projection hyperplanes (n_planes×dim weight matrix).

    Weights are md5-derived uniform values, MEAN-CENTERED per plane and
    quantized to 4 decimals: centering makes each plane orthogonal to
    the all-ones direction, so correlated / all-positive real embedding
    dims (the r1 'first-dims sign bucket' failure mode) still split into
    balanced buckets; quantized decimal literals parse to the identical
    double in any engine, so the oracle SQL inlines them verbatim.
    """
    import hashlib

    planes = []
    for p in range(n_planes):
        raw = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{band}|{p}|{d}".encode()).digest()
            raw.append((h[0] * 256 + h[1]) / 65535.0 * 2 - 1)
        mean = sum(raw) / len(raw)
        planes.append([round(w - mean, 4) for w in raw])
    return planes


def weighted_projection(vec: Column, weights: list[float]) -> Column:
    """Dot(vec, weights) folded left-to-right in double — bit-matches the
    oracle's left-associated `w1*e[1] + w2*e[2] + ...` chain."""
    arr = F.array(*[F.lit(w) for w in weights])
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def hyperplane_bucket(
    vec: Column, n_planes: int = 4, dim: int = 64, seed: int = 0, band: int = 0
) -> Column:
    """LSH bucket id: sign bits of n_planes seeded random projections."""
    planes = hyperplane_weights(dim, n_planes, seed, band)
    out = None
    for i, weights in enumerate(planes):
        bit = F.when(weighted_projection(vec, weights) >= 0, F.lit(2**i)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def _cap_buckets(df: DataFrame, keys: list[str], max_bucket_size: int | None) -> DataFrame:
    """Drop LSH buckets larger than the cap BEFORE any self/equi join —
    an oversized bucket is a degenerate projection cell, not a
    similarity signal, and its O(n²) pair blowup is the #1 skew hazard
    of bucketed ANN at corpus scale (mirrors textops.minhash_lsh_pairs)."""
    if max_bucket_size is None:
        return df
    ok = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )
    return df.join(ok, keys)


def _banded_buckets(
    df: DataFrame, n_planes: int, dim: int, seed: int, n_bands: int,
    id_alias: str, vec_alias: str, id_col: str, vec_col: str,
) -> DataFrame:
    """(id, vec, band, bucket) — one row per band; multi-band OR-ing
    recovers the recall a single n_planes-bit bucket gives up."""
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    hyperplane_bucket(F.col(vec_col), n_planes, dim, seed, b).alias("bucket"),
                )
                for b in range(n_bands)
            ]
        )
    ).alias("_bb")
    return df.select(
        F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias), bands
    ).select(id_alias, vec_alias, F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 0,
    n_bands: int = 1,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s).

    Candidate generation is an equi-join on (band, bucket) — at 10^9
    vectors this shuffles by bucket instead of replicating every query
    against every vector. Recall tunes via n_planes (fewer = bigger
    buckets) and n_bands (more = more chances to collide); oversized
    buckets are capped (``max_bucket_size``) so one degenerate cell
    can't quadratically dominate the join.
    """
    emb_b = _banded_buckets(
        embeddings, n_planes, dim, seed, n_bands, "cand_id", "c_vec", id_col, vec_col
    )
    emb_b = _cap_buckets(emb_b, ["band", "bucket"], max_bucket_size)
    q_b = _banded_buckets(
        queries, n_planes, dim, seed, n_bands, "query_id", "q_vec", id_col, vec_col
    )
    cands = (
        emb_b.join(F.broadcast(q_b), ["band", "bucket"])
        .filter(F.col("cand_id") != F.col("query_id"))
        # a pair colliding in several bands scores once
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = cands.withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
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
    assignment is a broadcast cross join + a ``max_by`` hash aggregation
    over the |vectors| x K scored rows. An argmax needs no window: the
    agg gets map-side partial combine and never sorts a partition
    (same fix family as operators/dedup.py batch_distinct; the
    rank-limit window survives only in :func:`ivf_assign_topn`, where
    nprobe>1 genuinely needs ranking). Deterministic: the order key is
    (sim, -centroid_id), so ties break to the LOWEST centroid_id.
    For the sandbox, centroids are taken from the data (see
    :func:`ivf_topk`); on a real cluster they come from a k-means fit —
    the assignment/search operators are unchanged.
    """
    c = centroids.select(
        F.col("centroid_id"), F.col("c_vec")
    )
    scored = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).crossJoin(F.broadcast(c)).withColumn(
        "sim", F.round(cosine(F.col("vec"), F.col("c_vec")), 6)
    )
    order_key = F.struct(
        F.col("sim").alias("s"), (-F.col("centroid_id")).alias("nc")
    )
    best = scored.groupBy("id").agg(
        F.max_by(F.struct(F.col("vec"), F.col("centroid_id")), order_key).alias("_b")
    )
    return best.select(
        "id", F.col("_b.vec").alias("vec"), F.col("_b.centroid_id").alias("centroid_id")
    )


def ivf_assign_topn(
    embeddings: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``nprobe`` nearest cells per vector (query-side multi-probe:
    searching the runner-up cells recovers the recall lost to vectors
    sitting near cell boundaries). Same broadcast + rank-limit shape as
    :func:`ivf_assign`."""
    c = centroids.select(F.col("centroid_id"), F.col("c_vec"))
    scored = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).crossJoin(F.broadcast(c)).withColumn(
        "sim", F.round(cosine(F.col("vec"), F.col("c_vec")), 6)
    )
    w = W.partitionBy("id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("id", "vec", "centroid_id")
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Relational Lloyd k-means -> (centroid_id, c_vec) for IVF.

    Init = the k lowest-id vectors (deterministic, same as the oracle
    mode). Each iteration: broadcast-assign every vector to its nearest
    centroid (one shuffle-free scored pass + rank window), then average
    member vectors per (centroid, dim) — a posexplode + two hash-aggs,
    all map-side-combinable. Only the k centroid rows themselves are
    collected per iteration (config-bounded, like active_queues): that
    truncates the iterative lineage, the standard Spark pattern for
    Lloyd loops. Empty cells keep their previous centroid.
    """
    from pyspark.sql import types as T

    spark = embeddings.sparkSession
    cent_schema = T.StructType(
        [
            T.StructField("centroid_id", T.LongType(), False),
            T.StructField("c_vec", T.ArrayType(T.DoubleType()), False),
        ]
    )
    init = (
        embeddings.orderBy(F.asc(id_col))
        .limit(k)
        .select(F.col(id_col).cast("long").alias("centroid_id"), F.col(vec_col).alias("c_vec"))
        .collect()
    )
    cents = {r["centroid_id"]: [float(x) for x in r["c_vec"]] for r in init}
    for _ in range(iters):
        cdf = spark.createDataFrame(sorted(cents.items()), cent_schema)
        assigned = ivf_assign(embeddings, cdf, id_col, vec_col)
        new_rows = (
            assigned.select("centroid_id", F.posexplode("vec").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c_vec")
            )
            .collect()
        )
        for r in new_rows:
            cents[r["centroid_id"]] = [float(x) for x in r["c_vec"]]
    return spark.createDataFrame(sorted(cents.items()), cent_schema)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 1,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: search the query's ``nprobe`` nearest cells.

    ``centroids=None`` selects the sandbox-deterministic oracle mode
    (the ``n_cells`` lowest-id vectors act as centroids, reproducible in
    SQL); pass :func:`kmeans_fit` output for data-adaptive cells —
    the operator is unchanged either way. Candidate generation is an
    equi-join on centroid_id — the same shuffle-locality as the LSH
    variant, but with data-adaptive cells and a recall knob (nprobe).
    """
    if centroids is None:
        centroids = (
            embeddings.orderBy(F.asc(id_col))
            .limit(n_cells)
            .select(
                F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec")
            )
        )
    emb_cells = ivf_assign(embeddings, centroids, id_col, vec_col)
    q_cells = ivf_assign_topn(queries, centroids, nprobe, id_col, vec_col).select(
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
    dim: int = 64,
    seed: int = 0,
    n_bands: int = 1,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via (banded, capped) LSH
    bucket self-join — the 100 TB shape: no all-pairs, no uncapped
    degenerate bucket."""
    emb_b = _banded_buckets(
        embeddings, n_planes, dim, seed, n_bands, "id", "vec", id_col, vec_col
    )
    # persist: the self-join evaluates this subplan twice (no exchange
    # reuse across aliases) — without the cache every projection/bucket
    # computation runs twice
    # tracked: release via operators._caching.release_caches() (r2 ADVICE)
    emb_b = tracked_persist(_cap_buckets(emb_b, ["band", "bucket"], max_bucket_size))
    pairs = (
        emb_b.alias("a")
        .join(emb_b.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("vec_a"), F.col("b.vec").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 0,
    n_bands: int = 1,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate kNN GRAPH: for EVERY vector, its top-k nearest
    neighbors among its LSH bucket-mates — the structure diversity
    sampling, cluster seeding, and retrieval-eval harnesses consume.

    Distinct shape from :func:`lsh_bucketed_topk` (few queries,
    broadcast) and :func:`embedding_near_dup_pairs` (undirected,
    threshold): here every row is a query, so the candidate square is
    a banded+capped SELF-join shuffled on (band, bucket), and each
    node keeps its own top-k via one rank-limit window (Spark compiles
    the row_number<=k filter to WindowGroupLimit — per-partition heap,
    no full sort). Ties break to the lower neighbor id, so the graph
    is deterministic and the DuckDB oracle can replay it edge for
    edge. At 10^9 vectors nothing here is all-pairs: bucket caps bound
    the join's worst cell and k bounds the output."""
    emb_b = tracked_persist(
        _cap_buckets(
            _banded_buckets(
                embeddings, n_planes, dim, seed, n_bands, "id", "vec",
                id_col, vec_col,
            ),
            ["band", "bucket"], max_bucket_size,
        )
    )
    cands = (
        emb_b.alias("a")
        .join(emb_b.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("src"), F.col("b.id").alias("dst"),
            F.col("a.vec").alias("vec_a"), F.col("b.vec").alias("vec_b"),
        )
        .dropDuplicates(["src", "dst"])
    )
    scored = cands.withColumn(
        "sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
    )
    w = W.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "sim", "rank")
    )


def ann_recall_eval(
    exact: DataFrame,
    approx: DataFrame,
    k: int | None = None,
    query_col: str = "query_id",
    cand_col: str = "cand_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Recall@k of an approximate ANN result against the exact one —
    ONE summary row: (n_queries, sum_exact, sum_hits, micro_recall,
    mean_recall, min_recall).

    The ANN counterpart of :func:`~sparkcrawl.operators.textops.
    lsh_pr_eval`: the analytic knobs (planes, bands, caps, nprobe) say
    what recall SHOULD be; this measures what the configured index
    actually returns on the real corpus — the number that decides
    whether an approximate path can replace the exact verifier for a
    given workload. ``exact`` and ``approx`` are any two result tables
    in the (query_id, cand_id, rank) shape the ANN family emits
    (brute_force_topk / lsh_bucketed_topk / ivf_topk / pq_topk ...).

    Determinism: per-query recall is computed in integer micro-units
    (round(hits*1e6/n_exact) as a long) before averaging, so the mean
    is bit-identical under any partitioning and in the oracle — the
    same device margin_alignment_scores uses. micro_recall is the
    pooled sum_hits/sum_exact (exact long division).
    """
    e = exact if k is None else exact.filter(F.col(rank_col) <= k)
    a = approx if k is None else approx.filter(F.col(rank_col) <= k)
    e2 = e.select(F.col(query_col).alias("q"), F.col(cand_col).alias("c"))
    a2 = a.select(F.col(query_col).alias("q"), F.col(cand_col).alias("c"))
    per = e2.groupBy("q").agg(F.count("*").alias("n_exact"))
    hits = e2.join(a2, ["q", "c"]).groupBy("q").agg(
        F.count("*").alias("n_hits"))
    j = (
        per.join(hits, "q", "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
        .withColumn(
            "_ru",
            F.round(F.col("n_hits") * F.lit(1_000_000.0)
                    / F.col("n_exact")).cast("long"))
    )
    return j.agg(
        F.count("*").alias("n_queries"),
        F.sum("n_exact").cast("long").alias("sum_exact"),
        F.sum("n_hits").cast("long").alias("sum_hits"),
    ).crossJoin(
        j.agg(F.sum("_ru").alias("_sru"), F.min("_ru").alias("_mru"))
    ).select(
        "n_queries", "sum_exact", "sum_hits",
        F.round(F.col("sum_hits") / F.col("sum_exact"), 6)
        .alias("micro_recall"),
        F.round(F.col("_sru") / F.col("n_queries") / F.lit(1e6), 6)
        .alias("mean_recall"),
        F.round(F.col("_mru") / F.lit(1e6), 6).alias("min_recall"),
    )


def margin_alignment_scores(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 0,
    n_bands: int = 1,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-based alignment scoring over the approximate kNN graph
    (Artetxe & Schwenk, ACL 2019 — the CCMatrix/LASER bitext-mining
    criterion): raw cosine rewards hub vectors that are close to
    EVERYTHING, so each candidate pair is re-scored by the ratio
    margin

        margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)

    where avgNN_k is the mean similarity of a node's k nearest
    neighbors. Pairs whose similarity merely matches their
    neighborhoods' background level score ~1; true translations /
    aligned items stand out above it.

    Relational shape: ONE :func:`knn_graph` pass (banded + capped
    self-join, rank-limit heap) provides both the candidate edges and
    the neighborhood statistics; the per-node penalty is a hash agg
    over it, joined back twice on the node id. Nothing all-pairs.

    Cross-engine determinism: neighborhood sims are averaged in exact
    integer micro-units (sum of round(sim*1e6) longs / count), so the
    penalty — and therefore the margin — is bit-identical in any
    partitioning and in the DuckDB oracle; float summation order never
    enters. Near-zero denominators (|avg| <= 1e-9) are filtered, the
    guard both engines apply to the same exact value.

    Output: (id_a, id_b, sim, margin) — one row per directed kNN edge.
    """
    g = knn_graph(
        embeddings, k=k, n_planes=n_planes, dim=dim, seed=seed,
        n_bands=n_bands, max_bucket_size=max_bucket_size,
        id_col=id_col, vec_col=vec_col,
    )
    g = tracked_persist(g.select(
        "src", "dst", "sim",
        F.round(F.col("sim") * 1e6).cast("long").alias("_sim_u")))
    pen = g.groupBy(F.col("src").alias("id")).agg(
        F.sum("_sim_u").alias("s"), F.count("*").alias("c"))
    pa = pen.select(F.col("id").alias("src"), F.col("s").alias("_sa"),
                    F.col("c").alias("_ca"))
    pb = pen.select(F.col("id").alias("dst"), F.col("s").alias("_sb"),
                    F.col("c").alias("_cb"))
    denom = ((F.col("_sa") / F.col("_ca") + F.col("_sb") / F.col("_cb"))
             / F.lit(2000000.0))
    return (
        g.join(pa, "src").join(pb, "dst")
        # |denom|, not denom: a negative-neighborhood node (possible
        # with cosine) is a legitimate denominator, only NEAR-ZERO
        # averages are numerically unsafe — matching the docstring and
        # the oracle (r4 ADVICE)
        .filter(F.abs(denom) > 1e-9)
        .select(
            F.col("src").alias("id_a"), F.col("dst").alias("id_b"),
            "sim", F.round(F.col("sim") / denom, 6).alias("margin"))
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 8,
    centroids: DataFrame | None = None,
    max_cluster_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540 — public method): cluster the embedding space,
    then inside each cluster drop every item whose cosine similarity to
    a LOWER-id member of the same cluster reaches ``threshold``; the
    lowest-id member of each near-duplicate neighborhood survives.

    Returns one row per input vector:
      (id, centroid_id, keep, dup_of, sim)
    ``keep`` rows carry NULL ``dup_of``/``sim``; dropped rows point at
    the lower-id member they matched best (ties -> lowest id).

    Shape at scale: clustering makes the quadratic step LOCAL — the
    pairwise cosine self-join is an equi-join on ``centroid_id`` (one
    shuffle on a small key), never an all-pairs cross product, and real
    deployments size K so clusters are a few thousand items
    (``max_cluster_size`` is the deterministic belt-and-braces cap,
    same knob as the LSH buckets). The duplicate argmax is a ``max_by``
    hash aggregation (map-side combine, no window sort). The assignment
    reuses :func:`ivf_assign` (broadcast centroids + max_by).
    ``centroids=None`` is the sandbox-deterministic oracle mode (the
    ``n_cells`` lowest-id vectors, reproducible in SQL); pass
    :func:`kmeans_fit` output for data-adaptive cells.
    """
    centroids_pinned = centroids is None
    if centroids is None:
        centroids = (
            embeddings.orderBy(F.asc(id_col))
            .limit(n_cells)
            .select(
                F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec")
            )
        )
    # persist: referenced by BOTH sides of the intra-cluster self-join
    # and by the final left join — three subplan evaluations otherwise.
    assigned = tracked_persist(ivf_assign(embeddings, centroids, id_col, vec_col))
    # the cap bounds the PAIR SEARCH only: rows of an over-sized cluster
    # skip near-dup detection (kept as-is), they are never dropped from
    # the verdict table — every input id gets exactly one output row
    joinable = _cap_buckets(assigned, ["centroid_id"], max_cluster_size)
    # Per-pair cosine used to re-fold BOTH norms inside the join (three
    # 64-element aggregate folds per pair). Fold each vector's squared
    # norm ONCE in the projection and divide by sqrt(nsq_a*nsq_b) in
    # the pair — the identical expression tree below the sqrt, so the
    # rounded value is bit-equal (guide §1.2: per-task work, after the
    # join shape is right).
    # pre-cast to double once per side row: the per-pair fold then
    # multiplies doubles directly instead of casting both elements per
    # pair (cast-then-multiply == multiply-of-precast, bit-equal)
    side = joinable.select(
        "centroid_id", "id", "vec",
        F.transform(F.col("vec"), lambda x: x.cast("double")).alias("_dv"),
        norm_sq(F.col("vec")).alias("_nsq"))
    # The self-join key is centroid_id — at the sandbox's pinned-K this
    # is a handful of distinct keys, so the quadratic pair work lands on
    # K tasks no matter how wide the session is (guide §2.5: synthetic
    # keys with too few distinct values). Salt the pair space: side A
    # keeps one deterministic salt (id mod S), side B replicates S ways,
    # so each ordered pair still meets exactly once while the shuffle
    # spreads over K*S partitions. Only the known-small pinned-centroid
    # mode salts; a real kmeans centroid table has cells >> cores.
    n_salt = 1
    if centroids_pinned:
        par = embeddings.sparkSession.sparkContext.defaultParallelism
        n_salt = max(1, par // max(1, n_cells))
    if n_salt > 1:
        a_side = side.withColumn("_salt", F.pmod(F.col("id"), F.lit(n_salt)))
        b_side = side.withColumn(
            "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salt)])))
        join_keys = ["centroid_id", "_salt"]
    else:
        a_side = b_side = side
        join_keys = ["centroid_id"]
    pairs = (
        a_side.alias("a")
        .join(b_side.alias("b"), join_keys)
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn(
            "sim",
            F.round(
                _pair_dot(F.col("a._dv"), F.col("b._dv"), dim)
                / F.sqrt(F.col("a._nsq") * F.col("b._nsq")), 6))
        .filter(F.col("sim") >= threshold)
    )
    # per victim: best (highest-sim, then lowest-id) lower-id neighbor
    dup_key = F.struct(F.col("sim").alias("s"), (-F.col("a.id")).alias("ni"))
    dups = pairs.groupBy(F.col("b.id").alias("id")).agg(
        F.max_by(
            F.struct(F.col("a.id").alias("dup_of"), F.col("sim").alias("sim")),
            dup_key,
        ).alias("_d")
    )
    return (
        assigned.join(dups, "id", "left")
        .select(
            "id",
            "centroid_id",
            F.col("_d").isNull().alias("keep"),
            F.col("_d.dup_of").alias("dup_of"),
            F.col("_d.sim").alias("sim"),
        )
    )


def semantic_dedup_canonical(
    embeddings: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 0,
    n_bands: int = 1,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The embedding-side corpus dedup policy, end to end — the exact
    mirror of :func:`sparkcrawl.operators.textops.dedup_corpus_canonical`
    for the semantic path:

        banded-LSH cosine near-dup pairs -> connected components ->
        keep the MIN vec id per cluster.

    Returns the SURVIVING rows of ``embeddings``. The component step is
    what makes this a POLICY rather than a pair list: embedding
    near-duplication is transitive in practice (A~B, B~C but A!~C at
    the threshold), so pair-level dropping either over-deletes or
    leaves dups. Every stage keeps the 100 TB shape: the pair search is
    banded + capped (never all-pairs), components are one shuffle per
    round over the PAIRS (a tiny fraction of the corpus), and the final
    keep is a left-anti join on the id.
    """
    from sparkcrawl.operators.textops import connected_components

    pairs = embedding_near_dup_pairs(
        embeddings, threshold=threshold, n_planes=n_planes, dim=dim,
        seed=seed, n_bands=n_bands, max_bucket_size=max_bucket_size,
        id_col=id_col, vec_col=vec_col,
    )
    comp = connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return embeddings.join(losers, id_col, "left_anti")


def dbscan_lsh(
    embeddings: DataFrame,
    threshold: float = 0.3,
    min_pts: int = 3,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 0,
    n_bands: int = 1,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. 1996 — public
    method) over an embedding corpus, with the eps-neighborhood graph
    built by the banded-LSH pair search instead of an all-pairs
    distance scan. The use case beyond dedup: near-dup CLUSTERS keep
    everything connected at the threshold; DBSCAN additionally
    separates dense regions (template families, spam campaigns, topic
    clumps worth downsampling) from sparse noise — the corpus-shaping
    signal curation pipelines act on.

    Deterministic semantics (classic DBSCAN is scan-order-dependent at
    borders; this form is order-free so the oracle can pin it):

    - ``neighbors(p)`` = ids with cosine >= ``threshold`` discovered by
      the banded bucket join (same recall contract and oracle-mirrored
      buckets as :func:`embedding_near_dup_pairs`).
    - core: ``|neighbors(p)| + 1 >= min_pts`` (the point itself counts).
    - clusters: connected components over CORE-CORE edges; label = min
      core id in the component. A core point with no core neighbor is
      its own singleton cluster.
    - border: non-core with >=1 core neighbor -> the MINIMUM cluster
      label among its core neighbors (deterministic tie-break).
    - noise: everything else -> cluster -1 (the scikit-learn
      convention).

    Returns one row per input vector: (id, role, cluster) with role in
    {'core','border','noise'}.

    Shape at scale: the pair search is banded + capped (never
    all-pairs); degrees are ONE map-side-combinable count shuffle over
    the pair list; components run over core-core edges only (a subset
    of the pairs, not the corpus); border assignment is one equi-join +
    min-agg; the final role stitch is two left joins on the corpus id.
    The only collects are connected_components' scalar convergence
    probes.
    """
    from sparkcrawl.operators.textops import connected_components

    pairs = embedding_near_dup_pairs(
        embeddings, threshold=threshold, n_planes=n_planes, dim=dim,
        seed=seed, n_bands=n_bands, max_bucket_size=max_bucket_size,
        id_col=id_col, vec_col=vec_col,
    ).select("id_a", "id_b")
    sym = tracked_persist(
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .unionByName(
            pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
        )
    )
    core = tracked_persist(
        sym.groupBy("a")
        .agg(F.count("*").alias("n_nbrs"))
        .filter(F.col("n_nbrs") + 1 >= min_pts)
        .select(F.col("a").alias("id"))
    )
    core_edges = pairs.join(
        core.select(F.col("id").alias("id_a")), "id_a", "semi"
    ).join(core.select(F.col("id").alias("id_b")), "id_b", "semi")
    comp = connected_components(core_edges)
    singleton_cores = core.join(comp, "id", "anti").withColumn(
        "comp", F.col("id")
    )
    core_clusters = comp.unionByName(singleton_cores).withColumnRenamed(
        "comp", "cluster"
    )
    border = (
        sym.join(core.select(F.col("id").alias("a")), "a", "anti")
        .join(
            core_clusters.select(
                F.col("id").alias("b"), F.col("cluster").alias("_bc")
            ),
            "b",
        )
        .groupBy(F.col("a").alias("id"))
        .agg(F.min("_bc").alias("cluster"))
    )
    out = (
        embeddings.select(F.col(id_col).alias("id"))
        .join(core_clusters.withColumnRenamed("cluster", "_cc"), "id", "left")
        .join(border.withColumnRenamed("cluster", "_bcl"), "id", "left")
        .select(
            "id",
            F.when(F.col("_cc").isNotNull(), F.lit("core"))
            .when(F.col("_bcl").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("_cc", "_bcl", F.lit(-1)).alias("cluster"),
        )
    )
    return out


def cluster_downsample(
    assignments: DataFrame,
    cap: int = 3,
    salt: str = "ds",
    id_col: str = "id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """The actionable policy on top of :func:`dbscan_lsh` — what
    curation pipelines DO with density clusters (the data-mixing
    counterpart of canonical-keep dedup): dense template families and
    spam campaigns get capped at ``cap`` members, sparse/noise rows
    are kept untouched. Deduplication removes equivalents; this
    removes REDUNDANCY — a thousand near-identical boilerplate pages
    add nothing past the first few.

    Selection inside a cluster is by md5(salt || id) ascending (id
    tie-break): a deterministic, retry- and partition-stable draw
    that is UNBIASED w.r.t. crawl/id order — min-id keeps would
    systematically favor early-crawled pages (same rationale as
    sampling.py's salted-hash splits).

    Shape at scale: one rank window PARTITIONED BY cluster — Spark's
    WindowGroupLimit pushes the rank<=cap cut below the sort, so no
    cluster's full membership is ever ranked past the cap; noise rows
    bypass the window entirely via a cheap codegen filter + union.
    """
    clustered = assignments.filter(F.col(cluster_col) >= 0)
    noise = assignments.filter(F.col(cluster_col) < 0)
    from pyspark.sql import Window as W

    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = W.partitionBy(cluster_col).orderBy(key.asc(), F.col(id_col).asc())
    kept = (
        clustered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return kept.unionByName(noise)


def triplet_mining(
    embeddings: DataFrame,
    pos_rank: int = 1,
    neg_rank: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 0,
    n_bands: int = 1,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive training triplets (anchor, positive, hard negative)
    mined from the approximate kNN graph: the positive is the anchor's
    rank-``pos_rank`` neighbor, the hard negative its rank-``neg_rank``
    neighbor — the classic semi-hard band (Schroff et al., FaceNet
    CVPR 2015: negatives close enough to inform the gradient, far
    enough to be wrong). Embedding-model fine-tuning on crawl corpora
    consumes exactly this table.

    Output: (anchor, positive, pos_sim, negative, neg_sim, margin) with
    margin = pos_sim - neg_sim >= 0 by construction (ranks come from
    one ordering). Anchors whose bucket yields fewer than ``neg_rank``
    neighbors drop out (inner join) — no padded/degenerate triplets.

    Plan shape: ONE knn_graph build (banded+capped LSH self-join, the
    only corpus-square stage, already skew-bounded), then two
    rank-filtered legs of that SAME graph equi-joined on the anchor id
    — co-partitioned by the window that ranked them, so the join adds
    no exchange. Output is one row per anchor: linear in corpus size.
    """
    if not 0 < pos_rank < neg_rank:
        raise ValueError("need 0 < pos_rank < neg_rank")
    g = knn_graph(
        embeddings, k=neg_rank, n_planes=n_planes, dim=dim, seed=seed,
        n_bands=n_bands, max_bucket_size=max_bucket_size,
        id_col=id_col, vec_col=vec_col,
    )
    pos = g.filter(F.col("rank") == pos_rank).select(
        F.col("src").alias("anchor"),
        F.col("dst").alias("positive"),
        F.col("sim").alias("pos_sim"),
    )
    neg = g.filter(F.col("rank") == neg_rank).select(
        F.col("src").alias("anchor"),
        F.col("dst").alias("negative"),
        F.col("sim").alias("neg_sim"),
    )
    return pos.join(neg, "anchor").select(
        "anchor", "positive", "pos_sim", "negative", "neg_sim",
        F.round(F.col("pos_sim") - F.col("neg_sim"), 6).alias("margin"),
    )


def embedding_health(
    embeddings: DataFrame,
    dead_var_eps: float = 1e-12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-table QA before any ANN index is built over it: ONE
    summary row (n_vectors, dim, mean_norm, min_norm, n_zero_norm,
    n_dead_dims, max_abs). Zero-norm vectors poison cosine math (the
    quantize and LSH paths both special-case scale=0 — this counts how
    often), and "dead" dimensions (variance <= eps across the corpus)
    mean the producing model collapsed or the ingest truncated columns
    — an IVF/PQ index trained on them wastes codebook capacity.

    Plan shape: one posexplode to (dim, value) feeding two
    map-combinable aggs — per-dim moments (dim-cardinality output,
    e.g. 64 rows) and per-vector norms reduced by a second 1-row agg;
    the two 1-row legs meet in a crossJoin. No UDF, no window.
    """
    vals = embeddings.select(
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("d", "v"))
    dims = vals.groupBy("d").agg(F.var_pop("v").alias("var"))
    dim_leg = dims.agg(
        F.count(F.lit(1)).alias("dim"),
        F.count_if(F.col("var") <= dead_var_eps).alias("n_dead_dims"),
    )
    norms = embeddings.select(
        F.sqrt(F.aggregate(
            F.col(vec_col).cast("array<double>"),
            F.lit(0.0), lambda a, x: a + x * x)).alias("norm"))
    norm_leg = norms.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("norm"), 6).alias("mean_norm"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.count_if(F.col("norm") == 0.0).alias("n_zero_norm"),
    )
    max_leg = vals.agg(F.round(F.max(F.abs(F.col("v"))), 6)
                       .alias("max_abs"))
    return (norm_leg.crossJoin(dim_leg).crossJoin(max_leg)
            .select("n_vectors", "dim", "mean_norm", "min_norm",
                    "n_zero_norm", "n_dead_dims", "max_abs"))


def ann_ndcg_eval(
    exact: DataFrame,
    approx: DataFrame,
    k: int | None = None,
    query_col: str = "query_id",
    cand_col: str = "cand_id",
    rank_col: str = "rank",
    sim_col: str = "sim",
) -> DataFrame:
    """nDCG@k of an approximate ANN result against the exact one — the
    graded companion to :func:`ann_recall_eval`: recall treats every
    exact top-k member equally, but losing the rank-1 neighbor costs a
    downstream mining stage (margin scoring, near-dup verification)
    far more than losing rank k. Standard pooled-truth nDCG
    (Järvelin & Kekäläinen, TOIS 2002): gain of a retrieved candidate
    = its EXACT similarity (clamped at 0 — cosine can be negative),
    discount 1/log2(rank+1); IDCG from the exact ranking itself;
    candidates outside the exact top-k pool carry zero gain.

    ONE summary row: (n_queries, micro_ndcg = pooled sum DCG / sum
    IDCG, mean_ndcg, min_ndcg). Per-query nDCG is converted to integer
    micro-units before averaging (the ann_recall_eval device) so the
    mean is bit-identical under any partitioning and in the oracle.

    Scale shape: per-query aggs over <= k rows each, one equi-join of
    two top-k tables co-keyed by query — all bounded by queries*k,
    never by corpus size.
    """
    e = exact if k is None else exact.filter(F.col(rank_col) <= k)
    a = approx if k is None else approx.filter(F.col(rank_col) <= k)
    gain = F.greatest(F.col(sim_col), F.lit(0.0))
    disc = F.lit(1.0) / F.log2(F.col(rank_col).cast("double") + 1.0)
    e2 = e.select(F.col(query_col).alias("q"), F.col(cand_col).alias("c"),
                  gain.alias("g"), (gain * disc).alias("gd"))
    idcg = e2.groupBy("q").agg(F.sum("gd").alias("idcg"))
    a2 = a.select(F.col(query_col).alias("q"), F.col(cand_col).alias("c"),
                  disc.alias("ad"))
    dcg = (
        a2.join(e2.select("q", "c", "g"), ["q", "c"])
        .groupBy("q").agg(F.sum(F.col("g") * F.col("ad")).alias("dcg"))
    )
    j = (
        idcg.join(dcg, "q", "left")
        .withColumn("dcg", F.coalesce(F.col("dcg"), F.lit(0.0)))
        .filter(F.col("idcg") > 0)
        .withColumn(
            "_nu",
            F.round(F.col("dcg") * F.lit(1_000_000.0) / F.col("idcg"))
            .cast("long"))
    )
    return j.agg(
        F.count("*").alias("n_queries"),
        F.round(F.sum("dcg") / F.sum("idcg"), 6).alias("micro_ndcg"),
        F.round(F.sum("_nu") / F.count("*") / F.lit(1e6), 6)
        .alias("mean_ndcg"),
        F.round(F.min("_nu") / F.lit(1e6), 6).alias("min_ndcg"),
    )


def pool_embeddings(
    vectors: DataFrame,
    group_col: str = "group_id",
    vec_col: str = "embedding",
    mode: str = "mean",
) -> DataFrame:
    """Pool member embeddings (chunk/span/paragraph vectors) into one
    vector per group — the table-construction primitive behind every
    doc-level embedding column: long documents are embedded in chunks
    and mean-pooled (the SBERT/SentenceTransformers default), or
    max-pooled for feature-presence semantics. Output: (group,
    n_members, embedding) with components rounded to 6 (pooled floats
    are order-of-addition sensitive; rounding pins the cross-engine
    value, same device as the cosine lanes).

    Relational shape: posexplode to (group, dim, value) — rows x dim,
    the honest cost of dimension-wise aggregation — then TWO hash aggs
    ((group, dim) pool, then group re-assembly via array_sort over the
    collected (dim, value) structs: sorted by dim, deterministic under
    any partitioning). Group cardinality bounds the collect_list at
    exactly `dim` entries — never corpus-sized. No window, no UDF.
    """
    if mode not in ("mean", "max"):
        raise ValueError(f"mode must be 'mean' or 'max', got {mode!r}")
    pool = F.avg if mode == "mean" else F.max
    ex = vectors.select(
        F.col(group_col).alias("g"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"))
    per = ex.groupBy("g", "pos").agg(
        F.count("*").alias("n"),
        F.round(pool(F.col("v").cast("double")), 6).alias("mv"))
    doc = per.groupBy("g").agg(
        F.max("n").cast("bigint").alias("n_members"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mv"))),
            lambda s: s["mv"]).alias("embedding"))
    return doc.select(F.col("g").alias(group_col), "n_members",
                      "embedding")
