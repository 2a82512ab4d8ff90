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
    raw = _maxabs(F.col(vec)) / F.lit(127.0)
    # Generate boundary: the per-element division below references the
    # scale, and projection collapse would inline the whole max-abs
    # aggregate fold into the lambda — evaluated PER ELEMENT (O(dim^2)
    # per vector). explode(array(..)) materializes the scalar once per
    # row; a NULL element (all-zero vector) keeps its row.
    staged = df.select(
        "*", F.explode(F.array(F.when(raw > 0, raw))).alias("_qscale"))
    q = F.transform(
        F.col(vec),
        lambda x: F.round(x.cast("double") / F.col("_qscale")).cast("int"),
    )
    return (
        staged.withColumn("scale", F.col("_qscale"))
        .withColumn(out, F.when(F.col("_qscale").isNotNull(), q))
        .drop("_qscale")
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


# --------------------------------------------------------------------------
# Product quantization (PQ) — FAISS-IVFADC-style, relational
# --------------------------------------------------------------------------

def pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011, public
    method): the vector space splits into ``m`` subspaces of dim/m
    dims; each gets its own ``n_codes``-entry codebook. Compression:
    a 64-dim float32 vector (256 B) becomes m=8 one-byte codes — 32x —
    and the scan stage reads codes + per-query lookup tables only.

    This constructor is the DETERMINISTIC oracle mode (mirrors
    semantic_dedup's pinned centroids): codebook entry ``c`` of
    subspace ``j`` is the j-th subvector of the c-th lowest-id vector —
    SQL-reproducible, no iteration. The data-adaptive swap-in is one
    :func:`sparkcrawl.operators.simsearch.kmeans_fit` per subspace over
    the subvector slices; the (subspace, code, centroid) output shape
    below is what both produce.

    Returns (subspace int, code int, centroid array<double>) —
    m * n_codes rows, a broadcast-sized dimension table by contract.
    """
    d_sub = dim // m
    base = (
        embeddings.orderBy(F.asc(id_col))
        .limit(n_codes)
        .select(
            F.col(id_col).alias("_cid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
        )
    )
    from pyspark.sql import Window as W

    code = F.row_number().over(W.orderBy("_cid")) - 1  # n_codes rows: fine
    sub = base.withColumn("code", code).select(
        "code",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.struct(
                    j.cast("int").alias("subspace"),
                    F.slice(F.col("_v"), j * d_sub + 1, d_sub).alias("centroid"),
                ),
            )
        ).alias("_s"),
    )
    return sub.select(F.col("_s.subspace"), F.col("code").cast("int"), F.col("_s.centroid"))


def _sq_l2(a, b) -> Column:
    """Squared L2 between two equal-length double arrays — fixed
    left-to-right fold, so DuckDB's explicit term sum reproduces the
    accumulation order bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _subvectors(df: DataFrame, m: int, d_sub: int, id_col: str, vec_col: str,
                out_id: str = "id") -> DataFrame:
    """(out_id, subspace, sub): every vector exploded into its m
    double-cast subvectors — the shared front half of encode / lookup-
    table construction."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.struct(
                    j.cast("int").alias("subspace"),
                    F.slice(
                        F.transform(F.col(vec_col), lambda x: x.cast("double")),
                        j * d_sub + 1,
                        d_sub,
                    ).alias("sub"),
                ),
            )
        ).alias("_s"),
    ).select(out_id, "_s.subspace", "_s.sub")


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as its per-subspace nearest codebook entry:
    (id, codes array<int>, ordered by subspace).

    Shape at scale: vectors explode into m subvector rows (the only
    corpus-sized step), equi-join the BROADCAST codebook on subspace,
    argmin via min-struct hash agg (map-side combine, no window over
    the corpus), then one groupBy re-assembles the code array. The
    encoded table is what persists; the float corpus can be dropped.
    """
    d_sub = dim // m
    subvecs = _subvectors(embeddings, m, d_sub, id_col, vec_col)
    scored = subvecs.join(F.broadcast(codebooks), "subspace").withColumn(
        "_d", F.round(_sq_l2(F.col("sub"), F.col("centroid")), 9)
    )
    best = scored.groupBy("id", "subspace").agg(
        F.min(F.struct(F.col("_d"), F.col("code"))).alias("_b")
    )
    return best.groupBy("id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("subspace"), F.col("_b.code").alias("c")))
            ),
            lambda s: s["c"],
        ).alias("codes")
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: per query, the distance to each
    codebook entry of each subspace is tabulated ONCE (m * n_codes
    rows — the lookup table), then every corpus vector's approximate
    distance is the sum of m table lookups on its codes. The corpus
    side never touches floats — the 32x-compressed codes are the scan.

    Plan: queries x codebooks broadcast cross (tiny), corpus codes
    posexplode to (cand, subspace, code), equi-join the broadcast table
    on (query, subspace, code), ONE hash agg summing m terms per
    (query, cand), rank-limit top-k. No window over anything bigger
    than per-query candidates.
    """
    d_sub = dim // m
    q = _subvectors(queries, m, d_sub, id_col, vec_col, out_id="query_id")
    table = q.join(F.broadcast(codebooks), "subspace").select(
        "query_id",
        "subspace",
        "code",
        F.round(_sq_l2(F.col("sub"), F.col("centroid")), 9).alias("_d"),
    )
    cand = codes.select(
        F.col("id").alias("cand_id"),
        F.posexplode("codes").alias("subspace", "code"),
    )
    summed = (
        cand.join(F.broadcast(table), ["subspace", "code"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.round(F.sum("_d"), 6).alias("adist"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("cand_id"))
    return (
        summed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "adist", "rank")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    nprobe: int = 1,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the production ANN configuration (FAISS IVFADC, Jégou
    et al. 2011): a coarse quantizer (IVF cells) routes each query to
    ``nprobe`` cells, and the fine asymmetric-distance scan runs only
    over THOSE cells' PQ codes. The corpus-sized state is the
    (cell, codes) table — one byte per subspace per vector; floats
    appear only in the broadcast-sized codebooks/centroids and the
    per-query lookup tables.

    Sandbox-deterministic defaults (SQL-reproducible): centroids = the
    ``n_cells`` lowest-id vectors (ivf_topk's pinned mode), codebooks =
    :func:`pq_codebooks` pinned mode over RAW vectors (classic IVFADC
    encodes residuals vector - centroid; the residual variant drops in
    by passing pre-subtracted embeddings + matching codebooks — the
    operator graph is unchanged, and the raw-vector form keeps the
    oracle exact).

    Shape at scale: everything is broadcast-join + hash-agg; the only
    corpus shuffles are pq_encode's argmin agg and the final per-query
    rank over cell-local candidates (|cells probed| / |cells| of the
    corpus, not all of it).
    """
    from sparkcrawl.operators.simsearch import ivf_assign, ivf_assign_topn

    if centroids is None:
        centroids = (
            embeddings.orderBy(F.asc(id_col))
            .limit(n_cells)
            .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec"))
        )
    if codebooks is None:
        codebooks = pq_codebooks(embeddings, m, n_codes, dim, id_col, vec_col)
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    codes = pq_encode(embeddings, codebooks, m, dim, id_col, vec_col)
    cell_codes = codes.join(assigned.select("id", "centroid_id"), "id")
    q_cells = ivf_assign_topn(queries, centroids, nprobe, id_col, vec_col).select(
        F.col("id").alias("query_id"), "centroid_id"
    )
    d_sub = dim // m
    q = _subvectors(queries, m, d_sub, id_col, vec_col, out_id="query_id")
    table = q.join(F.broadcast(codebooks), "subspace").select(
        "query_id",
        "subspace",
        "code",
        F.round(_sq_l2(F.col("sub"), F.col("centroid")), 9).alias("_d"),
    )
    cand = (
        cell_codes.join(q_cells, "centroid_id")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("cand_id"),
            F.posexplode("codes").alias("subspace", "code"),
        )
    )
    summed = (
        cand.join(F.broadcast(table), ["query_id", "subspace", "code"])
        .groupBy("query_id", "cand_id")
        .agg(F.round(F.sum("_d"), 6).alias("adist"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("cand_id"))
    return (
        summed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "adist", "rank")
    )
