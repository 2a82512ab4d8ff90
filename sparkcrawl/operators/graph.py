"""Link-graph operators: PageRank for host/URL prioritization.

A crawl scheduler's classic priority signal (alongside C8's
outcome-based requeue math): hosts that many other hosts link to get
fetched first. Re-expressed Spark-first as power iteration — each
round is one equi-join + one hash aggregation + one broadcast-sized
node-table join, with ``localCheckpoint`` truncating the per-round
lineage exactly like :func:`sparkcrawl.operators.textops.connected_components`.

Semantics (simplified PageRank, the common fixed-iteration form):

    rank_0(x)   = 1 / N
    rank_i+1(x) = (1-d)/N + d * sum over in-neighbors y of
                  rank_i(y) / out_degree(y)

Dangling nodes (no outgoing edges) contribute nothing — their mass is
dropped, not redistributed; the oracle mirrors this exactly, so the
DuckDB recursive-CTE twin reproduces every iterate bit-for-bit up to
float summation order (output rounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, rank) after ``iters`` power iterations over the distinct
    directed edge list. Self-loops are ignored. Node set = every id
    appearing as src or dst."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # weighted out-edges: each neighbor receives rank/out_deg
    out = e.join(deg, "src").select(
        F.col("src").alias("id"), "dst", (F.lit(1.0) / F.col("out_deg")).alias("w")
    ).persist()
    out.count()

    base = F.lit((1.0 - damping) / n)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            ranks.join(out, "id")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (base + F.lit(damping) * F.coalesce("_in", F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    nodes.unpersist()
    out.unpersist()
    return ranks.select("id", F.round("rank", 6).alias("rank"))
