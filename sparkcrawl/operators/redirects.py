"""Redirect-chain resolution — alias collapse for the frontier.

A crawl accumulates 3xx edges (src -> Location target, J5/C4); the
frontier wants every alias collapsed to its FINAL destination so
variants of one page share a single url_hash and one politeness slot.
Chains can be long (http -> https -> www -> canonical -> CDN) and can
loop (redirect cycles are a classic crawler trap).

``resolve_redirect_chains`` resolves every source to its chain's final
target with POINTER DOUBLING: round k composes the current mapping
with itself, so the resolved distance doubles each round — chains up
to ``max_hops`` need ceil(log2(max_hops)) self-joins, NOT max_hops
sequential joins. Each round is one equi-join + coalesce on a
(src, cur) mapping keyed by url — the same logarithmic-rounds shape as
connected components (textops), and the right one at 10^10 edges where
a per-hop loop would serialize 20+ shuffles.

Cycles / over-long chains: a source whose endpoint STILL has an
out-edge after the doubling rounds cannot resolve within ``max_hops``
— it is flagged ``cycle=true`` with NULL final (the caller quarantines
those, trap-style), never looped on forever.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirect_chains(
    edges: DataFrame,
    max_hops: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(src, final, hops, cycle) for every redirect source.

    ``edges`` is one row per redirect (src url -> immediate target);
    multiple edges per src are invalid input (a URL redirects to one
    place per snapshot) — resolution uses an arbitrary-but-deterministic
    min dst in that case.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )
    cur = e.select(
        "src",
        F.col("dst").alias("cur"),
        F.lit(1).cast("bigint").alias("hops"),
    )
    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        # localCheckpoint per round (same as connected_components): the
        # doubling step joins the mapping WITH ITSELF, and without
        # materialization each round would re-evaluate the previous
        # round's plan on both sides — 2^rounds join nodes instead of
        # one join per round (plan-gated in tests/test_redirects.py).
        cur = cur.localCheckpoint(eager=True)
        nxt = cur.select(
            F.col("src").alias("_s"),
            F.col("cur").alias("_c"),
            F.col("hops").alias("_h"),
        )
        cur = (
            cur.join(nxt, cur["cur"] == nxt["_s"], "left")
            .select(
                "src",
                F.coalesce(F.col("_c"), F.col("cur")).alias("cur"),
                (
                    F.col("hops")
                    + F.coalesce(F.col("_h"), F.lit(0).cast("bigint"))
                ).alias("hops"),
            )
        )
    # unresolved = endpoint still redirects somewhere (cycle, or a chain
    # longer than the doubling horizon) OR the walk overshot max_hops
    srcs = e.select(F.col("src").alias("_edge_src")).distinct()
    out = cur.join(srcs, cur["cur"] == srcs["_edge_src"], "left")
    unresolved = F.col("_edge_src").isNotNull() | (F.col("hops") > max_hops)
    return out.select(
        "src",
        F.when(unresolved, F.lit(None).cast("string"))
        .otherwise(F.col("cur"))
        .alias("final"),
        F.when(unresolved, F.lit(None).cast("bigint"))
        .otherwise(F.col("hops"))
        .alias("hops"),
        unresolved.alias("cycle"),
    )
