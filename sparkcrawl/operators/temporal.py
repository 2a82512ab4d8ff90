"""Temporal / non-equi join operators: as-of join and range join.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the standard Spark
re-expression is equi-join on the partition key + inequality filter +
argmax — every row keeps ONE history row, the latest at-or-before its
probe time. Ties on the timestamp are broken deterministically by a
caller-named column so the result (and the DuckDB oracle) is unique.

Scale notes:
  - asof_join shuffles both sides once on the key column and reduces
    with max_by (hash aggregation, map-side partial, no sort). With a
    bounded history per key (a frontier's per-URL fetch history, a
    user's event stream) the join fan-out is bounded; for unbounded
    histories pre-bucket by (key, time_bucket) and probe the 2
    adjacent buckets instead.
  - range_join broadcasts the small bounds table (dimension-sized by
    construction: bucket definitions, IP blocks, size classes) and
    evaluates the BETWEEN predicate inside codegen — a broadcast
    nested-loop join over a dim table is O(|facts| * |dims|) with
    |dims| tiny, the right plan at 100 TB; never range-join two fact
    tables without bucketing first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    history: DataFrame,
    key: str,
    probe_ts: str = "ts",
    hist_ts: str = "ts",
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each probe row, attach the history row with the greatest
    ``hist_ts`` <= ``probe_ts`` on the same ``key`` (direction
    "forward": smallest >= ). Probes with no eligible history row are
    kept with NULL history columns (left-join semantics, like
    pandas.merge_asof).

    History columns come back prefixed ``h_``. ``tiebreak`` names a
    history column that makes the argmax unique when timestamps tie
    (required for oracle-stable output if ties are possible).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    probe_cols = probes.columns
    hist_cols = [c for c in history.columns if c != key]
    h = history.select(
        F.col(key), *[F.col(c).alias(f"h_{c}") for c in hist_cols]
    )
    j = probes.join(h, key, "left")
    hts = F.col(f"h_{hist_ts}")
    eligible = (
        hts <= F.col(probe_ts) if direction == "backward"
        else hts >= F.col(probe_ts)
    )
    # ineligible history rows become all-NULL payloads; max_by skips
    # NULL ordering keys, and a probe whose matches are ALL ineligible
    # keeps one NULL row through the left join -> NULL history columns.
    j = j.select(
        *probe_cols,
        *[F.when(eligible, F.col(f"h_{c}")).alias(f"h_{c}") for c in hist_cols],
    )
    hts = F.col(f"h_{hist_ts}")
    # Order by the timestamp NATIVELY inside a struct (works for both
    # TIMESTAMP and TIMESTAMP_NTZ — parquet tables surface the latter,
    # which cannot be cast to double): backward = max_by over (ts,
    # tiebreak); forward = min_by over (ts, -tiebreak), so in BOTH
    # directions the GREATEST tiebreak value wins among timestamp ties
    # (tiebreak must be numeric for forward). max_by/min_by skip NULL
    # ordering keys, so masked-ineligible rows never win.
    payload = F.struct(*[F.col(f"h_{c}") for c in hist_cols])
    if direction == "backward":
        parts = [hts] + ([F.col(f"h_{tiebreak}")] if tiebreak else [])
        agg = F.max_by(payload, F.when(hts.isNotNull(), F.struct(*parts)))
    else:
        parts = [hts] + ([-F.col(f"h_{tiebreak}")] if tiebreak else [])
        agg = F.min_by(payload, F.when(hts.isNotNull(), F.struct(*parts)))
    # NOTE: probe rows must be unique as tuples (give probes a row id
    # if they are not) — groupBy(*probe_cols) is the reduce key.
    return (
        j.groupBy(*probe_cols)
        .agg(agg.alias("_h"))
        .select(*probe_cols, *[F.col(f"_h.h_{c}").alias(f"h_{c}") for c in hist_cols])
    )


def range_join(
    facts: DataFrame,
    bounds: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the bounds rows whose [lo, hi) interval
    contains ``value`` — broadcast non-equi join (the bounds side is a
    dimension table by contract). Half-open interval: lo <= v < hi."""
    cond = (F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi))
    return facts.join(F.broadcast(bounds), cond, how)


def sessionize(
    events: DataFrame,
    gap_seconds: float,
    key_col: str = "host",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch sessionization — gaps-and-islands: a new session starts
    wherever the gap to the previous event on the same key exceeds
    ``gap_seconds``; the session id is the running count of starts.

    The BATCH twin of streaming/sessions.py's
    ``applyInPandasWithState`` operator (same gap semantics, the shape
    for backfills / reprocessing where streaming state is pointless):
    one lag + one running-sum window over the SAME (key, ts) ordering,
    so Catalyst evaluates both in a single sort+window pass — one
    shuffle on the key, no Python, fully oracle-expressible.

    Output: events' columns + ``session_id`` (0-based per key).
    Per-key windows are bounded by per-key event counts — the usual
    contract (a mega-host's stream sorts within one partition; if a
    single key's history outgrows a task, pre-split by time range
    first).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(key_col).orderBy(ts_col)
    # unix_micros over an explicit timestamp cast: parquet event times
    # arrive as TIMESTAMP_NTZ, which Spark will not cast to double
    sec = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1e6)
    gap = sec - F.lag(sec).over(w)
    is_start = F.when(
        gap.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        (F.sum(is_start).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ) - F.lit(1)).cast("int"),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: float,
    key_col: str = "host",
    ts_col: str = "ts",
) -> DataFrame:
    """(key, session_id, n_events, start_ts, end_ts, duration_s) per
    session — the rollup a crawl-politeness audit reads (how long do
    we hammer a host per visit, with what inter-visit gaps)."""
    s = sessionize(events, gap_seconds, key_col, ts_col)
    return s.groupBy(key_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            (
                F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
                - F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
            ) / F.lit(1e6)
        ).alias("duration_s"),
    )
