"""Deterministic corpus splitting & sampling.

Training-data pipelines need REPRODUCIBLE splits and samples: the same
document must land in the same split on every run, on any cluster, in
any engine, regardless of partitioning — so none of this uses
``rand()`` (re-rolls per task retry) or ``sample()`` (partition-order
dependent). Everything keys off a salted md5 of the document id,
mapped to a uniform bucket in [0, 1): pure column expressions,
whole-stage codegen, zero shuffle, and bit-for-bit reproducible in
DuckDB for the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _unit_bucket(id_col: Column, salt: str) -> Column:
    """Uniform [0,1) bucket from the first 8 md5 hex chars of salt||id.

    Cross-engine: DuckDB reproduces it as
    CAST(concat('0x', substr(md5(salt || id), 1, 8)) AS BIGINT)
      % 1000000 / 1000000.0
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8),
        16, 10,
    ).cast("bigint")
    return (h % _BUCKETS) / F.lit(float(_BUCKETS))


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row a split label by cumulative weight ranges over
    the salted id hash — train/val/test that survives re-runs, retries
    and repartitioning. Weights are normalized; label order follows
    the dict order (make it deterministic in the caller)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    u = _unit_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    labels = list(weights)
    for name in labels[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(labels[-1]) if expr is None else expr.otherwise(F.lit(labels[-1]))
    )
    return docs.withColumn("split", expr)


def stratified_sample(
    docs: DataFrame,
    fractions: DataFrame | dict[str, float],
    strata_col: str,
    default_frac: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic ``frac`` of each stratum (e.g. per-language
    rebalancing of a crawl corpus). ``fractions`` is a (stratum, frac)
    mapping or DataFrame — dimension-sized by contract, broadcast
    joined; strata without an entry keep ``default_frac``. A row is
    kept iff its salted id bucket < frac, so the sample for a stratum
    is NESTED: raising frac only ever ADDS documents (stable samples
    across config changes)."""
    spark = docs.sparkSession
    if isinstance(fractions, dict):
        fractions = spark.createDataFrame(
            [(k, float(v)) for k, v in fractions.items()],
            [strata_col, "frac"],
        )
    u = _unit_bucket(F.col(id_col), salt)
    return (
        docs.join(F.broadcast(fractions), strata_col, "left")
        .withColumn("frac", F.coalesce(F.col("frac"), F.lit(default_frac)))
        .filter(u < F.col("frac"))
        .drop("frac")
    )


def weighted_mixture_sample(
    docs: DataFrame,
    weights: DataFrame | dict[str, float],
    budget: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    oversample: float = 4.0,
) -> DataFrame:
    """Materialize a training mixture: draw ``round(budget * weight)``
    documents from each domain, uniformly WITHIN the domain, fully
    deterministically (no ``rand()``, no partition-order dependence).
    This is the step after :func:`domain_mixing_weights` — the weights
    say how much of each domain the mix wants; this picks WHICH rows.

    Selection key is the salted id bucket (same family as
    :func:`hash_split`), so the per-domain sample is NESTED: raising a
    domain's weight only ever adds documents.

    Scale plan (the 100 TB shape): a naive per-domain top-k would sort
    every domain's full row set under one window partition. Instead:

    1. one hash agg for per-domain doc counts (|domains| rows, the
       dimension contract);
    2. broadcast counts+quotas back and PRE-FILTER to
       ``u < min(1, oversample * quota / count)`` — a codegen'd scan
       filter that keeps ~oversample*quota rows per domain out of the
       corpus;
    3. rank only the survivors with ``row_number`` per domain and keep
       ``rank <= quota``.

    Both stages are deterministic, so the result is exact and
    engine-reproducible (the DuckDB oracle mirrors both stages). With
    the default oversample=4 the pre-filter undershoots a quota with
    probability ~exp(-quota) (Chernoff); any shortfall is itself
    deterministic and mirrored by the oracle.

    Returns docs filtered to the mix, plus ``mix_rank`` (1-based draw
    order within the domain).
    """
    from pyspark.sql.window import Window

    spark = docs.sparkSession
    if isinstance(weights, dict):
        weights = spark.createDataFrame(
            [(k, float(v)) for k, v in weights.items()],
            [strata_col, "weight"],
        )
    # fully relational quota derivation (r3 VERDICT finding #3: the old
    # |domains|-bounded collect would not survive strata keyed by
    # registered domain at web scale) — one scalar agg cross-joined
    # back, broadcast; rounding is HALF_UP (F.round), where the old
    # driver-side python round() was banker's — identical off the
    # exact-.5 knife edge.
    tot = weights.agg(
        F.coalesce(F.sum("weight"), F.lit(1.0)).alias("_tw")
    ).select(
        F.when(F.col("_tw") != 0, F.col("_tw")).otherwise(F.lit(1.0)).alias("_tw")
    )
    quotas = (
        weights.crossJoin(F.broadcast(tot))
        .select(
            strata_col,
            F.round(F.lit(budget) * F.col("weight") / F.col("_tw"))
            .cast("int")
            .alias("quota"),
        )
    )
    counts = docs.groupBy(strata_col).agg(F.count("*").alias("n_domain"))
    dim = quotas.join(counts, strata_col, "inner").withColumn(
        "u_cut",
        F.least(
            F.lit(1.0),
            F.lit(oversample) * F.col("quota") / F.col("n_domain"),
        ),
    )
    u = _unit_bucket(F.col(id_col), salt)
    survivors = (
        docs.withColumn("_u", u)
        .join(F.broadcast(dim), strata_col, "inner")
        .filter(F.col("_u") < F.col("u_cut"))
    )
    rank = F.row_number().over(
        Window.partitionBy(strata_col).orderBy("_u", id_col)
    )
    return (
        survivors.withColumn("mix_rank", rank)
        .filter(F.col("mix_rank") <= F.col("quota"))
        .drop("_u", "u_cut", "quota", "n_domain")
    )


def token_balanced_shards(
    docs: DataFrame,
    target_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    salt: str = "shard-v1",
    n_buckets: int = 256,
) -> DataFrame:
    """Pack documents into export shards of ~``target_tokens`` tokens
    each — the physical layout a pre-training data loader wants (equal
    work per shard file, documents pre-shuffled by hash so every shard
    is an unbiased corpus slice).

    A document's position is its prefix sum of token counts in the
    deterministic global order ``(h, id)`` where ``h`` is the salted
    md5 bucket; ``shard = floor(position_before / target_tokens)``.
    Documents never split across shards; a shard overshoots the target
    by at most one document.

    Scale plan: a global ordered prefix sum is a single-partition
    window — unusable at corpus scale. Instead the classic two-phase
    distributed scan, expressed relationally:

    1. ``bucket = h >> k`` (a PREFIX of the order key, so bucket order
       == global order) splits the corpus into ``n_buckets`` ranges;
    2. per-bucket token totals via one hash agg (n_buckets rows), their
       exclusive prefix sums via a window over that BOUNDED aggregate;
    3. broadcast the offsets back; within each bucket a windowed
       running sum over ~corpus/n_buckets rows (spillable sort, and
       ``n_buckets`` is the knob — raise it with the corpus).

    Associativity of + makes the two-phase result equal the one global
    scan; the DuckDB oracle computes the single global window, pinning
    the decomposition.
    """
    from pyspark.sql.window import Window

    tok = (
        F.col(tokens_col)
        if tokens_col
        else F.size(F.split(F.col(text_col), " "))
    ).cast("bigint")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("bigint")
    bucket_width = (1 << 32) // n_buckets
    base = docs.select(
        F.col(id_col),
        tok.alias("n_tokens"),
        h.alias("_h"),
        (h / F.lit(bucket_width)).cast("int").alias("_bucket"),
    )
    totals = base.groupBy("_bucket").agg(F.sum("n_tokens").alias("_btok"))
    offsets = totals.select(
        "_bucket",
        F.coalesce(
            F.sum("_btok").over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_offset"),
    )
    cum_in_bucket = F.sum("n_tokens").over(
        Window.partitionBy("_bucket")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "start_tokens", F.col("_offset") + cum_in_bucket - F.col("n_tokens")
        )
        .withColumn(
            "shard",
            (F.col("start_tokens") / F.lit(target_tokens)).cast("int"),
        )
        .select(id_col, "n_tokens", "start_tokens", "shard")
    )


def pack_token_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    salt: str = "shard-v1",
    n_buckets: int = 256,
) -> DataFrame:
    """Sequence packing: lay the corpus out as back-to-back tokens in
    the deterministic salted order and cut it every ``seq_len`` tokens
    — the training-example layout a pre-training loader consumes.
    Unlike :func:`token_balanced_shards` (documents never split),
    documents DO split across example boundaries here: every example
    except the last is exactly ``seq_len`` tokens with zero padding.

    One output row per (document, example) piece:

    - ``example_id``  — which fixed-length example the piece lands in
    - ``doc_offset``  — the piece's first token WITHIN the document
    - ``piece_len``   — tokens contributed to that example

    Plan: the same two-phase distributed prefix sum as
    :func:`token_balanced_shards` gives each doc its global start
    position; the piece rows are then pure per-row arithmetic — an
    ``explode(sequence(first_ex, last_ex))`` inside codegen, no extra
    shuffle (a doc spanning k examples emits k rows; k ≤
    tokens/seq_len + 1, so output size == corpus token count /
    seq_len in rows, independent of skew).
    """
    pos = token_balanced_shards(
        docs,
        # target is irrelevant here; reuse the prefix-sum plumbing
        target_tokens=max(seq_len, 1),
        id_col=id_col,
        text_col=text_col,
        tokens_col=tokens_col,
        salt=salt,
        n_buckets=n_buckets,
    ).select(id_col, "n_tokens", "start_tokens")
    start = F.col("start_tokens")
    end = start + F.col("n_tokens")
    first_ex = F.floor(start / F.lit(seq_len)).cast("bigint")
    last_ex = F.floor((end - 1) / F.lit(seq_len)).cast("bigint")
    pieces = (
        pos.filter(F.col("n_tokens") > 0)
        .withColumn("example_id", F.explode(F.sequence(first_ex, last_ex)))
    )
    ex_lo = F.col("example_id") * F.lit(seq_len)
    ex_hi = ex_lo + F.lit(seq_len)
    p_start = F.greatest(start, ex_lo)
    p_end = F.least(end, ex_hi)
    return pieces.select(
        id_col,
        "example_id",
        (p_start - start).cast("bigint").alias("doc_offset"),
        (p_end - p_start).cast("bigint").alias("piece_len"),
    )


def domain_mixing_weights(
    docs: DataFrame,
    alpha: float = 0.7,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain sampling weights for a training mix:
    ``weight(d) ∝ tokens(d)^alpha`` (alpha < 1 up-weights small
    domains, the standard temperature-style mixing rule).

    (source, n_docs, tokens, weight) — weight rounded to 6, sums to ~1.

    Plan: one hash aggregation over the corpus (map-side combine;
    ``size(split(...))`` is codegen'd, the text is never exploded),
    then a single-partition window over the |domains|-sized AGGREGATE
    to normalize — bounded by the domain-count contract, never by the
    corpus (same rationale as the queue-stats windows, schedule.py).
    """
    from pyspark.sql.window import Window

    agg = docs.groupBy(F.col(strata_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("tokens"),
    )
    scaled = agg.withColumn("w_raw", F.pow(F.col("tokens").cast("double"), F.lit(alpha)))
    total = F.sum("w_raw").over(Window.partitionBy())
    return scaled.select(
        "source",
        "n_docs",
        "tokens",
        F.round(F.col("w_raw") / total, 6).alias("weight"),
    )


def weighted_reservoir_sample(
    docs: DataFrame,
    k: int,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    salt: str = "ares-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, per-ITEM weights —
    Efraimidis & Spirakis (IPL 2006) A-ES keys:
    draw u_i ~ U(0,1), rank by u_i^(1/w_i) descending, keep the top k;
    the result is distributed exactly as sequential weighted draws
    without replacement. Complements :func:`weighted_mixture_sample`
    (per-DOMAIN quotas, uniform within): here every row carries its own
    weight (quality score, token count, DSIR ratio, ...).

    Determinism/cross-engine: u_i is the salted md5 unit bucket
    shifted off zero ((h % 1e6 + 0.5) / 1e6 — exact arithmetic on both
    engines), and ranking uses ln(u)/w (monotone in u^(1/w) for w>0;
    avoids pow's extra rounding), a bit-identical double under shared
    libm. Rows with NULL or non-positive weight cannot be drawn
    (filtered, matching "weight 0 never sampled"). Ties break by id.

    Scale shape: the key is a codegen'd projection; global top-k is
    orderBy+limit, which Spark executes as per-partition TakeOrdered(k)
    + a k-row driver merge — no global sort, no single-partition
    window, safe at any corpus size for bounded k.

    Returns the sampled rows + ``ares_key`` (round 9dp, display only;
    ranking uses the raw double) + ``sample_rank`` (1-based).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("bigint")
    u = (h % _BUCKETS + F.lit(0.5)) / F.lit(float(_BUCKETS))
    w = F.col(weight_col).cast("double")
    keyed = (
        docs.filter(w.isNotNull() & (w > 0))
        .withColumn("_key", F.log(u) / w)
    )
    top = keyed.orderBy(F.desc("_key"), F.asc(id_col)).limit(k)
    # rank the k survivors (k rows — the window is bounded, not
    # data-sized); recomputing the same deterministic order
    from pyspark.sql import Window as W

    win = W.orderBy(F.desc("_key"), F.asc(id_col))
    return (
        top.withColumn("sample_rank", F.row_number().over(win))
        .withColumn("ares_key", F.round(F.col("_key"), 9))
        .drop("_key")
    )


def group_split(
    docs: DataFrame,
    group_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "gsplit-v1",
) -> DataFrame:
    """Leakage-safe split: assign every row a split label by hashing
    its GROUP key (registered domain, source site, url host) instead
    of its document id, so all documents of one group land in the SAME
    split — the standard guard against train/eval contamination from
    near-duplicate pages of a single site straddling the boundary
    (mirrors, templated pages, session-id variants all share a group).

    Because the label is a pure function of the group VALUE, zero
    cross-split leakage holds by construction — no join, no shuffle,
    no group registry to maintain; a new group appearing mid-corpus
    gets a stable split on first contact. The realized split sizes
    converge to the weights only as fast as group sizes allow (one
    giant domain is an indivisible unit — that is the price of the
    leakage guarantee, and :func:`split_leakage_audit` reports it).
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    u = _unit_bucket(F.col(group_col), salt)
    expr = None
    acc = 0.0
    labels = list(weights)
    for name in labels[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(labels[-1]) if expr is None else expr.otherwise(F.lit(labels[-1]))
    )
    return docs.withColumn("split", expr)


def split_leakage_audit(
    split_docs: DataFrame,
    group_col: str,
    split_col: str = "split",
    size_col: str | None = None,
) -> DataFrame:
    """Per-split audit of a (group-aware or not) split assignment:
    document count, distinct-group count, realized share, and the
    corpus-wide count of LEAKED groups (groups appearing in more than
    one split — must be 0 for a :func:`group_split` output; for a
    doc-id split it quantifies the contamination surface).

    Shape: two hash aggs over (group, split) — the first collapses the
    corpus to one row per observed (group, split) pair with its doc
    count, everything after is dimension-sized. ``size_col`` (e.g.
    token counts) adds a weighted share alongside the doc share.
    """
    per = split_docs.groupBy(group_col, split_col).agg(
        F.count("*").alias("n_docs"),
        (F.sum(size_col) if size_col else F.lit(None).cast("double")).alias("_sz"),
    )
    leaks = per.groupBy(group_col).agg(
        F.count("*").alias("_n_splits")
    ).filter(F.col("_n_splits") > 1).agg(
        F.count("*").alias("leaked_groups")
    )
    tot = per.agg(F.sum("n_docs").alias("_tot"))
    out = (
        per.groupBy(split_col)
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.countDistinct(group_col).alias("n_groups"),
            F.sum("_sz").alias("size_total"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(leaks))
        .select(
            split_col,
            "n_docs",
            "n_groups",
            F.round(F.col("n_docs") / F.col("_tot"), 6).alias("doc_share"),
            "size_total",
            "leaked_groups",
        )
    )
    return out


def token_budget_select(
    docs: DataFrame,
    budget_tokens: int,
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Greedy quality-first corpus selection under a global token
    budget: rank the corpus by (quality DESC, id ASC) and keep every
    document whose INCLUSIVE running token total in that order is
    <= ``budget_tokens`` — the "take the best N tokens" step of a
    training-data build (data-constrained scaling recipes select a
    token budget, not a document count). Greedy prefix, not knapsack:
    the first document that would overflow the budget is dropped even
    if a later smaller one would fit — documented contract, matching
    the SQL-window definition the oracle checks.

    Scale shape — the global running sum WITHOUT a single-partition
    window (same decomposition as schedule.ranked_in_total_order):
    ``quality_col`` is contract-bounded to [0, 1] and non-null; each
    row gets bucket = floor((1 - quality) * n_buckets) (clamped), a
    pure function of the VALUE, monotone against the global order, so
    (bucket ASC, quality DESC, id ASC) == (quality DESC, id ASC).
    Per-bucket token totals — n_buckets rows, config-bounded, never
    data-sized — are collected, prefix-summed driver-side and
    broadcast back as per-bucket base offsets; buckets whose base
    already exceeds the budget are dropped BEFORE the window, so the
    per-bucket parallel running sum only runs over the selected
    region plus the one marginal bucket, not the whole corpus. At
    100x corpus size the window work grows with the BUDGET, not the
    input.

    Output: input columns + ``cum_tokens`` (inclusive running total),
    only the selected rows.
    """
    from pyspark.sql import Window as W

    if budget_tokens <= 0:
        return docs.withColumn("cum_tokens", F.lit(0).cast("bigint")).limit(0)
    q = F.col(quality_col)
    bucket = F.least(
        F.floor((F.lit(1.0) - q) * n_buckets), F.lit(n_buckets - 1)
    ).cast("int")
    tagged = docs.withColumn("_bucket", bucket)
    totals = sorted(
        (r["_bucket"], r["n"])
        for r in tagged.groupBy("_bucket")
        .agg(F.sum(tokens_col).alias("n"))
        .collect()
    )
    bases, acc = [], 0
    for bk, n in totals:
        bases.append((bk, int(acc)))
        acc += n
    spark = docs.sparkSession
    base_df = spark.createDataFrame(
        bases or [(0, 0)], "_bucket int, _base long"
    )
    w = (
        W.partitionBy("_bucket")
        .orderBy(F.desc(quality_col), F.asc(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.join(F.broadcast(base_df), "_bucket")
        .filter(F.col("_base") < F.lit(int(budget_tokens)))
        .withColumn(
            "cum_tokens",
            (F.col("_base") + F.sum(tokens_col).over(w)).cast("bigint"),
        )
        .filter(F.col("cum_tokens") <= F.lit(int(budget_tokens)))
        .drop("_bucket", "_base")
    )
