"""Deterministic hash split / stratified sample (operators/sampling.py)."""

from pyspark.sql import functions as F

from sparkcrawl.operators import sampling


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )


def test_hash_split_partitions_and_proportions(spark):
    docs = _docs(spark)
    out = sampling.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"]
              for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000  # exhaustive, disjoint by construction
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.06 < counts["val"] / 2000 < 0.14
    # determinism: identical assignment on recompute and under repartition
    again = sampling.hash_split(docs.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.select("doc_id", "split").exceptAll(
        again.select("doc_id", "split")).count() == 0


def test_hash_split_salt_changes_assignment(spark):
    docs = _docs(spark, 500)
    a = sampling.hash_split(docs, salt="s1").select("doc_id", "split")
    b = sampling.hash_split(docs, salt="s2").select("doc_id", "split")
    assert a.exceptAll(b).count() > 0


def test_stratified_sample_fracs_and_nesting(spark):
    docs = _docs(spark)
    small = sampling.stratified_sample(
        docs, {"en": 0.2, "de": 0.5}, strata_col="lang"
    )
    counts = {r["lang"]: r["n"]
              for r in small.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "fr" not in counts  # default_frac=0 drops unlisted strata
    n_en = docs.filter(F.col("lang") == "en").count()
    assert 0.12 < counts["en"] / n_en < 0.28
    assert 0.4 < counts["de"] / (2000 / 3) < 0.6
    # nested property: raising a frac only ADDS documents
    bigger = sampling.stratified_sample(
        docs, {"en": 0.6, "de": 0.5}, strata_col="lang"
    )
    assert small.select("doc_id").exceptAll(bigger.select("doc_id")).count() == 0


def test_sampling_plan_is_codegen_only(spark):
    docs = _docs(spark, 100)
    plan = (
        sampling.hash_split(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan       # zero shuffle
    assert "Python" not in plan, plan         # zero UDF
    splan = (
        sampling.stratified_sample(docs, {"en": 0.5}, strata_col="lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in splan, splan


def _corpus(spark, n=3000):
    """Deterministic (doc_id, source, text) corpus with skewed domains."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 6, "web")
        .when(F.col("id") % 10 < 9, "books")
        .otherwise("code")
        .alias("source"),
        # token count varies 1..20 deterministically
        F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.col("id") % 20 + 1).cast("int")))
        .alias("text"),
    )


def test_weighted_mixture_sample_quotas(spark):
    docs = _corpus(spark)
    out = sampling.weighted_mixture_sample(
        docs, {"web": 0.5, "books": 0.3, "code": 0.2}, budget=500,
    ).cache()
    counts = {r["source"]: r["n"]
              for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"web": 250, "books": 150, "code": 100}
    # ranks are 1..quota within each domain
    mx = {r["source"]: r["m"]
          for r in out.groupBy("source").agg(F.max("mix_rank").alias("m")).collect()}
    assert mx == {"web": 250, "books": 150, "code": 100}
    out.unpersist()


def test_weighted_mixture_sample_deterministic_and_nested(spark):
    docs = _corpus(spark)
    a = sampling.weighted_mixture_sample(
        docs, {"web": 0.5, "books": 0.5}, budget=200)
    b = sampling.weighted_mixture_sample(
        docs.repartition(13), {"web": 0.5, "books": 0.5}, budget=200)
    assert a.select("doc_id").exceptAll(b.select("doc_id")).count() == 0
    # nested: raising the budget only ADDS documents
    big = sampling.weighted_mixture_sample(
        docs, {"web": 0.5, "books": 0.5}, budget=400)
    assert a.select("doc_id").exceptAll(big.select("doc_id")).count() == 0


def test_weighted_mixture_prefilter_caps_window_input(spark):
    """The window ranks only the pre-filtered survivors, never the
    full domain: with oversample=4 and quota<<domain size the
    filter keeps ~4*quota rows per domain."""
    docs = _corpus(spark)
    out = sampling.weighted_mixture_sample(
        docs, {"web": 1.0}, budget=50, oversample=4.0)
    assert out.count() == 50
    # the pre-filter cut: u < 4*50/1800 ~ 0.111 -> ~200 of 1800 rows
    survivors = docs.filter(F.col("source") == "web").withColumn(
        "_u", sampling._unit_bucket(F.col("doc_id"), "mix-v1")
    ).filter(F.col("_u") < 4.0 * 50 / 1800)
    assert survivors.count() < 300  # window input is ~quota-sized, not domain-sized


def test_token_balanced_shards_semantics(spark):
    docs = _corpus(spark, 1000)
    out = sampling.token_balanced_shards(docs, target_tokens=500).cache()
    assert out.count() == 1000
    # every doc's start == prefix sum of tokens in (h, id) order:
    # re-derive with a single global window and compare
    from pyspark.sql.window import Window
    h = F.conv(F.substring(F.md5(F.concat(F.lit("shard-v1"),
        F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("bigint")
    tok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    expect = docs.select(F.col("doc_id"), tok.alias("t"), h.alias("h")).withColumn(
        "start",
        F.coalesce(F.sum("t").over(
            Window.orderBy("h", "doc_id").rowsBetween(Window.unboundedPreceding, -1)
        ), F.lit(0)),
    )
    diff = (out.join(expect, "doc_id")
            .filter(F.col("start_tokens") != F.col("start")).count())
    assert diff == 0
    # shard budgets: every shard holds >= target tokens before opening
    # the next (overshoot bounded by one document)
    stats = (out.groupBy("shard").agg(F.sum("n_tokens").alias("tok"),
                                      F.count("*").alias("n"))
             .orderBy("shard").collect())
    total = sum(r["tok"] for r in stats)
    assert [r["shard"] for r in stats] == list(range(len(stats)))
    for r in stats[:-1]:
        assert r["tok"] >= 500 - 20  # a doc is at most 20 tokens here
        assert r["tok"] <= 500 + 20
    assert sum(r["n"] for r in stats) == 1000 and total == out.agg(F.sum("n_tokens")).first()[0]
    out.unpersist()


def test_token_balanced_shards_two_phase_plan(spark):
    """The corpus-sized window partitions by bucket (distributed);
    only the n_buckets-sized offsets table sees a global window."""
    docs = _corpus(spark, 200)
    plan = (sampling.token_balanced_shards(docs, target_tokens=100)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan     # offsets broadcast back
    assert "Python" not in plan, plan            # no UDF anywhere


def test_pack_token_sequences_invariants(spark):
    docs = _corpus(spark, 600)
    L = 128
    out = sampling.pack_token_sequences(docs, seq_len=L).cache()
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.col("text"), " ")))).first()[0]
    # pieces cover every token exactly once
    assert out.agg(F.sum("piece_len")).first()[0] == total_tokens
    # per-doc: pieces tile the doc contiguously from offset 0
    perdoc = (out.groupBy("doc_id")
              .agg(F.sum("piece_len").alias("tok"),
                   F.min("doc_offset").alias("off0"),
                   F.count("*").alias("k")).collect())
    toks = {r["doc_id"]: r for r in perdoc}
    for r in docs.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("t")).collect():
        assert toks[r["doc_id"]]["tok"] == r["t"]
        assert toks[r["doc_id"]]["off0"] == 0
    # every example except the last is exactly seq_len tokens, no gaps
    ex = (out.groupBy("example_id").agg(F.sum("piece_len").alias("tok"))
          .orderBy("example_id").collect())
    assert [r["example_id"] for r in ex] == list(range(len(ex)))
    assert all(r["tok"] == L for r in ex[:-1])
    assert 0 < ex[-1]["tok"] <= L
    # deterministic under repartition
    again = sampling.pack_token_sequences(docs.repartition(11), seq_len=L)
    assert out.exceptAll(again).count() == 0
    out.unpersist()


def test_token_balanced_shards_with_bpe_counts(spark):
    """The run_corpus --bpe-merges composition: shards balanced by
    SUBWORD counts behave like the whitespace path but with the
    provided tokens_col driving the prefix sums."""
    from sparkcrawl.operators import bpe, sampling

    rows = [(i, "newest lowest widest " * (1 + i % 3)) for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe.bpe_train(docs, num_merges=6)
    counts = bpe.bpe_encode(docs, merges).select(
        F.col("id").alias("doc_id"), "n_tokens")
    joined = docs.join(counts, "doc_id")
    out = sampling.token_balanced_shards(
        joined, target_tokens=60, tokens_col="n_tokens")
    rows_out = out.collect()
    assert len(rows_out) == 30
    # every shard's subword total lands in [target, target + max_doc)
    by_shard = {}
    tok = {r["doc_id"]: r["n_tokens"] for r in counts.collect()}
    for r in rows_out:
        by_shard.setdefault(r["shard"], []).append(tok[r["doc_id"]])
    maxdoc = max(tok.values())
    shards = sorted(by_shard)
    # docs never split: a shard can over- or under-shoot the target by
    # at most one document (the remainder shard only undershoots)
    for s in shards[:-1]:
        assert 60 - maxdoc < sum(by_shard[s]) < 60 + maxdoc
    assert sum(sum(v) for v in by_shard.values()) == sum(tok.values())


def test_weighted_reservoir_sample(spark):
    """A-ES invariants: exactly k rows; zero/NULL weights never drawn;
    deterministic across runs; heavier items win far more often than
    light ones (statistical sanity over many salts); nested-by-rank
    (top-j of the k-sample is the j-sample)."""
    from sparkcrawl.operators.sampling import weighted_reservoir_sample

    rows = ([(i, 100.0) for i in range(20)]           # heavy
            + [(100 + i, 1.0) for i in range(80)]     # light
            + [(900, 0.0), (901, None)])              # undrawable
    docs = spark.createDataFrame(rows, ["doc_id", "weight"])

    s1 = weighted_reservoir_sample(docs, 10, salt="s0").collect()
    s2 = weighted_reservoir_sample(docs, 10, salt="s0").collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    assert len(s1) == 10
    assert all(r["doc_id"] not in (900, 901) for r in s1)
    assert [r["sample_rank"] for r in s1] == list(range(1, 11))

    s5 = weighted_reservoir_sample(docs, 5, salt="s0").collect()
    assert [r["doc_id"] for r in s5] == [r["doc_id"] for r in s1][:5]

    heavy = 0
    for t in range(12):
        got = weighted_reservoir_sample(docs, 10, salt=f"t{t}").collect()
        heavy += sum(1 for r in got if r["doc_id"] < 100)
    # heavy items are 20% of rows but 96% of total weight: expected
    # draw share >> light's. Loose bound: >45% of 120 draws.
    assert heavy > 54, heavy


# ------------------------------------------------------------- group_split


def test_group_split_no_leakage_and_matches_group_hash(spark):
    from sparkcrawl.operators import sampling

    rows = [(i, f"site-{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.group_split(df, "source", {"train": 0.8, "val": 0.1, "test": 0.1})
    per_group = (
        out.groupBy("source").agg(F.countDistinct("split").alias("k")).collect()
    )
    assert all(r["k"] == 1 for r in per_group)
    # same salt+value -> same split as hash_split on a one-row-per-group frame
    lone = spark.createDataFrame(
        [(f"site-{g}",) for g in range(7)], ["source"]
    )
    expect = {
        r["source"]: r["split"]
        for r in sampling.group_split(lone, "source").collect()
    }
    got = {r["source"]: r["split"] for r in sampling.group_split(df, "source").collect()}
    # default weights path consistent across frames (pure function of value)
    assert got == {f"site-{i % 7}": expect[f"site-{i % 7}"] for i in range(200)}


def test_split_leakage_audit_counts(spark):
    from sparkcrawl.operators import sampling

    rows = [
        (1, "a", "train", 10), (2, "a", "train", 20),
        (3, "b", "val", 5), (4, "b", "train", 5),  # b leaks
        (5, "c", "test", 7),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "g", "split", "n_tok"])
    out = {r["split"]: r.asDict() for r in
           sampling.split_leakage_audit(df, "g", size_col="n_tok").collect()}
    assert out["train"]["n_docs"] == 3 and out["train"]["n_groups"] == 2
    assert out["train"]["size_total"] == 35
    assert all(r["leaked_groups"] == 1 for r in out.values())
    assert out["test"]["doc_share"] == 0.2


def test_split_leakage_audit_group_split_is_leak_free(spark):
    from sparkcrawl.operators import sampling

    rows = [(i, f"d{i % 13}") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.split_leakage_audit(
        sampling.group_split(df, "source"), "source"
    ).collect()
    assert out and all(r["leaked_groups"] == 0 for r in out)


def _brute_budget(rows, budget):
    """Single-threaded reference: (quality DESC, id ASC) inclusive
    running-sum prefix <= budget."""
    out, acc = [], 0
    for did, q, n in sorted(rows, key=lambda r: (-r[1], r[0])):
        acc += n
        if acc > budget:
            break
        out.append((did, acc))
    return out


def test_token_budget_select_matches_bruteforce(spark):
    from sparkcrawl.operators import sampling

    # qualities engineered to straddle bucket boundaries and collide
    rows = [(i, round(((i * 37) % 101) / 100.0, 4), 5 + (i * 13) % 40)
            for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "quality", "n_tokens"])
    for budget in (0, 1, 37, 500, 2000, 10**9):
        got = sorted(
            (r["doc_id"], r["cum_tokens"])
            for r in sampling.token_budget_select(df, budget).collect()
        )
        assert got == sorted(_brute_budget(rows, budget)), budget


def test_token_budget_select_tie_break_and_bounds(spark):
    from sparkcrawl.operators import sampling

    # equal quality everywhere: order must fall back to doc_id ASC
    rows = [(i, 0.5, 10) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "quality", "n_tokens"])
    got = [r["doc_id"] for r in
           sampling.token_budget_select(df, 55).orderBy("cum_tokens").collect()]
    assert got == [0, 1, 2, 3, 4]  # 5 docs * 10 tokens = 50 <= 55, 6th is 60
    # quality exactly 0 and 1 must not fall outside the bucket range
    edge = spark.createDataFrame(
        [(1, 0.0, 3), (2, 1.0, 3)], ["doc_id", "quality", "n_tokens"])
    sel = sampling.token_budget_select(edge, 100).collect()
    assert {(r["doc_id"], r["cum_tokens"]) for r in sel} == {(2, 3), (1, 6)}


def test_token_budget_select_windows_are_partitioned(spark):
    """The global running sum must decompose into per-bucket windows —
    an unpartitioned Window (one task owning the whole corpus) in the
    plan is the 100TB failure mode this operator exists to avoid."""
    import contextlib
    import io

    from sparkcrawl.operators import sampling

    rows = [(i, ((i * 37) % 101) / 100.0, 5) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "quality", "n_tokens"])
    sel = sampling.token_budget_select(df, 200)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sel.explain("simple")
    p = buf.getvalue()
    win_lines = [ln for ln in p.splitlines() if "Window [" in ln]
    assert win_lines, "expected a Window operator"
    for ln in win_lines:
        assert "partitionBy" not in ln or True  # plan prints 3 bracket groups when partitioned
        assert ln.count("[") >= 3, f"unpartitioned Window: {ln}"
    assert "Cartesian" not in p and "BatchEvalPython" not in p
