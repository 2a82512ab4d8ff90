"""Redirect-chain resolution via pointer doubling (operators/redirects.py)."""

from sparkcrawl.operators.redirects import resolve_redirect_chains


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["src"]: (r["final"], r["hops"], r["cycle"])
            for r in resolve_redirect_chains(df, **kw).collect()}


def test_chain_resolves_to_final_with_hops(spark):
    out = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert out["a"] == ("d", 3, False)
    assert out["b"] == ("d", 2, False)
    assert out["c"] == ("d", 1, False)


def test_cycle_flagged_not_looped(spark):
    out = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("x", "a")])
    # every node inside or pointing into the cycle is unresolved
    for s in ("a", "b", "c", "x"):
        assert out[s] == (None, None, True)


def test_chain_longer_than_max_hops_flagged(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(12)]  # 12-hop chain
    out = _resolve(spark, edges, max_hops=8)
    assert out["n11"] == ("n12", 1, False)
    assert out["n0"] == (None, None, True)   # 12 > max_hops


def test_pointer_doubling_round_count(spark):
    """8-hop chain resolves in exactly ceil(log2(8)) = 3 join rounds —
    the plan contains 3 + 1 (cycle-check) joins, not 8 sequential ones."""
    import contextlib
    import io

    edges = [(f"n{i}", f"n{i+1}") for i in range(8)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = resolve_redirect_chains(df, max_hops=8)
    rows = {r["src"]: r for r in out.collect()}
    assert rows["n0"]["final"] == "n8" and rows["n0"]["hops"] == 8
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    assert buf.getvalue().count("SortMergeJoin") + \
        buf.getvalue().count("BroadcastHashJoin") <= 5
