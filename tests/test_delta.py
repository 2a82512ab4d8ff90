"""Crawl-generation diff: classification, host rollup, plan shape."""

from pyspark.sql import functions as F

from sparkcrawl.operators.delta import crawl_delta, host_delta_summary


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_crawl_delta_classification(spark):
    old = _docs(spark, [
        ("http://a.example/keep", "same"),
        ("http://a.example/edit", "v1"),
        ("http://b.example/gone", "bye"),
    ])
    new = _docs(spark, [
        ("http://a.example/keep", "same"),
        ("http://a.example/edit", "v2"),
        ("http://b.example/new", "hi"),
    ])
    got = {r["doc_id"]: r["change"]
           for r in crawl_delta(old, new).collect()}
    assert got == {
        "http://a.example/keep": "unchanged",
        "http://a.example/edit": "changed",
        "http://b.example/gone": "removed",
        "http://b.example/new": "added",
    }

    summary = {r["host"]: r for r in
               host_delta_summary(crawl_delta(old, new)).collect()}
    a = summary["a.example"]
    assert (a["n_added"], a["n_removed"], a["n_changed"],
            a["n_unchanged"]) == (0, 0, 1, 1)
    assert abs(a["churn"] - 0.5) < 1e-9
    b = summary["b.example"]
    assert (b["n_added"], b["n_removed"]) == (1, 1) and b["churn"] == 1.0


def test_crawl_delta_plan_hashes_before_join(spark):
    """Only (doc_id, md5) projections may shuffle — the text column
    must not survive into the join; classification adds no Window."""
    import contextlib, io

    old = _docs(spark, [("http://a.example/p", "x" * 1000)])
    new = _docs(spark, [("http://a.example/p", "y" * 1000)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        crawl_delta(old, new).explain("formatted")
    p = buf.getvalue()
    assert "Window" not in p
    assert "md5" in p
    # the join operates on hash projections: the raw text attribute is
    # pruned before any shuffle (only doc_id + md5 columns travel)
    import re
    for m in re.finditer(r"Exchange .*", p):
        assert "text" not in m.group(0)
