"""URL-level quality filtering (RefinedWeb-style pre-fetch gate)."""

from pyspark.sql import functions as F


def test_url_quality_filter_rules(spark):
    from sparkcrawl.operators.urlfilter import url_quality_filter

    rows = [
        (1, "http://good.example.com/page"),
        (2, "http://x.blocked.example/page"),          # blocklisted domain
        (3, "http://good.example.com/casino/slots"),   # keyword hit
        (4, "http://1234567890123.ex/p"),              # digit-heavy host
        (5, "http://good.example.com/p?" + "&".join(f"k{i}=1" for i in range(12))),
        (6, "http://good.example.com/" + "p" * 600),   # overlong
    ]
    bl = spark.createDataFrame([("blocked.example",)], ["domain"])
    out = {
        r["id"]: r
        for r in url_quality_filter(
            spark.createDataFrame(rows, ["id", "url"]), blocklist=bl
        ).collect()
    }
    assert out[1]["keep"]
    assert out[2]["blocked"] and not out[2]["keep"]
    assert out[3]["kw_hits"] == 1 and not out[3]["keep"]
    assert out[4]["host_digit_frac"] > 0.5 and not out[4]["keep"]
    assert out[5]["n_params"] == 12 and not out[5]["keep"]
    assert out[6]["url_len"] > 512 and not out[6]["keep"]
    # registered domain feeds the blocklist join (not the raw host)
    assert out[2]["registered_domain"] == "blocked.example"


def test_url_quality_filter_no_blocklist(spark):
    from sparkcrawl.operators.urlfilter import url_quality_filter

    urls = spark.createDataFrame([(1, "http://a.example.com/x")], ["id", "url"])
    row = url_quality_filter(urls).collect()[0]
    assert not row["blocked"] and row["keep"]


def test_url_quality_filter_blocklist_is_broadcast(spark):
    """The blocklist join must be a broadcast, never a shuffle of the
    URL table onto a tiny dim."""
    import contextlib
    import io

    from sparkcrawl.operators.urlfilter import url_quality_filter

    urls = spark.range(1000).select(
        F.concat(F.lit("http://h"), F.col("id").cast("string"),
                 F.lit(".example.com/p")).alias("url")
    )
    bl = spark.createDataFrame([("blocked.example",)], ["domain"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        url_quality_filter(urls, blocklist=bl).explain("simple")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
