"""C1/F3/F4 canonicalization spec tests (SURVEY §2.8; hard-part #3)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkcrawl.functions.urlnorm import canonicalize_one


CASES = [
    # fragments dropped
    ("http://a.example/p#frag", None, "http://a.example/p"),
    # scheme+host lowercased, default port stripped
    ("HTTP://A.Example:80/P", None, "http://a.example/P"),
    ("https://a.example:443/x", None, "https://a.example/x"),
    ("http://a.example:8080/x", None, "http://a.example:8080/x"),
    # empty path -> /
    ("http://a.example", None, "http://a.example/"),
    # session ids stripped from query (F3)
    ("http://a.example/p?sid=123", None, "http://a.example/p"),
    ("http://a.example/p?a=1&PHPSESSID=x&b=2", None, "http://a.example/p?a=1&b=2"),
    # ;jsessionid path param stripped (F3)
    ("http://a.example/p;jsessionid=ABC", None, "http://a.example/p"),
    ("http://a.example/p;x=1;jsessionid=ABC/q", None, "http://a.example/p;x=1/q"),
    # empty params dropped, order preserved (F4)
    ("http://a.example/p?", None, "http://a.example/p"),
    ("http://a.example/p?b=2&a=1", None, "http://a.example/p?b=2&a=1"),
    ("http://a.example/p?a=&b=2", None, "http://a.example/p?b=2"),
    # relative resolution against base (C1)
    ("/page/5", "http://h.example/section/", "http://h.example/page/5"),
    ("page/5", "http://h.example/section/", "http://h.example/section/page/5"),
    ("../up", "http://h.example/a/b/", "http://h.example/a/up"),
    ("http://abs.example/x", "http://h.example/", "http://abs.example/x"),
    # unparseable (malformed port): None, never a raised exception —
    # wild-web hrefs must cost a dropped link, not a crashed task
    ("http://a.example:badport/x", None, None),
    ("http://a.example:00;jsessionid=A", None, None),
]


@pytest.mark.parametrize("url,base,expected", CASES)
def test_canonicalize_cases(url, base, expected):
    assert canonicalize_one(url, base) == expected


def test_fast_path_rejects_trailing_newline():
    """Regression (r2 ADVICE): '$' in the fast-path regex matches before
    a trailing newline, letting 'http://h/a\\n' through unchanged while
    canonicalize_one strips it — one logical URL, two url_hash values.
    The \\Z anchor must route such rows to the slow path."""
    import pandas as pd

    from sparkcrawl.functions.urlnorm import canonicalize_series

    urls = ["http://h.example/a\n", "http://h.example/a", "http://h.example/a\nx"]
    got = list(canonicalize_series(pd.Series(urls)))
    want = [canonicalize_one(u) for u in urls]
    assert got == want
    assert got[0] == "http://h.example/a"  # newline stripped, same hash key


@given(
    st.from_regex(r"http://[a-z]{1,8}\.example(:[0-9]{2,4})?/[a-zA-Z0-9/_.-]{0,20}(\?[a-z]=[0-9]&?[a-z]?=?[0-9]?)?(#[a-z0-9]{0,5})?", fullmatch=True)
)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(url):
    once = canonicalize_one(url)
    assert canonicalize_one(once) == once


@given(
    st.lists(
        st.from_regex(
            r"(https?|HTTP)://[a-zA-Z0-9.\-]{1,12}(\.example)?(:[0-9]{2,4})?"
            r"(/[a-zA-Z0-9/_.~%\-]{0,16}(;jsessionid=[A-Z]{1,4})?)?"
            r"(\?[a-z]{1,4}=[0-9]{0,3})?(#[a-z0-9]{0,4})?",
            fullmatch=True,
        ),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=150, deadline=None)
def test_vectorized_series_matches_scalar(urls):
    """The fast-path regex in canonicalize_series must NEVER change the
    result: batch output == per-row canonicalize_one, and the fused host
    extraction == urlsplit hostname of the canonical form."""
    import pandas as pd

    from sparkcrawl.functions.urlnorm import (
        canonicalize_series,
        host_of_canonical_series,
    )
    from urllib.parse import urlsplit

    s = pd.Series(urls)
    got = list(canonicalize_series(s))
    want = [canonicalize_one(u) for u in urls]
    assert got == want

    hosts = list(host_of_canonical_series(pd.Series(want)))
    expect = [
        (urlsplit(c).hostname or "").lower() if c is not None else None
        for c in want
    ]
    assert hosts == expect


def test_spark_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from sparkcrawl.functions.urlnorm import canonicalize_udf

    urls = [u for u, b, _ in CASES if b is None]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r["url"]: r["canon"] for r in df.withColumn("canon", canonicalize_udf(F.col("url"))).collect()}
    for u in urls:
        assert got[u] == canonicalize_one(u)
