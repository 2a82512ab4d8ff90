"""SURT (Sort-friendly URI Reordering Transform) urlkeys — the public
key format of CDX archive indexes (Internet Archive / Common Crawl).

``surt_urlkey`` turns ``http://www.Shop.Example.co.uk/a/b?b=2&a=1`` into
``uk,co,example,shop)/a/b?a=1&b=2``: scheme and fragment dropped,
host lowercased with a leading ``www.`` stripped, host labels REVERSED
and comma-joined (so one registered domain's records sort adjacently),
then ``)`` + path + the query string with parameters SORTED (so
param-order variants of one URL share a key).

Everything here is a pure column expression (regexp + split + reverse +
array_sort + array_join — all JVM-side, whole-stage-codegen'd): no UDF,
no Python in the hot path, safe to evaluate over 10^10 archived records.
The DuckDB oracle twin mirrors it with string_split/list_reverse/
list_sort (see ``__spark_entry__.oracle_sql()['cdx_urlkey']``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# capture groups: 1=host[:port], 2=path, 3=?query (fragment excluded)
_URL_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)([^?#]*)(\?[^#]*)?"


def surt_host(host: Column) -> Column:
    """Reversed comma-joined host labels, lowercased, leading www.
    stripped: ``www.Shop.Example.co.uk`` -> ``uk,co,example,shop``."""
    h = F.regexp_replace(F.lower(host), r"^www\.", "")
    return F.array_join(F.reverse(F.split(h, r"\.")), ",")


def surt_urlkey(url: Column) -> Column:
    """Full SURT urlkey for an absolute http(s) URL column."""
    hostport = F.regexp_extract(url, _URL_RE, 1)
    # strip port 80/443 (default-port variants share a key); any other
    # port re-attaches AFTER the reversed host (IA surt convention)
    hostport = F.regexp_replace(hostport, r":(80|443)$", "")
    host = F.regexp_replace(hostport, r":\d+$", "")
    port = F.regexp_extract(hostport, r"(:\d+)$", 1)
    path = F.lower(F.regexp_extract(url, _URL_RE, 2))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _URL_RE, 3)  # includes leading "?"
    sorted_query = F.when(
        query == "", F.lit("")
    ).otherwise(
        F.concat(
            F.lit("?"),
            F.array_join(
                F.array_sort(F.split(F.lower(F.substring(query, 2, 1 << 20)),
                                     "&")),
                "&",
            ),
        )
    )
    return F.concat(surt_host(host), port, F.lit(")"), path, sorted_query)
