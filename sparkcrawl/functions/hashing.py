"""URL hashing + queue assignment (C2, Q2) — pure column expressions.

C2: the reference hashes URLs with ``hashlib.new('sha1')``
(src/spyder/core/uri_uniq.py::UniqueUriFilter — SURVEY C2). Spark's
``F.sha1`` over UTF-8 bytes produces the identical 40-char hex digest
(property-tested in tests/test_hashing.py), so the seen-set is
JVM-side and codegen'd — no Python in the hot dedup path.

Q2: the reference assigns hosts to queues via
``HostBasedQueueAssignment`` (src/spyder/core/queueassignment.py).
We use the first 8 hex chars of md5(domain) mod num_queues: stable
across engines (DuckDB oracle reproduces it with
``CAST(concat('0x', substr(md5(d),1,8)) AS BIGINT) % nq``), unlike
Spark's Murmur3 ``F.hash``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_sha1(url: Column) -> Column:
    """40-char sha1 hex of the canonical URL — identical to hashlib.sha1."""
    return F.sha1(F.encode(url, "UTF-8"))


def md5_bucket(col: Column, num_buckets: int) -> Column:
    """Deterministic cross-engine bucket id in [0, num_buckets)."""
    return (
        F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 8), 16, 10)
        .cast("bigint")
        % num_buckets
    ).cast("int")


def queue_for_domain(domain: Column, num_queues: int) -> Column:
    """Q2: registered_domain -> queue id."""
    return md5_bucket(domain, num_queues)


def salted_queue(domain: Column, url: Column, num_queues: int, salt_buckets: int) -> Column:
    """Q2-salted: sub-split hot domains for skewed window compute
    (north_rule: 'salted keys to defuse hot-host skew'). Politeness is
    re-established after the salted stage by re-slotting per domain (W3).
    """
    return (
        queue_for_domain(domain, num_queues) * salt_buckets
        + md5_bucket(url, salt_buckets)
    )
