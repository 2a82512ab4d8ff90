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


def rendezvous_weight(key: Column, queue_id: int) -> Column:
    """HRW weight of ``key`` for one queue: the first 15 hex chars of
    md5(key ':' queue_id) as a 60-bit bigint. Engine-stable (DuckDB:
    ``CAST(concat('0x', substr(md5(k || ':' || q), 1, 15)) AS BIGINT)``),
    like md5_bucket — never F.hash/Murmur3."""
    payload = F.concat(key, F.lit(f":{queue_id}"))
    return (
        F.conv(F.substring(F.md5(F.encode(payload, "UTF-8")), 1, 15), 16, 10)
        .cast("bigint")
    )


def rendezvous_queue(key: Column, num_queues: int) -> Column:
    """Rendezvous / highest-random-weight (HRW, Thaler & Ravishankar
    1998) queue pick: argmax over queue ids of rendezvous_weight.

    The scale property mod-N assignment lacks: growing the queue pool
    from Q to Q' relocates only the keys whose argmax lands on a NEW
    queue (expected fraction 1 - Q/Q'), and every relocated key moves
    TO a new queue — survivors never shuffle among themselves. On a
    10^10-URL frontier, resizing the worker pool under md5-mod rewrites
    ~all per-queue state; under HRW only the moved slice. Implemented
    as array_max over (weight, queue) structs — lexicographic struct
    max, so a (astronomically unlikely) weight tie breaks to the higher
    queue id identically in both engines. Pure codegen: no UDF, no
    shuffle, O(num_queues) column expressions per row.
    """
    pairs = F.array(*[
        F.struct(
            rendezvous_weight(key, q).alias("w"),
            F.lit(q).alias("q"),
        )
        for q in range(num_queues)
    ])
    return F.array_max(pairs)["q"].cast("int")


def salted_queue(domain: Column, url: Column, num_queues: int, salt_buckets: int) -> Column:
    """Q2-salted: sub-split hot domains for skewed window compute
    (north_rule: 'salted keys to defuse hot-host skew'). Politeness is
    re-established after the salted stage by re-slotting per domain (W3).
    """
    return (
        queue_for_domain(domain, num_queues) * salt_buckets
        + md5_bucket(url, salt_buckets)
    )
