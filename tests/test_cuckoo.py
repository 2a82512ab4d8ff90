"""Cuckoo-filter membership: no false negatives, deletion, FP sanity."""

import hashlib

import pandas as pd
import pytest

from sparkcrawl.operators.cuckoo import ShardedCuckoo


def _hashes(n, salt=""):
    return [hashlib.sha1(f"{salt}u{i}".encode()).hexdigest() for i in range(n)]


@pytest.fixture(scope="module")
def built(spark):
    keys = _hashes(4000)
    df = spark.createDataFrame([(h,) for h in keys], ["url_hash"])
    # several partitions: exercises the per-partition build + driver merge
    return keys, ShardedCuckoo.build(df.repartition(6), depth=2,
                                     capacity_per_shard=1 << 12)


def test_no_false_negatives(built):
    keys, ck = built
    probe = ck.might_contain_series(pd.Series(keys))
    assert bool(probe.all()), "cuckoo filter must never miss an inserted key"


def test_false_positive_rate_sane(built):
    _, ck = built
    other = _hashes(4000, salt="different")
    fp = ck.might_contain_series(pd.Series(other)).mean()
    # 16-bit fingerprints, 2 buckets x 4 slots: theoretical FPP ~ 8/2^16
    assert fp < 0.01, fp


def test_delete_then_miss(built):
    keys, ck = built
    victims = pd.Series(keys[:200])
    assert ck.delete_series(victims) == 200
    after = ck.might_contain_series(victims)
    # deleted keys may still FP against other members, but the bulk must miss
    assert after.mean() < 0.05
    # everyone else still has NO false negatives
    rest = pd.Series(keys[200:])
    assert bool(ck.might_contain_series(rest).all())


def test_interface_matches_bloom(built):
    """Drop-in claim (membership.py): same probe surface as ShardedBloom."""
    from sparkcrawl.operators.membership import ShardedBloom

    for method in ("might_contain_series",):
        assert callable(getattr(ShardedCuckoo, method))
        assert callable(getattr(ShardedBloom, method))
