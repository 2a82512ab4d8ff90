"""F1 sharded bloom: no false negatives; prefilter ∘ anti-join ≡ anti-join."""

import hashlib

from pyspark.sql import functions as F

from sparkcrawl.config import CrawlConfig
from sparkcrawl.operators.dedup import filter_unseen
from sparkcrawl.operators.membership import ShardedBloom


def _hashes(spark, start, n):
    urls = [f"http://h{i % 13}.example/p{i}" for i in range(start, start + n)]
    data = [(u, hashlib.sha1(u.encode()).hexdigest()) for u in urls]
    return spark.createDataFrame(data, ["url", "url_hash"])


def test_no_false_negatives(spark):
    seen = _hashes(spark, 0, 500)
    bloom = ShardedBloom.build(seen, depth=2, capacity_per_shard=1 << 12, fpp=0.01)
    tagged = bloom.prefilter(seen)
    assert tagged.filter(~F.col("maybe_seen")).count() == 0


def test_prefilter_equals_authoritative_antijoin(spark):
    cfg = CrawlConfig(use_bloom_prefilter=True)
    seen = _hashes(spark, 0, 400)
    candidates = _hashes(spark, 300, 400)  # 100 overlap, 300 new
    bloom = ShardedBloom.build(seen, depth=2, capacity_per_shard=1 << 12, fpp=0.05)
    with_bloom = {r["url_hash"] for r in filter_unseen(candidates, seen, cfg, bloom).collect()}
    no_bloom = {r["url_hash"] for r in filter_unseen(candidates, seen, cfg, None).collect()}
    assert with_bloom == no_bloom
    assert len(no_bloom) == 300


def test_prefix_sharding_matches_reference_scheme(spark):
    """The shard key is the digest prefix — UniqueUriFilter's own scheme."""
    seen = _hashes(spark, 0, 200)
    bloom = ShardedBloom.build(seen, depth=2, capacity_per_shard=1 << 10, fpp=0.01)
    prefixes = {r["url_hash"][:2] for r in seen.collect()}
    assert set(bloom.shards) == prefixes
