"""Prefix-sharded cuckoo filter — the deletion-capable seen-set variant.

membership.py names cuckoo filters (VLDB 2019 family) as the drop-in
upgrade behind the ShardedBloom interface when deletion or better space
efficiency is needed at 10^10 keys; this module ships it. Same contract
as :class:`sparkcrawl.operators.membership.ShardedBloom`:

  - ``build(hashes_df)`` via per-partition ``mapInPandas`` + driver
    merge (shards are prefix-disjoint across the sha1 keyspace, so the
    merge re-inserts only cross-partition collisions of the SAME shard),
  - ``might_contain_series`` is a vectorized numpy probe with NO false
    negatives for inserted keys (bloom-invariant #1 carries over:
    a miss is definitely-new, a hit goes to the authoritative anti-join),
  - plus ``delete_series`` — the operation blooms cannot do — for
    retiring ``gone`` URLs from the prefilter so their slots recycle.

Layout per shard: ``m`` buckets × 4 slots of uint16 fingerprints
(0 = empty); positions ``i1 = h1 % m``, ``i2 = i1 XOR (fphash % m)``
(partial-key cuckoo hashing, so eviction needs only the fingerprint);
insertion kicks up to ``MAX_KICKS`` before declaring the shard full —
the caller sizes capacity with the same knob as the bloom store.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SLOTS = 4
MAX_KICKS = 500


def _params(capacity: int) -> int:
    """Bucket count: pow2 ≥ capacity/(SLOTS*0.84) (84% is the classic
    4-slot cuckoo load ceiling; pow2 keeps index math branch-free)."""
    m = max(8, int(capacity / (SLOTS * 0.84)))
    return 1 << (m - 1).bit_length()


def _fingerprints(hashes_hex: pd.Series) -> np.ndarray:
    """16-bit nonzero fingerprint from sha1 hex chars 16:20."""
    fp = np.array([int(h[16:20], 16) for h in hashes_hex], dtype=np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _i1(hashes_hex: pd.Series, m: int) -> np.ndarray:
    return np.array([int(h[:8], 16) for h in hashes_hex], dtype=np.uint64) % np.uint64(m)


def _fp_hash(fp: np.ndarray, m: int) -> np.ndarray:
    # h(f) for partial-key cuckoo: odd multiplier mix, mod m (pow2)
    return (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(m)


def _alt(i: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    return (i.astype(np.uint64) ^ _fp_hash(fp, m)) % np.uint64(m)


class CuckooShard:
    def __init__(self, m: int, table: np.ndarray | None = None):
        self.m = m
        self.table = table if table is not None else np.zeros((m, SLOTS), dtype=np.uint16)

    def insert(self, i1: int, fp: int, rng_state: int = 0x9E3779B9) -> bool:
        """Insert one fingerprint; kicks on collision. Deterministic:
        the evicted slot rotates from a seeded counter, not random()."""
        i = int(i1)
        f = np.uint16(fp)
        for attempt in range(2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = f
                return True
            if attempt == 0:
                i = int(_alt(np.array([i], dtype=np.uint64), np.array([f]), self.m)[0])
        # both buckets full: kick
        counter = (int(f) * rng_state) & 0xFFFFFFFF
        for _ in range(MAX_KICKS):
            slot = counter % SLOTS
            counter = (counter * 1103515245 + 12345) & 0xFFFFFFFF
            f, self.table[i, slot] = self.table[i, slot], f
            i = int(_alt(np.array([i], dtype=np.uint64), np.array([f]), self.m)[0])
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = f
                return True
        return False  # shard beyond its load ceiling

    def contains(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        i2 = _alt(i1, fp, self.m)
        t = self.table
        f = fp[:, None]
        return ((t[i1.astype(np.int64)] == f).any(axis=1)
                | (t[i2.astype(np.int64)] == f).any(axis=1))

    def delete(self, i1: int, fp: int) -> bool:
        f = np.uint16(fp)
        for i in (int(i1), int(_alt(np.array([i1], dtype=np.uint64), np.array([f]), self.m)[0])):
            row = self.table[i]
            hit = np.flatnonzero(row == f)
            if hit.size:
                row[hit[0]] = 0
                return True
        return False


class ShardedCuckoo:
    """ShardedBloom-compatible membership filter with deletion."""

    def __init__(self, shards: dict[str, CuckooShard], m: int, depth: int):
        self.shards = shards
        self.m = m
        self.depth = depth

    @classmethod
    def build(
        cls,
        hashes: DataFrame,
        column: str = "url_hash",
        depth: int = 2,
        capacity_per_shard: int = 1 << 16,
    ) -> "ShardedCuckoo":
        m = _params(capacity_per_shard)
        depth_ = depth

        schema = T.StructType(
            [
                T.StructField("prefix", T.StringType()),
                T.StructField("table", T.BinaryType()),
            ]
        )

        def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            local: dict[str, CuckooShard] = {}
            for pdf in batches:
                col = pdf[column].dropna()
                if col.empty:
                    continue
                prefixes = col.str[:depth_]
                for prefix, grp in col.groupby(prefixes):
                    shard = local.setdefault(prefix, CuckooShard(m))
                    i1s = _i1(grp, m)
                    fps = _fingerprints(grp)
                    for i1, fp in zip(i1s, fps):
                        shard.insert(int(i1), int(fp))
            yield pd.DataFrame(
                {"prefix": list(local),
                 "table": [s.table.tobytes() for s in local.values()]}
            )

        rows = hashes.select(column).mapInPandas(_build, schema=schema).collect()
        shards: dict[str, CuckooShard] = {}
        for r in rows:
            incoming = np.frombuffer(r["table"], dtype=np.uint16).reshape(-1, SLOTS).copy()
            if r["prefix"] not in shards:
                shards[r["prefix"]] = CuckooShard(m, incoming)
            else:
                # same-shard tables from different partitions: re-insert
                # the smaller table's fingerprints (slot-exact union is
                # not defined for cuckoo tables, unlike bloom OR)
                target = shards[r["prefix"]]
                occ = np.argwhere(incoming != 0)
                for bi, si in occ:
                    f = int(incoming[bi, si])
                    # recover i1 candidates: bi is either i1 or i2; insert
                    # at bi — partial-key hashing keeps lookups correct
                    # because contains() probes bi and alt(bi, f)
                    target.insert(int(bi), f)
        return cls(shards, m, depth_)

    def might_contain_series(self, hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=bool)
        if not self.shards or hashes.empty:
            return pd.Series(out, index=hashes.index)
        prefixes = hashes.str[: self.depth]
        for prefix, grp in hashes.groupby(prefixes):
            shard = self.shards.get(prefix)
            if shard is None:
                continue
            res = shard.contains(_i1(grp, self.m), _fingerprints(grp))
            out[hashes.index.get_indexer(grp.index)] = res
        return pd.Series(out, index=hashes.index)

    def delete_series(self, hashes: pd.Series) -> int:
        """Remove fingerprints (e.g. gone URLs); returns deletions done.
        Only delete keys that were inserted — deleting a non-member can
        evict a colliding member's fingerprint (standard cuckoo caveat)."""
        n = 0
        prefixes = hashes.str[: self.depth]
        for prefix, grp in hashes.groupby(prefixes):
            shard = self.shards.get(prefix)
            if shard is None:
                continue
            for i1, fp in zip(_i1(grp, self.m), _fingerprints(grp)):
                n += bool(shard.delete(int(i1), int(fp)))
        return n
