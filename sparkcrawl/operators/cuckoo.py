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
from pyspark.sql import functions as F
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


def _merge_table_into(target: CuckooShard, incoming: np.ndarray) -> int:
    """Re-insert an incoming same-shard table's fingerprints into
    ``target`` (slot-exact union is not defined for cuckoo tables,
    unlike bloom OR). Each occupied position bi is either the key's i1
    or i2; inserting at bi keeps lookups correct because contains()
    probes bi and alt(bi, f). Returns how many inserts FAILED."""
    dropped = 0
    occ = np.argwhere(incoming != 0)
    for bi, si in occ:
        if not target.insert(int(bi), int(incoming[bi, si])):
            dropped += 1
    return dropped


class ShardedCuckoo:
    """ShardedBloom-compatible membership filter with deletion.

    ``dropped`` counts fingerprints LOST to shard overflow (insert
    failed after MAX_KICKS). A dropped fingerprint voids the advertised
    no-false-negative contract, so ``lossy`` filters refuse the
    miss-bypass: :meth:`prefilter` marks every row maybe_seen and the
    authoritative anti-join handles all of them — correctness degrades
    to "no prefilter", never to re-admitted URLs (r2 ADVICE)."""

    def __init__(self, shards: dict[str, CuckooShard], m: int, depth: int,
                 dropped: int = 0):
        self.shards = shards
        self.m = m
        self.depth = depth
        self.dropped = dropped

    @property
    def lossy(self) -> bool:
        return self.dropped > 0

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
                T.StructField("dropped", T.LongType()),
            ]
        )

        def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            local: dict[str, CuckooShard] = {}
            drops: dict[str, int] = {}
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
                        if not shard.insert(int(i1), int(fp)):
                            drops[prefix] = drops.get(prefix, 0) + 1
            yield pd.DataFrame(
                {"prefix": list(local),
                 "table": [s.table.tobytes() for s in local.values()],
                 "dropped": [drops.get(p, 0) for p in local]}
            )

        rows = hashes.select(column).mapInPandas(_build, schema=schema).collect()
        shards: dict[str, CuckooShard] = {}
        dropped = 0
        for r in rows:
            dropped += int(r["dropped"])
            incoming = np.frombuffer(r["table"], dtype=np.uint16).reshape(-1, SLOTS).copy()
            if r["prefix"] not in shards:
                shards[r["prefix"]] = CuckooShard(m, incoming)
            else:
                # same-shard tables from different partitions
                dropped += _merge_table_into(shards[r["prefix"]], incoming)
        return cls(shards, m, depth_, dropped=dropped)

    def prefilter(self, candidates: DataFrame, column: str = "url_hash") -> DataFrame:
        """Tag candidates with ``maybe_seen`` (ShardedBloom.prefilter
        twin). A lossy filter marks EVERY row maybe_seen: the bypass is
        only sound with zero dropped fingerprints."""
        spark = candidates.sparkSession
        if self.lossy:
            return candidates.withColumn("maybe_seen", F.lit(True))
        bc = spark.sparkContext.broadcast(
            {"shards": {p: s.table.tobytes() for p, s in self.shards.items()},
             "m": self.m, "depth": self.depth}
        )

        @F.pandas_udf(T.BooleanType())
        def _probe(hashes: pd.Series) -> pd.Series:
            st = bc.value
            filt = ShardedCuckoo(
                {
                    p: CuckooShard(
                        st["m"],
                        np.frombuffer(b, dtype=np.uint16).reshape(-1, SLOTS).copy(),
                    )
                    for p, b in st["shards"].items()
                },
                st["m"], st["depth"],
            )
            return filt.might_contain_series(hashes)

        return candidates.withColumn("maybe_seen", _probe(F.col(column)))

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


class CuckooStore:
    """Cross-superstep persistence of the cuckoo seen-set shards — the
    deletion-capable twin of :class:`membership.BloomStore` (M4), wired
    behind ``cfg.membership_kind = "cuckoo"``.

    Same commit protocol (write-temp-then-rename npz blob), same
    incremental-update contract (fold only NEW hashes per superstep),
    plus:

      - ``delete(hashes)`` retires fingerprints (e.g. ``gone`` URLs) so
        their slots recycle — the operation blooms cannot do;
      - per-channel superstep tags in the blob make update/delete
        IDEMPOTENT under kill/replay. Replaying an insert would only
        waste slots (duplicate copies), but replaying a DELETE is the
        dangerous one: the second delete can remove a colliding live
        key's fingerprint copy -> false negative -> re-admitted URL.
        The tag skips already-applied steps instead.
      - overflow is surfaced, never silent: update/delete RAISE if any
        fingerprint was dropped (capacity_per_shard is the config knob;
        a lossy persistent seen-set prefilter is a misconfiguration).
    """

    def __init__(self, root: str, depth: int = 2,
                 capacity_per_shard: int = 1 << 16, fpp: float = 0.01):
        import os

        self.dir = os.path.join(root, "cuckoo")
        os.makedirs(self.dir, exist_ok=True)
        self.depth = depth
        self.m = _params(capacity_per_shard)
        self.capacity = capacity_per_shard
        # fpp accepted for BloomStore interface parity; a 16-bit-fp
        # 4-slot cuckoo filter's FP rate is ~2*SLOTS/2^16 < 0.1% fixed.
        self.fpp = fpp

    def _path(self) -> str:
        import os

        return os.path.join(self.dir, "shards.npz")

    def _load_raw(self) -> tuple[dict[str, np.ndarray], dict] | None:
        import json
        import os

        if not os.path.exists(self._path()):
            return None
        with np.load(self._path()) as z:
            meta = {}
            shards = {}
            for p in z.files:
                if p == "__meta__":
                    meta = json.loads(str(z[p][0]))
                else:
                    shards[p] = z[p].copy()
        return shards, meta

    def _save(self, shards: dict[str, np.ndarray], meta: dict) -> None:
        import json
        import os
        import uuid

        tmp = self._path() + f".tmp.{uuid.uuid4().hex}.npz"
        np.savez(tmp, __meta__=np.array([json.dumps(meta)]), **shards)
        os.replace(tmp, self._path())

    def load(self) -> ShardedCuckoo | None:
        raw = self._load_raw()
        if raw is None:
            return None
        shards, meta = raw
        return ShardedCuckoo(
            {p: CuckooShard(self.m, a.reshape(-1, SLOTS).copy()) for p, a in shards.items()},
            self.m, self.depth, dropped=int(meta.get("dropped", 0)),
        )

    def _applied(self, meta: dict, channel: str, superstep: int | None) -> bool:
        return superstep is not None and meta.get(channel) == superstep

    def update(self, new_hashes: DataFrame, column: str = "url_hash",
               channel: str = "update", superstep: int | None = None) -> ShardedCuckoo:
        """Fold only the NEW hashes into the persisted shards; atomic
        commit; idempotent per (channel, superstep); raises on overflow."""
        raw = self._load_raw()
        shards, meta = raw if raw is not None else ({}, {})
        if self._applied(meta, channel, superstep):
            return self.load()
        delta = ShardedCuckoo.build(
            new_hashes, column=column, depth=self.depth,
            capacity_per_shard=self.capacity,
        )
        dropped = delta.dropped
        for prefix, shard in delta.shards.items():
            if prefix not in shards:
                shards[prefix] = shard.table
            else:
                target = CuckooShard(self.m, shards[prefix].reshape(-1, SLOTS).copy())
                dropped += _merge_table_into(target, shard.table)
                shards[prefix] = target.table
        if dropped:
            raise RuntimeError(
                f"cuckoo seen-set overflow: {dropped} fingerprints dropped — "
                f"raise bloom_capacity_per_shard (now {self.capacity}) or "
                f"shard_prefix_depth (now {self.depth})"
            )
        if superstep is not None:
            meta[channel] = superstep
        self._save(shards, meta)
        return self.load()

    def delete(self, gone_hashes: DataFrame, column: str = "url_hash",
               superstep: int | None = None) -> int:
        """Retire fingerprints of GONE urls so their slots recycle.

        Only keys previously inserted may be deleted (standard cuckoo
        caveat — deleting a non-member can evict a colliding member's
        copy); the engine only passes frontier rows, which were all
        inserted at discovery.

        Shard-local DISTRIBUTED delete (same hash-prefix layout as
        ``ShardedCuckoo.build``): the affected prefixes' CURRENT tables
        ship to executors via broadcast, gone hashes hash-repartition
        on their prefix so each prefix's deletions happen in exactly
        one task (two tasks mutating copies of one table could not be
        merged), and only the UPDATED per-prefix tables come back —
        the url hashes themselves never cross to the driver. What the
        driver collects is one (prefix, table) row per touched shard,
        the same bounded volume as build()'s collect.

        Returns deletions applied (0 on an already-applied replay)."""
        raw = self._load_raw()
        if raw is None:
            return 0
        shards, meta = raw
        if self._applied(meta, "delete", superstep):
            return 0
        spark = gone_hashes.sparkSession
        depth_, m_ = self.depth, self.m
        clean = gone_hashes.select(F.col(column).alias("h")).filter(
            F.col("h").isNotNull())
        # prefix-only collect (<= 16^depth tiny strings): broadcast just
        # the shards this batch actually touches
        touched = {
            r[0] for r in clean.select(
                F.substring("h", 1, depth_).alias("p")).distinct().collect()
        } & set(shards)
        n = 0
        if touched:
            bc = spark.sparkContext.broadcast(
                {p: shards[p].tobytes() for p in touched})

            schema = T.StructType([
                T.StructField("prefix", T.StringType()),
                T.StructField("table", T.BinaryType()),
                T.StructField("deleted", T.LongType()),
            ])

            def _delete(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                pending: dict[str, list[pd.Series]] = {}
                for pdf in batches:
                    col = pdf["h"]
                    for prefix, grp in col.groupby(col.str[:depth_]):
                        if prefix in bc.value:
                            pending.setdefault(prefix, []).append(grp)
                out = {"prefix": [], "table": [], "deleted": []}
                for prefix, groups in pending.items():
                    shard = CuckooShard(
                        m_,
                        np.frombuffer(bc.value[prefix], dtype=np.uint16)
                        .reshape(-1, SLOTS).copy(),
                    )
                    deleted = 0
                    hs = pd.concat(groups).sort_values(kind="stable")
                    for i1, fp in zip(_i1(hs, m_), _fingerprints(hs)):
                        deleted += bool(shard.delete(int(i1), int(fp)))
                    out["prefix"].append(prefix)
                    out["table"].append(shard.table.tobytes())
                    out["deleted"].append(deleted)
                yield pd.DataFrame(out)

            rows = (
                clean.repartition(F.substring("h", 1, depth_))
                .mapInPandas(_delete, schema=schema)
                .collect()
            )
            for r in rows:
                n += int(r["deleted"])
                shards[r["prefix"]] = np.frombuffer(
                    r["table"], dtype=np.uint16).copy()
        if superstep is not None:
            meta["delete"] = superstep
        self._save(shards, meta)
        return n
