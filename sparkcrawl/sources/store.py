"""Snapshot-atomic table store — T5, S2, S3, J3 (SURVEY §1.4, §2.10).

The reference persists crawl state in SQLite with transactional
checkpoints (src/spyder/core/sqlitequeues.py::SQLiteStore.checkpoint).
The engine's production target is Iceberg (atomic snapshots, MERGE
INTO); this sandbox has no Iceberg jars (SURVEY §0), so
:class:`ParquetManifestStore` honestly emulates the part that matters
for resumability:

  - every table is an append-only list of parquet *delta* dirs,
  - a ``manifest.json`` names the current snapshot = exact delta list,
  - commits are write-temp-then-``os.replace`` (atomic on POSIX),
  - a killed run resumes from the last committed manifest; orphan
    delta dirs from the killed superstep are simply never referenced.

Frontier reads resolve keep-latest-per-url_hash with a window over the
delta sequence (W4) — the Parquet-fallback equivalent of Iceberg
``MERGE INTO``; :meth:`FrontierTable.compact` bounds read amplification.

At 10^10 rows the same layout holds: deltas are partitioned parquet,
the keep-latest window shuffles on url_hash (uniform sha1 → no skew),
and compaction is an ordinary Spark job. Swapping IcebergStore in
changes only this module (FrontierStore abstraction, SURVEY §7 M7).
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


class ParquetManifestStore:
    """Manifest-tracked append-only parquet table with atomic commits."""

    def __init__(self, root: str, name: str):
        self.root = os.path.join(root, name)
        self.name = name
        os.makedirs(os.path.join(self.root, "data"), exist_ok=True)
        if not os.path.exists(self._manifest_path):
            self._write_manifest({"deltas": [], "meta": {}, "version": 0, "next_seq": 0})

    # -- manifest plumbing ------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _read_manifest(self) -> dict:
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)  # atomic commit (T5)

    # -- public API --------------------------------------------------------
    def append(self, df: DataFrame, meta: dict | None = None,
               partition_by: tuple[str, ...] = (),
               replace_tag: str | None = None) -> str:
        """Write a delta dir and atomically commit it to the manifest.
        Returns the new snapshot version id.

        ``replace_tag`` makes the commit idempotent per tag: any existing
        delta carrying the same tag is dropped from the manifest in the
        SAME atomic commit. Append-only tables (documents, fetch_log) tag
        deltas by superstep so a kill between their append and the
        superstep's checkpoint does not duplicate rows when resume()
        replays the superstep (the frontier needs no tag — keep-latest
        reads are already idempotent per url_hash)."""
        if partition_by and df.isEmpty():
            # a zero-row partitioned write emits no parquet files at all
            # (unreadable dir); an empty delta contributes nothing — commit
            # only the metadata.
            manifest = self._read_manifest()
            manifest["version"] += 1
            if meta:
                manifest["meta"].update(meta)
            self._write_manifest(manifest)
            return f"{self.name}-v{manifest['version']}"
        manifest = self._read_manifest()
        # seq is manifest-monotonic (NOT len(deltas)): compaction shrinks the
        # delta list, and a reused lower seq would let keep-latest reads
        # resurrect compacted rows over newer appends.
        seq = manifest["next_seq"]
        manifest["next_seq"] = seq + 1
        delta_dir = os.path.join(self.root, "data", f"delta-{seq:06d}-{uuid.uuid4().hex[:8]}")
        writer = df.withColumn("_delta_seq", F.lit(seq)).write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(delta_dir)
        if replace_tag is not None:
            # drop superseded deltas and commit the replacement atomically;
            # the orphaned dirs are never referenced again (same guarantee
            # as a killed run's uncommitted delta dirs)
            manifest["deltas"] = [
                d for d in manifest["deltas"] if d.get("tag") != replace_tag
            ]
        entry = {"path": delta_dir, "seq": seq}
        if replace_tag is not None:
            entry["tag"] = replace_tag
        manifest["deltas"].append(entry)
        manifest["version"] += 1
        if meta:
            manifest["meta"].update(meta)
        self._write_manifest(manifest)
        return f"{self.name}-v{manifest['version']}"

    def snapshot(self) -> list[dict]:
        """The current committed delta list — a durable snapshot pointer
        (compaction only rewrites the manifest; superseded dirs stay on
        disk until a :meth:`vacuum` maintenance pass, which excludes any
        externally pinned snapshot), so a checkpoint can pin the exact
        table state it saw (Iceberg snapshot-id analog)."""
        return [dict(d) for d in self._read_manifest()["deltas"]]

    def read_raw(self, spark: SparkSession,
                 snapshot: list[dict] | None = None) -> DataFrame | None:
        """Union of all committed deltas (with ``_delta_seq``).

        Each delta is read as its own table root (multi-root reads break
        Spark's hive-partition discovery) and unioned by name — the
        delta list is bounded by the compaction cadence. ``snapshot``
        (from :meth:`snapshot`) time-travels the read to that exact
        delta list — T5: a replayed superstep must see the table as the
        last checkpoint saw it, not the killed attempt's half-state.
        """
        deltas = snapshot if snapshot is not None else self._read_manifest()["deltas"]
        paths = [d["path"] for d in deltas]
        if not paths:
            return None
        dfs = [spark.read.parquet(p) for p in paths]
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out

    def replace_all(self, df: DataFrame, meta: dict | None = None,
                    partition_by: tuple[str, ...] = ()) -> str:
        """Compaction commit: next snapshot = exactly this data."""
        manifest = self._read_manifest()
        seq = manifest["next_seq"]
        manifest["next_seq"] = seq + 1
        delta_dir = os.path.join(self.root, "data", f"compact-{seq:06d}-{uuid.uuid4().hex[:8]}")
        writer = df.withColumn("_delta_seq", F.lit(seq)).write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(delta_dir)
        manifest["deltas"] = [{"path": delta_dir, "seq": seq}]
        manifest["version"] += 1
        if meta:
            manifest["meta"].update(meta)
        self._write_manifest(manifest)
        return f"{self.name}-v{manifest['version']}"

    def vacuum(self, keep_paths: frozenset[str] | set[str] = frozenset(),
               min_age_s: float = 0.0) -> list[str]:
        """Delete delta/compact dirs no longer referenced by the current
        manifest — the Iceberg expire_snapshots/remove_orphan_files
        analog for this store. Compaction and tag-replacement only
        rewrite the MANIFEST; their superseded dirs stay on disk until
        this maintenance call reclaims them.

        ``keep_paths`` protects externally pinned snapshots (a
        checkpoint's as-of delta list — see :func:`vacuum_workdir`);
        ``min_age_s`` skips dirs younger than the horizon, the standard
        guard against racing an in-flight append whose atomic manifest
        commit has not landed yet. Single-writer tables (this engine)
        can vacuum with 0 between supersteps.

        Returns the removed directory paths.
        """
        import shutil
        import time as _time

        referenced = {d["path"] for d in self._read_manifest()["deltas"]}
        referenced |= set(keep_paths)
        data_root = os.path.join(self.root, "data")
        removed: list[str] = []
        now = _time.time()
        for name in sorted(os.listdir(data_root)):
            path = os.path.join(data_root, name)
            if path in referenced or not os.path.isdir(path):
                continue
            if now - os.path.getmtime(path) < min_age_s:
                continue
            shutil.rmtree(path)
            removed.append(path)
        return removed

    @property
    def meta(self) -> dict:
        return self._read_manifest()["meta"]

    @property
    def version(self) -> int:
        return self._read_manifest()["version"]

    @property
    def num_deltas(self) -> int:
        return len(self._read_manifest()["deltas"])


class FrontierTable:
    """The frontier with MERGE-INTO (keep-latest) read semantics (J3/W4).

    Deltas are hive-partitioned by ``queue`` (SURVEY §1.4: frontier
    bucketed by queue): at 10^10 rows a scheduler that only activates a
    subset of queues prunes whole partitions at scan time, and per-queue
    parquet min/max stats on next_date prune cold files.
    """

    def __init__(self, root: str):
        self.store = ParquetManifestStore(root, "frontier")

    def merge(self, updates: DataFrame, superstep: int,
              tag: str | None = None) -> str:
        """J3: append requeued + newly-discovered rows; latest delta wins
        per url_hash at read time. ``tag`` makes the merge idempotent per
        superstep (a replayed superstep replaces its killed attempt's
        delta instead of shadowing it)."""
        part = ("queue",) if "queue" in updates.columns else ()
        return self.store.append(
            updates, meta={"superstep": superstep}, partition_by=part,
            replace_tag=tag,
        )

    def read(self, spark: SparkSession, queues: list[int] | None = None,
             snapshot: list[dict] | None = None) -> DataFrame | None:
        """Keep-latest frontier view; ``queues`` prunes partitions.

        Arbitrary predicates can NOT be pushed below the keep-latest
        window (an old delta's row may satisfy them while the newest
        does not — pre-filtering would resurrect stale state). ``queue``
        is the exception: it is a pure function of the URL's domain,
        identical in every version of a row, so filtering each delta
        BEFORE the merge is safe and hits the hive partition dirs
        (PartitionFilters in the scan — verified in tests/test_store.py).
        """
        raw = self.store.read_raw(spark, snapshot=snapshot)
        if raw is None:
            return None
        if queues is not None:
            raw = raw.filter(F.col("queue").isin(queues))
        w = W.partitionBy("url_hash").orderBy(F.desc("_delta_seq"))
        return (
            raw.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_delta_seq")
        )

    def compact(self, spark: SparkSession) -> None:
        current = self.read(spark)
        if current is not None:
            part = ("queue",) if "queue" in current.columns else ()
            self.store.replace_all(current, partition_by=part)

    def seen_keys(self, spark: SparkSession,
                  snapshot: list[dict] | None = None) -> DataFrame | None:
        """The URL-seen set IS the frontier key set (reference: every URL
        entering the frontier was added to UniqueUriFilter)."""
        raw = self.store.read_raw(spark, snapshot=snapshot)
        if raw is None:
            return None
        return raw.select("url_hash").distinct()


class QueueStateTable:
    """A2 cross-superstep budget remainder: (queue, carry), keep-latest
    per queue. Config-cardinality (≤ num_queues rows per snapshot) — the
    table exists so scheduler state lives in tables like everything else
    (T3), surviving kill/resume."""

    def __init__(self, root: str):
        self.store = ParquetManifestStore(root, "queue_state")

    def merge(self, state: DataFrame, superstep: int) -> str:
        return self.store.append(
            state, meta={"superstep": superstep},
            replace_tag=f"superstep-{superstep}",
        )

    def read(self, spark: SparkSession,
             snapshot: list[dict] | None = None) -> DataFrame | None:
        raw = self.store.read_raw(spark, snapshot=snapshot)
        if raw is None:
            return None
        w = W.partitionBy("queue").orderBy(F.desc("_delta_seq"))
        return (
            raw.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_delta_seq")
            .filter(F.col("carry") > 0)
        )


class CheckpointLog:
    """T5 checkpoints: one committed row per superstep; resume reads the
    last row (analog: frontier.checkpoint() committing the SQLite txn)."""

    def __init__(self, root: str):
        self.store = ParquetManifestStore(root, "checkpoints")

    def commit(
        self,
        spark: SparkSession,
        superstep: int,
        virtual_time: datetime,
        snapshot_id: str,
        counters: dict[str, int],
        per_partition_counts: dict[str, int],
        frontier_snapshot: list[dict] | None = None,
        queue_state_snapshot: list[dict] | None = None,
    ) -> None:
        from sparkcrawl.schemas import CHECKPOINT_SCHEMA

        row = [
            (
                superstep,
                virtual_time,
                snapshot_id,
                counters.get("urls_seen", 0),
                counters.get("fetched", 0),
                counters.get("discovered", 0),
                {str(k): int(v) for k, v in per_partition_counts.items()},
            )
        ]
        df = spark.createDataFrame(row, schema=CHECKPOINT_SCHEMA)
        meta = {
            "last_superstep": superstep,
            "last_virtual_time": virtual_time.isoformat(),
            "last_snapshot": snapshot_id,
        }
        if frontier_snapshot is not None:
            # pin the exact frontier delta list this checkpoint saw, so a
            # replayed superstep time-travels its reads (T5 exactly-once)
            meta["last_frontier_snapshot"] = frontier_snapshot
        if queue_state_snapshot is not None:
            meta["last_queue_state_snapshot"] = queue_state_snapshot
        self.store.append(df, meta=meta)

    def last(self) -> dict | None:
        meta = self.store.meta
        if "last_superstep" not in meta:
            return None
        return {
            "superstep": int(meta["last_superstep"]),
            "virtual_time": datetime.fromisoformat(meta["last_virtual_time"]),
            "snapshot_id": meta["last_snapshot"],
            "frontier_snapshot": meta.get("last_frontier_snapshot"),
            "queue_state_snapshot": meta.get("last_queue_state_snapshot"),
        }

    def read(self, spark: SparkSession) -> DataFrame | None:
        raw = self.store.read_raw(spark)
        return None if raw is None else raw.drop("_delta_seq")


class FetchLogTable:
    """Append-only ordered fetch log — the S6 sink's per-outcome callbacks
    re-expressed as one table with an outcome column (SURVEY S6/A3).
    Also the crawl-order parity surface (golden/crawl_order.json)."""

    def __init__(self, root: str):
        self.store = ParquetManifestStore(root, "fetch_log")

    def append(self, log: DataFrame, superstep: int) -> str:
        # tagged: a superstep replayed after a mid-superstep kill replaces
        # (not duplicates) its rows — keeps the crawl-order parity surface
        # exact under kill/resume (T5)
        return self.store.append(
            log, meta={"superstep": superstep},
            replace_tag=f"superstep-{superstep}",
        )

    def read(self, spark: SparkSession) -> DataFrame | None:
        raw = self.store.read_raw(spark)
        return None if raw is None else raw.drop("_delta_seq")


class DocumentsTable:
    """Append-only interleaved-documents sink (input_hint schema)."""

    def __init__(self, root: str):
        self.store = ParquetManifestStore(root, "documents")

    def append(self, docs: DataFrame, superstep: int) -> str:
        # tagged: superstep replay replaces instead of duplicating (T5)
        return self.store.append(
            docs, meta={"superstep": superstep},
            replace_tag=f"superstep-{superstep}",
        )

    def read(self, spark: SparkSession) -> DataFrame | None:
        raw = self.store.read_raw(spark)
        return None if raw is None else raw.drop("_delta_seq")

    def content_hashes(
        self, spark: SparkSession, exclude_superstep: int | None = None
    ) -> DataFrame | None:
        """The stored ``content_hash`` column (present when the engine
        runs with cfg.dedup_documents) — a COLUMN scan of the corpus,
        never a recompute of old spans. ``exclude_superstep`` drops that
        superstep's tagged delta from the read: a REPLAYED superstep
        must not see its own killed attempt's rows as "prior content"
        (it would dedup everything away and then replace the delta with
        nothing — T5)."""
        deltas = self.store.snapshot()
        if exclude_superstep is not None:
            deltas = [
                d for d in deltas
                if d.get("tag") != f"superstep-{exclude_superstep}"
            ]
        raw = self.store.read_raw(spark, snapshot=deltas)
        if raw is None or "content_hash" not in raw.columns:
            return None  # empty table, or written before the flag was on
        return raw.select("content_hash")


class LinkEdgesTable:
    """Append-only host->host link graph (cfg.record_link_graph): one
    aggregated (src_host, dst_host, n_links) row per pair per
    superstep. Superstep-tagged like fetch_log, so a replayed
    superstep replaces its killed attempt's delta (T5). Input to the
    offline PageRank priority refresh (plans/rank.py)."""

    def __init__(self, root: str):
        self.store = ParquetManifestStore(root, "link_edges")

    def append(self, edges: DataFrame, superstep: int) -> str:
        return self.store.append(
            edges, meta={"superstep": superstep},
            replace_tag=f"superstep-{superstep}",
        )

    def read(self, spark: SparkSession) -> DataFrame | None:
        raw = self.store.read_raw(spark)
        return None if raw is None else raw.drop("_delta_seq")


class TrapRulesTable:
    """Detected crawler-trap templates (operators/traps.py): one
    (host_template, fanout) row per suppressed template. Each refresh
    REPLACES the rule set (replace_tag="current") — rules are derived
    state, recomputable from the frontier, so keep-latest semantics
    are per-table, not per-row. Consumed as a broadcast anti-join by
    the superstep's candidate gate (cfg.filter_traps)."""

    def __init__(self, root: str):
        self.store = ParquetManifestStore(root, "trap_rules")

    def replace(self, rules: DataFrame, refresh_id: int = 0) -> str:
        return self.store.append(
            rules, meta={"refresh_id": refresh_id}, replace_tag="current"
        )

    def read(self, spark: SparkSession) -> DataFrame | None:
        raw = self.store.read_raw(spark)
        return None if raw is None else raw.drop("_delta_seq")


class RobotsTable:
    """Live-discovered robots.txt rules (cfg.fetch_robots): ROBOTS_SCHEMA
    rows + a fetched_superstep column. Append is superstep-tagged (T5:
    a replayed superstep replaces its killed attempt's rules); read
    keeps each host's LATEST generation only, so a future robots
    re-fetch (expiry) cleanly supersedes the old rule set."""

    def __init__(self, root: str):
        self.store = ParquetManifestStore(root, "robots_rules")

    def append(self, rules: DataFrame, superstep: int) -> str:
        return self.store.append(
            rules, meta={"superstep": superstep},
            replace_tag=f"robots-superstep-{superstep}",
        )

    def read(self, spark: SparkSession) -> DataFrame | None:
        raw = self.store.read_raw(spark)
        if raw is None:
            return None
        raw = raw.drop("_delta_seq")
        latest = raw.groupBy("host").agg(
            F.max("fetched_superstep").alias("fetched_superstep")
        )
        return raw.join(latest, ["host", "fetched_superstep"])


def vacuum_workdir(workdir: str, min_age_s: float = 0.0) -> dict[str, int]:
    """Reclaim superseded delta dirs across EVERY table in a crawl
    workdir, protecting the paths the last checkpoint pinned for as-of
    replay (T5): a mid-superstep kill must still be able to time-travel
    its reads to the last checkpoint's exact snapshot, so those dirs
    are excluded from reclamation even after a compaction superseded
    them. Run between supersteps (the engine is the single writer).

    Returns {table_name: dirs_removed}.
    """
    pinned: set[str] = set()
    ckpt_meta_path = os.path.join(workdir, "checkpoints", "manifest.json")
    if os.path.exists(ckpt_meta_path):
        meta = ParquetManifestStore(workdir, "checkpoints").meta
        for key in ("last_frontier_snapshot", "last_queue_state_snapshot"):
            for d in meta.get(key) or []:
                pinned.add(d["path"])
    removed: dict[str, int] = {}
    for name in sorted(os.listdir(workdir)):
        root = os.path.join(workdir, name)
        if not os.path.isdir(root) or not os.path.exists(
            os.path.join(root, "manifest.json")
        ):
            continue
        store = ParquetManifestStore(workdir, name)
        removed[name] = len(store.vacuum(keep_paths=pinned, min_age_s=min_age_s))
    return removed


class SignatureIndexTable:
    """Persistent minhash signature index — the stored half of the
    incremental corpus-dedup pipeline (textops.dedup_against_index).

    The archive's (id, perm, sig) rows are computed ONCE per ingested
    batch and appended here; each new crawl increment band-joins
    against the stored index and then appends its own signatures, so
    dedup cost stays proportional to the increment forever. Appends are
    batch-tagged (T5 family): replaying an ingest batch replaces its
    delta instead of duplicating signatures. On a real cluster this
    table is written bucketed by (perm, sig) so the band join
    co-locates with storage.
    """

    def __init__(self, root: str):
        self.store = ParquetManifestStore(root, "signature_index")

    def append(self, sigs: DataFrame, batch_id: str) -> str:
        return self.store.append(
            sigs.select("id", "perm", "sig"),
            meta={"last_batch": batch_id},
            replace_tag=f"sig-batch-{batch_id}",
        )

    def read(self, spark: SparkSession) -> DataFrame | None:
        raw = self.store.read_raw(spark)
        return None if raw is None else raw.select("id", "perm", "sig")
