"""ParquetManifestStore / FrontierTable snapshot semantics (T5, J3/W4)."""

import json
import os

from sparkcrawl.sources.store import FrontierTable, ParquetManifestStore


def _df(spark, rows):
    return spark.createDataFrame(rows, ["url_hash", "val"])


def test_keep_latest_across_appends(spark, tmp_path):
    ft = FrontierTable(str(tmp_path))
    ft.store.append(_df(spark, [("a", 1), ("b", 1)]))
    ft.store.append(_df(spark, [("a", 2)]))
    got = {r["url_hash"]: r["val"] for r in ft.read(spark).collect()}
    assert got == {"a": 2, "b": 1}


def test_append_after_compact_wins(spark, tmp_path):
    """Regression: compaction must not let old rows shadow newer appends
    (delta seq must be manifest-monotonic, not len(deltas))."""
    ft = FrontierTable(str(tmp_path))
    ft.store.append(_df(spark, [("a", 1), ("b", 1)]))
    ft.store.append(_df(spark, [("a", 2)]))
    ft.compact(spark)
    assert ft.store.num_deltas == 1
    ft.store.append(_df(spark, [("a", 3)]))
    got = {r["url_hash"]: r["val"] for r in ft.read(spark).collect()}
    assert got == {"a": 3, "b": 1}


def test_uncommitted_delta_invisible(spark, tmp_path):
    """Atomicity: a delta dir on disk that is not in the manifest (a
    killed superstep's orphan) is never read."""
    store = ParquetManifestStore(str(tmp_path), "t")
    store.append(_df(spark, [("a", 1)]))
    # simulate a killed write: parquet lands but manifest never updated
    orphan = os.path.join(store.root, "data", "delta-999999-dead")
    _df(spark, [("a", 99)]).write.parquet(orphan)
    rows = store.read_raw(spark).collect()
    assert {r["val"] for r in rows} == {1}


def test_queue_pruned_read_hits_partition_dirs(spark, tmp_path):
    """The queues= read must show PartitionFilters in the parquet scan
    (hive layout by queue) and return the same rows as post-filtering."""
    import contextlib
    import io
    import re

    rows = [(f"h{i:03d}", i % 4, i) for i in range(40)]
    df = spark.createDataFrame(rows, ["url_hash", "queue", "val"])
    ft = FrontierTable(str(tmp_path))
    ft.merge(df, superstep=1)
    ft.merge(df.filter("queue = 2").withColumn("val", _one(spark)), superstep=2)

    pruned = ft.read(spark, queues=[2])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    pf = re.findall(r"PartitionFilters: \[[^\]]*queue[^\]]*\]", buf.getvalue())
    assert pf, "queue filter did not reach the partitioned scan"

    full = ft.read(spark).filter("queue = 2")
    assert sorted(map(str, pruned.collect())) == sorted(map(str, full.collect()))


def _one(spark):
    from pyspark.sql import functions as F

    return F.lit(999)


def test_manifest_commit_is_atomic_replace(spark, tmp_path):
    store = ParquetManifestStore(str(tmp_path), "t")
    store.append(_df(spark, [("a", 1)]))
    with open(store._manifest_path) as f:
        m = json.load(f)
    assert m["version"] == 1 and len(m["deltas"]) == 1
    # no tmp files left behind
    leftovers = [p for p in os.listdir(store.root) if p.startswith("manifest.json.tmp")]
    assert leftovers == []


def _data_dirs(store):
    root = os.path.join(store.root, "data")
    return {os.path.join(root, n) for n in os.listdir(root)}


def test_vacuum_reclaims_compacted_deltas(spark, tmp_path):
    store = ParquetManifestStore(str(tmp_path), "t")
    store.append(_df(spark, [("a", 1)]))
    store.append(_df(spark, [("b", 2)]))
    before = _data_dirs(store)
    store.replace_all(_df(spark, [("a", 1), ("b", 2)]))
    removed = store.vacuum()
    # both superseded delta dirs reclaimed, the compact dir survives
    assert set(removed) == before
    assert len(_data_dirs(store)) == 1
    rows = {(r["url_hash"], r["val"])
            for r in store.read_raw(spark).drop("_delta_seq").collect()}
    assert rows == {("a", 1), ("b", 2)}


def test_vacuum_protects_pinned_snapshot(spark, tmp_path):
    store = ParquetManifestStore(str(tmp_path), "t")
    store.append(_df(spark, [("a", 1)]))
    pinned = store.snapshot()          # as-of pointer (a checkpoint's view)
    store.replace_all(_df(spark, [("a", 99)]))
    removed = store.vacuum(keep_paths={d["path"] for d in pinned})
    assert removed == []
    # the pinned as-of read still works after the vacuum pass
    old = store.read_raw(spark, snapshot=pinned).collect()
    assert [(r["url_hash"], r["val"]) for r in old] == [("a", 1)]
    # without the pin the superseded dir goes away
    assert len(store.vacuum()) == 1


def test_vacuum_min_age_guards_inflight(spark, tmp_path):
    store = ParquetManifestStore(str(tmp_path), "t")
    store.append(_df(spark, [("a", 1)]))
    store.replace_all(_df(spark, [("a", 1)]))
    assert store.vacuum(min_age_s=3600) == []   # everything too young
    assert len(store.vacuum()) == 1


def test_vacuum_workdir_respects_checkpoint_pins(spark, mini_cfg, mini_web, tmp_path):
    """End-to-end: after a crawl + frontier compaction, vacuum_workdir
    reclaims superseded dirs but keeps the last checkpoint's pinned
    frontier snapshot readable, and the crawl resumes afterwards."""
    from sparkcrawl.plans.superstep import CrawlRun
    from sparkcrawl.sources.store import vacuum_workdir

    wd = str(tmp_path / "w")
    run = CrawlRun(spark, wd, mini_cfg, mini_web["web"], mini_web["robots"])
    run.run(mini_web["seeds"], max_supersteps=3)
    seen_before = run.frontier.read(spark).count()

    run.frontier.compact(spark)
    removed = vacuum_workdir(wd)
    assert sum(removed.values()) > 0
    # pinned as-of replay still possible: the last checkpoint's snapshot
    # paths survived the vacuum
    last = run.checkpoints.last()
    for d in last["frontier_snapshot"] or []:
        assert os.path.exists(d["path"])
    assert run.frontier.read(spark).count() == seen_before
    more = run.resume(max_supersteps=1)
    assert more and more[0].fetched >= 0
