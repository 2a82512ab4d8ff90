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


def test_manifest_commit_is_atomic_replace(spark, tmp_path):
    store = ParquetManifestStore(str(tmp_path), "t")
    store.append(_df(spark, [("a", 1)]))
    with open(store._manifest_path) as f:
        m = json.load(f)
    assert m["version"] == 1 and len(m["deltas"]) == 1
    # no tmp files left behind
    leftovers = [p for p in os.listdir(store.root) if p.startswith("manifest.json.tmp")]
    assert leftovers == []
