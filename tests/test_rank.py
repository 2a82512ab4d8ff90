"""Link-graph recording + offline PageRank priority refresh (plans/rank.py)."""

import dataclasses

from pyspark.sql import functions as F

from sparkcrawl.plans.rank import host_ranks, refresh_frontier_priorities
from sparkcrawl.plans.superstep import CrawlRun


def _run_crawl(spark, mini_cfg, mini_web, workdir, supersteps=3):
    cfg = dataclasses.replace(mini_cfg, record_link_graph=True)
    run = CrawlRun(spark, workdir, cfg, mini_web["web"], mini_web["robots"])
    run.run(mini_web["seeds"], max_supersteps=supersteps)
    return run, cfg


def test_link_edges_recorded_and_aggregated(spark, mini_cfg, mini_web, tmp_path):
    run, _ = _run_crawl(spark, mini_cfg, mini_web, str(tmp_path / "w"))
    edges = run.link_edges.read(spark)
    assert edges is not None and edges.count() > 0
    assert set(edges.columns) == {"src_host", "dst_host", "n_links", "superstep"}
    # aggregated per superstep: (src, dst, superstep) unique
    assert (
        edges.groupBy("src_host", "dst_host", "superstep").count()
        .filter(F.col("count") > 1).count() == 0
    )


def test_refresh_rewrites_pending_priorities(spark, mini_cfg, mini_web, tmp_path):
    wd = str(tmp_path / "w")
    run, cfg = _run_crawl(spark, mini_cfg, mini_web, wd)
    ranks = host_ranks(spark, wd)
    assert ranks is not None and ranks.count() > 0

    n = refresh_frontier_priorities(spark, wd, cfg, refresh_id=1)
    assert n > 0
    after = run.frontier.read(spark).filter(F.col("state") == "pending")
    pr = [r["priority"] for r in after.collect()]
    assert all(1 <= p <= cfg.num_priorities for p in pr)
    assert len(set(pr)) > 1  # ranks actually differentiated hosts

    # idempotent per refresh_id: re-running replaces, never stacks
    again = refresh_frontier_priorities(spark, wd, cfg, refresh_id=1)
    after2 = run.frontier.read(spark).filter(F.col("state") == "pending")
    assert after2.count() == after.count()

    # the crawl continues normally on the re-prioritized frontier
    more = run.resume(max_supersteps=1)
    assert more and more[0].fetched > 0


def test_refresh_with_opic_signal(spark, mini_cfg, mini_web, tmp_path):
    """The crawl-native OPIC estimator drives the same refresh seam:
    virtual page excluded from host ranks, importances positive, and
    pending priorities land in 1..num_priorities."""
    wd = str(tmp_path / "w")
    run, cfg = _run_crawl(spark, mini_cfg, mini_web, wd)
    ranks = host_ranks(spark, wd, method="opic")
    assert ranks is not None
    rows = ranks.collect()
    assert rows and all(r["rank"] > 0 for r in rows)
    assert "" not in {r["host"] for r in rows}  # virtual page filtered

    n = refresh_frontier_priorities(spark, wd, cfg, refresh_id=2, method="opic")
    assert n > 0
    after = run.frontier.read(spark).filter(F.col("state") == "pending")
    pr = [r["priority"] for r in after.collect()]
    assert all(1 <= p <= cfg.num_priorities for p in pr)
