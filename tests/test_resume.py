"""T5/north_rule: kill after superstep k, resume, end state identical
to an uninterrupted run (fetch order AND frontier content)."""

from pyspark.sql import functions as F

from sparkcrawl.plans.superstep import CrawlRun


def _final_state(run, spark):
    frontier = {
        r["url_hash"]: (r["state"], r["priority"], r["error_count"],
                        r["next_date"].isoformat())
        for r in run.frontier.read(spark).collect()
    }
    order = [
        (r["superstep"], r["rank"], r["url"])
        for r in run.fetch_log.read(spark).orderBy("superstep", "rank").collect()
    ]
    return frontier, order


def test_kill_resume_identical(spark, mini_cfg, mini_web, tmp_path_factory):
    # uninterrupted: 4 supersteps
    run_a = CrawlRun(spark, str(tmp_path_factory.mktemp("uninterrupted")), mini_cfg,
                     mini_web["web"], mini_web["robots"])
    run_a.run(mini_web["seeds"], max_supersteps=4)

    # interrupted: 2 supersteps, process "dies", fresh object resumes 2 more
    work_b = str(tmp_path_factory.mktemp("interrupted"))
    run_b1 = CrawlRun(spark, work_b, mini_cfg, mini_web["web"], mini_web["robots"])
    run_b1.run(mini_web["seeds"], max_supersteps=2)
    del run_b1
    run_b2 = CrawlRun(spark, work_b, mini_cfg, mini_web["web"], mini_web["robots"])
    ckpt = run_b2.last_checkpoint()
    assert ckpt["superstep"] == 2
    run_b2.resume(max_supersteps=2)

    state_a, order_a = _final_state(run_a, spark)
    state_b, order_b = _final_state(run_b2, spark)
    assert order_a == order_b
    assert state_a == state_b


def test_midstep_kill_no_duplicate_appends(spark, mini_cfg, mini_web, tmp_path_factory):
    """Regression (ADVICE r1): a kill AFTER documents/fetch_log append but
    BEFORE the superstep checkpoint must not duplicate rows on replay —
    tagged deltas make the appends idempotent per superstep."""
    work = str(tmp_path_factory.mktemp("midstep"))
    run = CrawlRun(spark, work, mini_cfg, mini_web["web"], mini_web["robots"])
    run.run(mini_web["seeds"], max_supersteps=2)

    # superstep 3 "dies" between the appends and the checkpoint commit
    real_commit = run.checkpoints.commit

    def dying_commit(spark_, superstep, *a, **kw):
        if superstep == 3:
            raise RuntimeError("simulated kill before checkpoint")
        return real_commit(spark_, superstep, *a, **kw)

    run.checkpoints.commit = dying_commit
    try:
        run.resume(max_supersteps=1)
    except RuntimeError:
        pass
    assert run.last_checkpoint()["superstep"] == 2  # checkpoint didn't land

    # fresh process resumes: superstep 3 replays
    run2 = CrawlRun(spark, work, mini_cfg, mini_web["web"], mini_web["robots"])
    run2.resume(max_supersteps=1)
    assert run2.last_checkpoint()["superstep"] == 3

    log = run2.fetch_log.read(spark)
    # no duplicated (superstep, rank) rows in the crawl-order surface
    assert log.count() == log.select("superstep", "rank").distinct().count()

    # and the end state (incl. documents row count) matches an
    # uninterrupted 3-superstep run
    run_c = CrawlRun(spark, str(tmp_path_factory.mktemp("clean3")), mini_cfg,
                     mini_web["web"], mini_web["robots"])
    run_c.run(mini_web["seeds"], max_supersteps=3)
    assert run2.documents.read(spark).count() == run_c.documents.read(spark).count()
    state_c, order_c = _final_state(run_c, spark)
    state_b, order_b = _final_state(run2, spark)
    assert order_b == order_c
    assert state_b == state_c


def test_orphan_delta_ignored_on_resume(spark, mini_cfg, mini_web, tmp_path_factory):
    """A superstep killed mid-write leaves an orphan parquet delta; resume
    must not see it (manifest is the source of truth)."""
    work = str(tmp_path_factory.mktemp("orphan"))
    run = CrawlRun(spark, work, mini_cfg, mini_web["web"], mini_web["robots"])
    run.run(mini_web["seeds"], max_supersteps=2)
    seen_before = sorted(
        r["url_hash"] for r in run.frontier.read(spark).select("url_hash").collect()
    )
    # simulate a kill mid-superstep-3: frontier delta written, manifest not
    import os

    orphan = os.path.join(run.frontier.store.root, "data", "delta-killed")
    run.frontier.read(spark).limit(3).withColumn(
        "url_hash", F.concat(F.lit("dead"), F.col("url_hash"))
    ).withColumn("_delta_seq", F.lit(999)).write.parquet(orphan)

    run2 = CrawlRun(spark, work, mini_cfg, mini_web["web"], mini_web["robots"])
    seen_after = sorted(
        r["url_hash"] for r in run2.frontier.read(spark).select("url_hash").collect()
    )
    assert seen_after == seen_before


def test_vacuum_cadence_preserves_parity_and_resume(
    spark, mini_cfg, mini_web, tmp_path_factory
):
    """cfg.vacuum_every: an every-superstep vacuum must change NOTHING
    observable — same fetch order and frontier as a no-vacuum run —
    and a kill + resume across a vacuumed boundary still works."""
    import dataclasses

    cfg_v = dataclasses.replace(mini_cfg, vacuum_every=1)

    run_a = CrawlRun(spark, str(tmp_path_factory.mktemp("novac")), mini_cfg,
                     mini_web["web"], mini_web["robots"])
    run_a.run(mini_web["seeds"], max_supersteps=4)

    work_b = str(tmp_path_factory.mktemp("vac"))
    run_b1 = CrawlRun(spark, work_b, cfg_v, mini_web["web"], mini_web["robots"])
    run_b1.run(mini_web["seeds"], max_supersteps=2)
    del run_b1
    run_b2 = CrawlRun(spark, work_b, cfg_v, mini_web["web"], mini_web["robots"])
    run_b2.resume(max_supersteps=2)

    state_a, order_a = _final_state(run_a, spark)
    state_b, order_b = _final_state(run_b2, spark)
    assert order_a == order_b
    assert state_a == state_b
