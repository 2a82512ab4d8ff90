"""Focused-crawl relevance priority refresh (plans/relevance.py)."""

from pyspark.sql import functions as F

from sparkcrawl.plans.relevance import (
    host_relevance,
    refresh_relevance_priorities,
)
from sparkcrawl.plans.superstep import CrawlRun


def _run_crawl(spark, mini_cfg, mini_web, workdir, supersteps=3):
    run = CrawlRun(spark, workdir, mini_cfg, mini_web["web"], mini_web["robots"])
    run.run(mini_web["seeds"], max_supersteps=supersteps)
    return run


def _topic_terms(spark, run):
    """Pick real terms from the crawled corpus so BM25 differentiates:
    the two most document-frequent words (plus one absent word)."""
    from sparkcrawl.operators.textops import spans_to_text

    docs = spans_to_text(run.documents.read(spark))
    top = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok").count().orderBy(F.desc("count"), "tok").limit(2)
        .collect()
    )
    return tuple(r["tok"] for r in top) + ("zzzznotaword",)


def test_host_relevance_scores(spark, mini_cfg, mini_web, tmp_path):
    run = _run_crawl(spark, mini_cfg, mini_web, str(tmp_path / "w"))
    rel = host_relevance(spark, str(tmp_path / "w"), _topic_terms(spark, run))
    assert rel is not None
    rows = rel.collect()
    assert len(rows) > 0
    assert all(r["n_docs"] > 0 for r in rows)
    # mean, not sum: no relevance exceeds the max per-doc bm25
    assert all(r["relevance"] >= 0 for r in rows)


def test_refresh_relevance_rewrites_pending(spark, mini_cfg, mini_web, tmp_path):
    wd = str(tmp_path / "w")
    run = _run_crawl(spark, mini_cfg, mini_web, wd)
    terms = _topic_terms(spark, run)

    n = refresh_relevance_priorities(spark, wd, mini_cfg, terms, refresh_id=1)
    assert n > 0
    after = run.frontier.read(spark).filter(F.col("state") == "pending")
    pr = [r["priority"] for r in after.collect()]
    assert all(1 <= p <= mini_cfg.num_priorities for p in pr)

    # idempotent per refresh_id: re-running replaces, never stacks
    refresh_relevance_priorities(spark, wd, mini_cfg, terms, refresh_id=1)
    after2 = run.frontier.read(spark).filter(F.col("state") == "pending")
    assert after2.count() == after.count()

    # the crawl continues on the re-prioritized frontier
    more = run.resume(max_supersteps=1)
    assert more and more[0].fetched > 0


def test_refresh_noop_without_documents(spark, mini_cfg, tmp_path):
    assert (
        refresh_relevance_priorities(
            spark, str(tmp_path / "empty"), mini_cfg, ("x",)
        )
        == 0
    )


def test_composite_refresh_blends_signals(spark, mini_cfg, mini_web, tmp_path):
    """Composite refresh: weights (1,0) reproduce the rank-only result;
    a 50/50 blend rewrites priorities, is idempotent per refresh id,
    and the crawl resumes on the blended order."""
    import dataclasses

    from sparkcrawl.plans.composite import refresh_composite_priorities
    from sparkcrawl.plans.rank import refresh_frontier_priorities

    cfg = dataclasses.replace(mini_cfg, record_link_graph=True)
    wd = str(tmp_path / "w")
    run = CrawlRun(spark, wd, cfg, mini_web["web"], mini_web["robots"])
    run.run(mini_web["seeds"], max_supersteps=3)
    terms = _topic_terms(spark, run)

    # rank-only composite == the dedicated rank refresh (same buckets)
    wd2 = str(tmp_path / "w2")
    run2 = CrawlRun(spark, wd2, cfg, mini_web["web"], mini_web["robots"])
    run2.run(mini_web["seeds"], max_supersteps=3)
    refresh_composite_priorities(spark, wd, cfg, terms,
                                 w_rank=1.0, w_relevance=0.0, refresh_id=1)
    refresh_frontier_priorities(spark, wd2, cfg, refresh_id=1)
    pri1 = {r["url_hash"]: r["priority"]
            for r in run.frontier.read(spark)
            .filter(F.col("state") == "pending").collect()}
    pri2 = {r["url_hash"]: r["priority"]
            for r in run2.frontier.read(spark)
            .filter(F.col("state") == "pending").collect()}
    assert pri1 == pri2

    # 50/50 blend: rewrites something, stays in range, idempotent
    n = refresh_composite_priorities(spark, wd, cfg, terms,
                                     w_rank=0.5, w_relevance=0.5, refresh_id=2)
    assert n > 0
    after = run.frontier.read(spark).filter(F.col("state") == "pending")
    assert all(1 <= r["priority"] <= cfg.num_priorities
               for r in after.collect())
    refresh_composite_priorities(spark, wd, cfg, terms,
                                 w_rank=0.5, w_relevance=0.5, refresh_id=2)
    assert run.frontier.read(spark).filter(
        F.col("state") == "pending").count() == after.count()
    more = run.resume(max_supersteps=1)
    assert more and more[0].fetched > 0
