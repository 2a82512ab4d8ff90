"""run_crawl.py --report surface: the round-4 analytics operators
(saturation curve, drain estimate, starvation report, sitemap coverage)
exposed as ops-facing CLI reports — one smoke test per flag, driving the
REAL CLI main() against a fixture crawl workdir."""

import importlib.util
import json
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "run_crawl",
    os.path.join(os.path.dirname(__file__), os.pardir, "scripts", "run_crawl.py"),
)
run_crawl = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(run_crawl)


@pytest.fixture(scope="module")
def crawl_workdir(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("cli_reports") / "work")
    _cli(wd, "--generate-fixtures", "8", "--max-supersteps", "3",
         "--num-queues", "4", "--record-link-graph")
    return wd


def _cli(workdir, *extra):
    argv = ["run_crawl.py", "--workdir", workdir, *extra]
    old = sys.argv
    sys.argv = argv
    try:
        run_crawl.main()
    finally:
        sys.argv = old


def _report_rows(capsys, workdir, kind, *extra):
    capsys.readouterr()  # drain fixture output
    _cli(workdir, "--resume", "--max-supersteps", "0",
         "--report", kind, *extra)
    rows = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")]
    return [r for r in rows if r.get("report")]


def test_report_saturation(spark, crawl_workdir, capsys):
    rows = _report_rows(capsys, crawl_workdir, "saturation")
    assert rows and all(r["report"] == "saturation" for r in rows)
    # bootstrap row (superstep 0) + one per superstep, in order
    assert [r["superstep"] for r in rows] == sorted(r["superstep"] for r in rows)
    assert {"new_seen", "yield_per_fetch", "saturation"} <= set(rows[0])


def test_report_drain(spark, crawl_workdir, capsys):
    rows = _report_rows(capsys, crawl_workdir, "drain")
    assert rows and all(r["report"] == "drain" for r in rows)
    assert {"host", "pending", "crawl_delay", "drain_seconds",
            "politeness_bound"} <= set(rows[0])
    drains = [r["drain_seconds"] for r in rows]
    assert drains == sorted(drains, reverse=True)  # worst-first


def test_report_starvation(spark, crawl_workdir, capsys):
    rows = _report_rows(capsys, crawl_workdir, "starvation")
    assert rows and all(r["report"] == "starvation" for r in rows)
    assert {"queue", "pending", "overdue", "overdue_frac",
            "max_wait_seconds"} <= set(rows[0])
    assert all(r["pending"] >= r["overdue"] for r in rows)


def test_report_sitemap_coverage(spark, crawl_workdir, capsys, tmp_path):
    # declared set: a few URLs ALREADY in the frontier (raw spellings,
    # exercising the canonicalize-before-match fix) + one never-crawled
    from sparkcrawl.sources.store import FrontierTable

    seen = [r["url"] for r in FrontierTable(crawl_workdir).read(spark)
            .select("url").limit(3).collect()]
    locs = [(u.replace("http://", "HTTP://", 1) + "#frag",) for u in seen]
    locs.append(("http://never-crawled.example/only-declared",))
    spark.createDataFrame(locs, ["loc"]).write.parquet(str(tmp_path / "locs"))

    rows = _report_rows(capsys, crawl_workdir, "sitemap-coverage",
                        "--sitemap-locs", str(tmp_path / "locs"))
    assert rows and all(r["report"] == "sitemap_coverage" for r in rows)
    by_host = {r["host"]: r for r in rows}
    assert by_host["never-crawled.example"]["coverage"] == 0.0
    covered = [r for h, r in by_host.items() if h != "never-crawled.example"]
    assert covered and all(r["n_seen"] >= 1 for r in covered)

    # missing --sitemap-locs is a hard error, not a silent no-op
    with pytest.raises(SystemExit):
        _cli(crawl_workdir, "--resume", "--max-supersteps", "0",
             "--report", "sitemap-coverage")


def test_report_unknown_kind_rejected(spark, crawl_workdir):
    with pytest.raises(SystemExit):
        _cli(crawl_workdir, "--resume", "--max-supersteps", "0",
             "--report", "nope")


def test_report_token_yield(spark, crawl_workdir, capsys):
    rows = _report_rows(capsys, crawl_workdir, "token-yield")
    assert rows and all(r["report"] == "token_yield" for r in rows)
    for r in rows:
        assert r["total_tokens"] > 0 and r["n_docs"] > 0
        assert 0.0 <= r["budget_weight"] <= 1.0
    # weights over the full (uncapped at this size) table sum to ~1
    assert abs(sum(r["budget_weight"] for r in rows) - 1.0) < 1e-3


def test_report_fairness(spark, crawl_workdir, capsys):
    rows = _report_rows(capsys, crawl_workdir, "fairness")
    assert rows and all(r["report"] == "fairness" for r in rows)
    assert {"superstep", "n_hosts", "fetches", "jain_index",
            "top_share"} <= set(rows[0])
    for r in rows:
        assert 0 < r["jain_index"] <= 1.0
        assert 0 < r["top_share"] <= 1.0


def test_report_rebalance(spark, crawl_workdir, capsys):
    rows = _report_rows(capsys, crawl_workdir, "rebalance",
                        "--rebalance-queues", "6", "--num-queues", "4")
    assert rows and all(r["report"] == "rebalance" for r in rows)
    strategies = {r["strategy"] for r in rows}
    assert strategies == {"mod", "rendezvous"}
    # per strategy, counts conserve the same frontier
    tot = {}
    for r in rows:
        tot[r["strategy"]] = tot.get(r["strategy"], 0) + r["urls"]
    assert tot["mod"] == tot["rendezvous"] > 0
    # HRW movers land only on new queues (>= the run's 4)
    assert all(r["new_queue"] >= 4 for r in rows
               if r["strategy"] == "rendezvous" and r["moved"])
    with pytest.raises(SystemExit):
        _report_rows(capsys, crawl_workdir, "rebalance")


def test_report_dup_rate_and_value_steering(spark, crawl_workdir, capsys):
    rows = _report_rows(capsys, crawl_workdir, "dup-rate,value-steering")
    kinds = {r["report"] for r in rows}
    assert kinds == {"dup_rate", "value_steering"}
    dup = [r for r in rows if r["report"] == "dup_rate"]
    assert {"domain", "n_docs", "n_dups", "dup_rate",
            "cross_domain_dups"} <= set(dup[0])
    for r in dup:
        assert 0.0 <= r["dup_rate"] <= 1.0
    vs = [r for r in rows if r["report"] == "value_steering"]
    assert {"domain", "total_tokens", "effective_tokens",
            "weight"} <= set(vs[0])
    assert abs(sum(r["weight"] for r in vs) - 1.0) < 1e-4


def test_report_reciprocity(spark, crawl_workdir, capsys):
    rows = _report_rows(capsys, crawl_workdir, "reciprocity")
    assert rows and all(r["report"] == "reciprocity" for r in rows)
    assert {"host", "n_out", "n_reciprocal", "reciprocal_share",
            "flagged"} <= set(rows[0])
    for r in rows:
        assert 0 <= r["n_reciprocal"] <= r["n_out"]


def test_report_soft404_and_scheme_migration(spark, crawl_workdir, capsys):
    rows = _report_rows(capsys, crawl_workdir,
                        "soft404,scheme-migration,param-entropy")
    kinds = {r["report"] for r in rows}
    # soft404/param-entropy may legitimately be empty on the fixture
    # web (no error landers, no query strings) — scheme report always
    # has the frontier's hosts
    assert "scheme_migration" in kinds
    sm = [r for r in rows if r["report"] == "scheme_migration"]
    assert {"host", "n_paths", "https_share", "migrate"} <= set(sm[0])
    for r in rows:
        if r["report"] == "soft404":
            assert r["soft404"] and r["status"] == 200
        if r["report"] == "param_entropy":
            assert r["param_class"] in ("id_like", "enum_like", "mixed")
