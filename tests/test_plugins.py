"""X1-X3: import-path plugin loading (custom_import analog)."""

import dataclasses

import pytest

from sparkcrawl.functions.import_util import apply_pipeline, import_object
from sparkcrawl.plans.superstep import CrawlRun


def test_import_object_colon_and_dotted():
    fn1 = import_object("tests.sample_plugin:drop_blocked_host_links")
    fn2 = import_object("tests.sample_plugin.drop_blocked_host_links")
    assert fn1 is fn2


def test_import_object_bad_path():
    with pytest.raises(ImportError):
        import_object("nopath")
    with pytest.raises(ModuleNotFoundError):
        import_object("no.such.module:thing")


def test_pipeline_stage_applied_in_superstep(spark, mini_cfg, mini_web, tmp_path):
    from tests.sample_plugin import BLOCKED_HOST

    cfg = dataclasses.replace(
        mini_cfg,
        extractor_pipeline=("tests.sample_plugin:drop_blocked_host_links",),
    )
    run = CrawlRun(spark, str(tmp_path / "w"), cfg, mini_web["web"], mini_web["robots"])
    run.run(mini_web["seeds"], max_supersteps=3)
    frontier = run.frontier.read(spark)
    # links to the blocked host never entered the frontier via discovery;
    # only a seed could put it there
    discovered = frontier.filter(
        (frontier.host == BLOCKED_HOST) & (frontier.discovered_superstep > 0)
    )
    assert discovered.count() == 0
