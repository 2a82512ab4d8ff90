"""as-of join + range join semantics (operators/temporal.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from sparkcrawl.operators import temporal


def _ts(m):
    return datetime(2026, 1, 1, 0, m)


def test_asof_backward_forward_and_nulls(spark):
    probes = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(4)), (3, "u2", _ts(5)),
         (4, "u3", _ts(5))],
        ["probe_id", "key", "ts"],
    )
    history = spark.createDataFrame(
        [(100, "u1", _ts(5)), (101, "u1", _ts(9)), (102, "u1", _ts(11)),
         (200, "u2", _ts(7))],
        ["event_id", "key", "ts"],
    )
    back = {
        r["probe_id"]: (r["h_event_id"], r["h_ts"])
        for r in temporal.asof_join(
            probes, history, key="key", tiebreak="event_id"
        ).collect()
    }
    assert back[1] == (101, _ts(9))   # latest <= 10
    assert back[2] == (None, None)    # nothing at-or-before 4
    assert back[3] == (None, None)    # u2 history starts at 7
    assert back[4] == (None, None)    # unknown key: left-join NULL row
    fwd = {
        r["probe_id"]: (r["h_event_id"], r["h_ts"])
        for r in temporal.asof_join(
            probes, history, key="key", tiebreak="event_id",
            direction="forward",
        ).collect()
    }
    assert fwd[1] == (102, _ts(11))   # earliest >= 10
    assert fwd[2] == (100, _ts(5))
    assert fwd[3] == (200, _ts(7))
    assert fwd[4] == (None, None)


def test_asof_tiebreak_is_deterministic(spark):
    probes = spark.createDataFrame([(1, "u", _ts(9))], ["probe_id", "key", "ts"])
    history = spark.createDataFrame(
        [(7, "u", _ts(9)), (9, "u", _ts(9)), (8, "u", _ts(9))],
        ["event_id", "key", "ts"],
    )
    out = temporal.asof_join(
        probes, history, key="key", tiebreak="event_id"
    ).collect()
    assert out[0]["h_event_id"] == 9  # greatest tiebreak among ts ties


def test_range_join_half_open_bounds(spark):
    facts = spark.createDataFrame(
        [(1, 0), (2, 199), (3, 200), (4, 999)], ["id", "v"]
    )
    bounds = spark.createDataFrame(
        [("a", 0, 200), ("b", 200, 1000)], ["bucket", "lo", "hi"]
    )
    out = {r["id"]: r["bucket"]
           for r in temporal.range_join(facts, bounds, value="v").collect()}
    assert out == {1: "a", 2: "a", 3: "b", 4: "b"}  # lo inclusive, hi exclusive


def test_range_join_is_broadcast(spark):
    facts = spark.createDataFrame([(1, 50)], ["id", "v"])
    bounds = spark.createDataFrame([("a", 0, 200)], ["bucket", "lo", "hi"])
    plan = (
        temporal.range_join(facts, bounds, value="v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_asof_plan_has_no_window(spark):
    """The reduce is max_by (hash agg, map-side combine) — a window
    would sort every per-probe partition for the same answer."""
    probes = spark.createDataFrame([(1, "u", _ts(9))], ["probe_id", "key", "ts"])
    history = spark.createDataFrame(
        [(7, "u", _ts(8))], ["event_id", "key", "ts"]
    )
    plan = (
        temporal.asof_join(probes, history, key="key", tiebreak="event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
