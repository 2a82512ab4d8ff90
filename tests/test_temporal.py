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


def test_sessionize_gap_splits_hand_case(spark):
    from datetime import datetime, timezone

    from sparkcrawl.operators.temporal import session_stats, sessionize

    t = lambda s: datetime(2026, 1, 1, 0, 0, s, tzinfo=timezone.utc)
    rows = [
        ("a", t(0)), ("a", t(5)), ("a", t(14)),   # session 0 (gaps 5, 9)
        ("a", t(40)), ("a", t(45)),               # session 1 (gap 26 > 10)
        ("b", t(0)),                              # other key: own session 0
    ]
    ev = spark.createDataFrame(rows, ["host", "ts"])
    sess = {(r["host"], r["ts"].second): r["session_id"]
            for r in sessionize(ev, gap_seconds=10).collect()}
    assert sess == {("a", 0): 0, ("a", 5): 0, ("a", 14): 0,
                    ("a", 40): 1, ("a", 45): 1, ("b", 0): 0}
    stats = {(r["host"], r["session_id"]): (r["n_events"], r["duration_s"])
             for r in session_stats(ev, gap_seconds=10).collect()}
    assert stats == {("a", 0): (3, 14.0), ("a", 1): (2, 5.0),
                     ("b", 0): (1, 0.0)}


def test_sessionize_boundary_is_strict_greater(spark):
    """A gap of exactly gap_seconds stays in the SAME session (the
    split rule is gap > threshold, matching the streaming operator)."""
    from datetime import datetime, timezone

    from sparkcrawl.operators.temporal import sessionize

    t = lambda s: datetime(2026, 1, 1, 0, 0, s, tzinfo=timezone.utc)
    ev = spark.createDataFrame(
        [("a", t(0)), ("a", t(10)), ("a", t(21))], ["host", "ts"])
    out = sorted(r["session_id"] for r in sessionize(ev, 10).collect())
    assert out == [0, 0, 1]  # gap 10 == threshold stays; gap 11 splits
