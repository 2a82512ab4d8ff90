"""PageRank semantics (operators/graph.py)."""

import pytest

from sparkcrawl.operators import graph


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["id"]: r["rank"] for r in graph.pagerank(df, **kw).collect()}


def test_two_node_cycle_is_symmetric(spark):
    r = _ranks(spark, [(1, 2), (2, 1)])
    assert r[1] == pytest.approx(r[2])
    assert r[1] == pytest.approx(0.5, abs=1e-6)  # stationary from start


def test_star_center_dominates(spark):
    r = _ranks(spark, [(1, 9), (2, 9), (3, 9), (4, 9)])
    assert r[9] == max(r.values())
    # leaves are symmetric
    assert r[1] == r[2] == r[3] == r[4]
    # dangling center: its mass is dropped, so total < 1
    assert sum(r.values()) < 1.0


def test_chain_rank_increases_downstream(spark):
    r = _ranks(spark, [(1, 2), (2, 3), (3, 1)])  # 3-cycle: all equal
    assert r[1] == pytest.approx(r[2]) == pytest.approx(r[3])
    assert r[1] == pytest.approx(1 / 3, abs=1e-6)  # output rounded to 6dp


def test_self_loops_and_dup_edges_ignored(spark):
    r1 = _ranks(spark, [(1, 2), (2, 1)])
    r2 = _ranks(spark, [(1, 2), (1, 2), (1, 1), (2, 1)])
    assert r1 == r2


def test_hand_computed_one_iteration(spark):
    # 1->2, 1->3, 2->3 ; one iteration from uniform 1/3, d=0.85:
    #   r(1) = 0.15/3
    #   r(2) = 0.15/3 + 0.85*(1/3/2)
    #   r(3) = 0.15/3 + 0.85*(1/3/2 + 1/3/1)
    r = _ranks(spark, [(1, 2), (1, 3), (2, 3)], iters=1)
    assert r[1] == pytest.approx(0.05, abs=1e-6)
    assert r[2] == pytest.approx(0.05 + 0.85 / 6, abs=1e-6)
    assert r[3] == pytest.approx(0.05 + 0.85 * (1 / 6 + 1 / 3), abs=1e-6)


def test_trustrank_decays_with_seed_distance(spark):
    """Chain seed->1->2->3 plus a disconnected spam pair: trust strictly
    decays along the chain, the spam pair (unreachable from the seed)
    gets exactly zero, and a hand-computed 1-iteration value matches."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (90, 91), (91, 90)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["id"])
    tr = {r["id"]: r["trust"] for r in
          graph.trustrank(edges, seeds, iters=10).collect()}
    assert tr[0] > tr[1] > tr[2] > tr[3] > 0
    assert tr[90] == 0.0 and tr[91] == 0.0
    # one iteration by hand: seed keeps (1-d)*1, node1 gets d*1/out_deg(0)=d
    tr1 = {r["id"]: r["trust"] for r in
           graph.trustrank(edges, seeds, iters=1).collect()}
    assert tr1[0] == pytest.approx(0.15, abs=1e-6)
    assert tr1[1] == pytest.approx(0.85, abs=1e-6)
    assert tr1[2] == 0.0  # trust hasn't propagated two hops yet


def test_trustrank_seed_outside_graph_raises(spark):
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(99,)], ["id"])
    with pytest.raises(ValueError):
        graph.trustrank(edges, seeds)


def test_hits_star_and_hand_iteration(spark):
    """Star 1,2,3 -> 9: node 9 is the sole authority (auth 1.0), the
    leaves are equal hubs (1/3 each), and cross scores are zero."""
    edges = spark.createDataFrame([(1, 9), (2, 9), (3, 9)], ["src", "dst"])
    r = {row["id"]: (row["hub"], row["auth"])
         for row in graph.hits(edges, iters=3).collect()}
    assert r[9] == (0.0, 1.0)
    for leaf in (1, 2, 3):
        assert r[leaf][0] == pytest.approx(1 / 3, abs=1e-6)
        assert r[leaf][1] == 0.0


def test_hits_one_iteration_hand_computed(spark):
    """Edges (1,3),(1,4),(2,4), one iteration from hub=1:
    auth: 3 gets 1, 4 gets 2 -> normalized 1/3, 2/3;
    hub: 1 gets 1/3+2/3=1, 2 gets 2/3 -> normalized 3/5, 2/5."""
    edges = spark.createDataFrame([(1, 3), (1, 4), (2, 4)], ["src", "dst"])
    r = {row["id"]: (row["hub"], row["auth"])
         for row in graph.hits(edges, iters=1).collect()}
    assert r[3][1] == pytest.approx(1 / 3, abs=1e-6)
    assert r[4][1] == pytest.approx(2 / 3, abs=1e-6)
    assert r[1][0] == pytest.approx(3 / 5, abs=1e-6)
    assert r[2][0] == pytest.approx(2 / 5, abs=1e-6)
    assert r[1][1] == 0.0 and r[3][0] == 0.0


def test_spam_mass_invariants_and_spam_component(spark):
    """good_rank never exceeds rank; rel_mass in [0,1]; a component
    unreachable from the seed has rel_mass exactly 1; the seed's own
    rel_mass is the smallest in the graph."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (90, 91), (91, 90)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["id"])
    rows = {r["id"]: r.asDict()
            for r in graph.spam_mass(edges, seeds, iters=10).collect()}
    for d in rows.values():
        assert 0 <= d["good_rank"] <= d["rank"] + 1e-9
        assert 0 <= d["rel_mass"] <= 1
    assert rows[90]["rel_mass"] == 1.0 and rows[91]["rel_mass"] == 1.0
    assert rows[90]["good_rank"] == 0.0
    # every node reachable from the seed keeps some good mass
    for n in (0, 1, 2):
        assert rows[n]["rel_mass"] < 1.0
    # one iteration by hand (n=5 nodes, seed={0}): rank(1) = 0.15/5
    # + 0.85*(1/5) = 0.2; trust(1) = 0.85; good = 0.85/5 = 0.17;
    # rel_mass = (0.2-0.17)/0.2 = 0.15
    one = {r["id"]: r.asDict()
           for r in graph.spam_mass(edges, seeds, iters=1).collect()}
    assert one[1]["rank"] == pytest.approx(0.2, abs=1e-6)
    assert one[1]["good_rank"] == pytest.approx(0.17, abs=1e-6)
    assert one[1]["rel_mass"] == pytest.approx(0.15, abs=1e-6)


def test_opic_one_round_hand_computed(spark):
    """Graph 1->2 (N=2 real + virtual): cash_0 = 1/3 each.
    Round 1: node1 gets V's half = 1/6; node2 gets half of node1's
    cash + V's half = 1/3. importance = (hist + cash)/2:
    node1 (1/3 + 1/6)/2 = 0.25, node2 (1/3 + 1/3)/2 = 1/3."""
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    r = {row["id"]: row["importance"]
         for row in graph.opic(edges, iters=1).collect()}
    assert r[1] == pytest.approx(0.25, abs=1e-6)
    assert r[2] == pytest.approx(1 / 3, abs=1e-6)


def test_opic_mass_conserved_and_ranks_popular_node(spark):
    """Total importance over real+virtual is exactly 1 (cash conserved,
    history totals k), and the node every other node links to scores
    highest among real nodes."""
    edges = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (9, 1)], ["src", "dst"])
    rows = {r["id"]: r["importance"]
            for r in graph.opic(edges, iters=8).collect()}
    assert rows[9] == max(rows.values())
    # real-node importances sum to < 1; the virtual page holds the
    # remainder (total over real+virtual is exactly 1 by construction:
    # cash is conserved at 1 and round-k history totals k)
    assert 0.5 < sum(rows.values()) < 1.0


def test_cocitation_pairs_hand_graph(spark):
    """Sources 10,11 both cite {1,2}; source 12 cites {1,3}: only
    (1,2) clears min_common=2; with min_common=1 the (1,3) and (2,3)
    style singles appear."""
    edges = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3)],
        ["src", "dst"])
    two = {(r["host_a"], r["host_b"]): r["common_sources"]
           for r in graph.cocitation_pairs(edges, min_common=2).collect()}
    assert two == {(1, 2): 2}
    one = {(r["host_a"], r["host_b"]): r["common_sources"]
           for r in graph.cocitation_pairs(edges, min_common=1).collect()}
    assert one == {(1, 2): 2, (1, 3): 1}


def test_cocitation_max_out_caps_fanout(spark):
    """A source with 3 targets capped at max_out=2 keeps its two
    smallest targets only, so pairs touching the dropped target lose
    that source's vote."""
    edges = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (11, 2), (11, 3)], ["src", "dst"])
    capped = {(r["host_a"], r["host_b"]): r["common_sources"]
              for r in graph.cocitation_pairs(
                  edges, min_common=1, max_out=2).collect()}
    # source 10 keeps {1,2}; pair (2,3) now only from source 11
    assert capped == {(1, 2): 1, (2, 3): 1}


def test_link_spam_signals_hand_graph(spark):
    """A 3-host reciprocal ring (farm) vs an honest hub: the ring flags,
    the hub doesn't; self-links and concentration computed exactly."""
    from sparkcrawl.operators.graph import link_spam_signals

    # farm: 10<->11, 11<->12, 12<->10 (full reciprocity, 2 targets each)
    farm = []
    for a, b in [(10, 11), (11, 12), (12, 10)]:
        farm += [(a, b), (b, a)]
    # honest hub 1 -> 20..24 one-way, plus 3 self-links and a double link to 20
    hub = [(1, t) for t in (20, 21, 22, 23, 24)] + [(1, 20)] + [(1, 1)] * 3
    edges = spark.createDataFrame(farm + hub, ["src", "dst"])
    rows = {r["host"]: r.asDict() for r in
            link_spam_signals(edges, recip_threshold=0.9, min_out_hosts=2).collect()}
    assert rows[1]["out_hosts"] == 5 and rows[1]["out_links"] == 6
    assert rows[1]["self_share"] == round(3 / 9, 6)
    assert rows[1]["recip_share"] == 0.0 and rows[1]["link_farm"] is False
    assert rows[1]["top_target_share"] == round(2 / 6, 6)
    for h in (10, 11, 12):
        assert rows[h]["recip_share"] == 1.0 and rows[h]["link_farm"] is True
        assert rows[h]["out_hosts"] == 2 and rows[h]["self_share"] == 0.0
    # targets with no out-links don't appear
    assert 21 not in rows


def test_referring_domains(spark):
    """Subdomain link farms collapse to one domain vote; distinct
    hosts and raw inlinks still reported."""
    from sparkcrawl.operators.graph import referring_domains

    edges = spark.createDataFrame(
        [("a.spam.example", "target.example"),
         ("b.spam.example", "target.example"),
         ("b.spam.example", "target.example"),      # repeated edge
         ("honest.example", "target.example"),
         ("honest.example", "other.example")],
        ["src", "dst"])
    got = {r["host"]: (r["n_ref_domains"], r["n_ref_hosts"], r["n_inlinks"])
           for r in referring_domains(edges).collect()}
    assert got["target.example"] == (2, 3, 4)   # spam.example counts once
    assert got["other.example"] == (1, 1, 1)


# ---------------------------------------------------------------- hop_depth


def _depths(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(x,) for x in seeds], ["id"])
    return {r["id"]: r["depth"] for r in graph.hop_depth(e, s, **kw).collect()}


def test_hop_depth_chain(spark):
    d = _depths(spark, [(1, 2), (2, 3), (3, 4)], [1])
    assert d == {1: 0, 2: 1, 3: 2, 4: 3}


def test_hop_depth_min_over_paths(spark):
    # 1->4 directly and via 2->3: BFS keeps the minimum
    d = _depths(spark, [(1, 2), (2, 3), (3, 4), (1, 4)], [1])
    assert d[4] == 1


def test_hop_depth_multi_seed_and_cycle(spark):
    d = _depths(spark, [(1, 2), (2, 1), (2, 3), (9, 3)], [1, 9])
    assert d[1] == 0 and d[9] == 0
    assert d[2] == 1
    assert d[3] == 1  # via seed 9, not depth 2 via 1->2->3


def test_hop_depth_bound_and_unreachable(spark):
    d = _depths(spark, [(1, 2), (2, 3), (3, 4), (7, 8)], [1], max_depth=2)
    assert d == {1: 0, 2: 1, 3: 2}  # 4 beyond bound; 7/8 unreachable


def test_hop_depth_isolated_seed_reports_zero(spark):
    d = _depths(spark, [(5, 6)], [1])
    assert d == {1: 0}


def test_hop_depth_early_stop_self_loop_ignored(spark):
    d = _depths(spark, [(1, 1), (1, 2), (2, 2)], [1], max_depth=8)
    assert d == {1: 0, 2: 1}


# ---------------------------------------------------------- seed_attribution


def _attr(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(x,) for x in seeds], ["id"])
    return {r["id"]: (r["depth"], r["seed"])
            for r in graph.seed_attribution(e, s, **kw).collect()}


def test_seed_attribution_nearest_seed_wins(spark):
    # 9 is 1 hop from seed 7 but 2 hops from seed 1 -> attributed to 7
    a = _attr(spark, [(1, 2), (2, 9), (7, 9)], [1, 7])
    assert a[9] == (1, 7)
    assert a[2] == (1, 1)


def test_seed_attribution_tie_breaks_min_seed(spark):
    a = _attr(spark, [(5, 9), (3, 9)], [5, 3])
    assert a[9] == (1, 3)


def test_seed_attribution_propagates_along_tree(spark):
    a = _attr(spark, [(1, 2), (2, 3), (3, 4)], [1, 8])
    assert a == {1: (0, 1), 8: (0, 8), 2: (1, 1), 3: (2, 1), 4: (3, 1)}


def test_seed_attribution_seed_label_beats_later_arrival(spark):
    # seed 9 is itself reachable from seed 1 but keeps (0, 9)
    a = _attr(spark, [(1, 9), (9, 5)], [1, 9])
    assert a[9] == (0, 9)
    assert a[5] == (1, 9)


def test_most_wanted(spark):
    """Unfetched targets only; score = referrer rank mass, so one
    high-rank hub outweighs many low-rank referrers; unknown-rank
    referrers count as 0 mass but still count as inlinks."""
    from sparkcrawl.operators.graph import most_wanted

    edges = spark.createDataFrame(
        [("hub", "gem"), ("spam1", "junk"), ("spam2", "junk"),
         ("spam3", "junk"), ("hub", "alreadyseen"), ("mystery", "gem")],
        ["src", "dst"])
    ranks = spark.createDataFrame(
        [("hub", 10.0), ("spam1", 0.1), ("spam2", 0.1), ("spam3", 0.1)],
        ["node", "rank"])
    seen = spark.createDataFrame([("alreadyseen",), ("hub",)], ["node"])
    got = {r["node"]: r for r in
           most_wanted(edges, ranks, seen).collect()}
    assert set(got) == {"gem", "junk"}
    assert got["gem"]["wanted_score"] == 10.0       # mystery adds 0
    assert got["gem"]["inlinks"] == 2 and got["gem"]["referrers"] == 2
    assert got["junk"]["wanted_score"] == round(0.3, 6)
    assert got["gem"]["wanted_score"] > got["junk"]["wanted_score"]


def test_reciprocity_stats(spark):
    """A two-host link ring flags; a one-way chain does not;
    self-loops and duplicate edges are ignored."""
    from sparkcrawl.operators.graph import reciprocity_stats

    edges = spark.createDataFrame(
        [
            ("ring1", "ring2"), ("ring2", "ring1"),
            ("ring1", "ring2"),                     # dup edge
            ("ring1", "ring1"),                     # self-loop
            ("ring1", "chainA"),                    # one organic outlink
            ("chainA", "chainB"), ("chainB", "chainC"),
        ],
        ["src", "dst"])
    got = {r["host"]: r
           for r in reciprocity_stats(edges, min_out=2).collect()}
    r1 = got["ring1"]
    assert (r1["n_out"], r1["n_reciprocal"]) == (2, 1)
    assert r1["reciprocal_share"] == 0.5 and not r1["flagged"]
    r2 = got["ring2"]
    assert (r2["n_out"], r2["n_reciprocal"]) == (1, 1)
    assert not r2["flagged"]                       # below min_out
    assert got["chainA"]["n_reciprocal"] == 0
    fully = spark.createDataFrame(
        [("x", "y"), ("y", "x"), ("x", "z"), ("z", "x")], ["src", "dst"])
    f = {r["host"]: r for r in reciprocity_stats(fully).collect()}
    assert f["x"]["flagged"] and f["x"]["reciprocal_share"] == 1.0
