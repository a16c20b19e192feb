"""Fixed-point PageRank + bounded k-hop BFS (operators/graph_algos.py).

PageRank ground truth is an independent pure-Python integer model run in
the test itself; the sf-scale driver queries get unrolled DuckDB CTE
oracles.
"""

import pytest
from pyspark.sql import functions as F

from meresco_rdf_spark.operators.graph_algos import SCALE, k_hop, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _model_pagerank(pairs, iterations, damping_pct=85):
    """Reference model: same fixed-point integer recurrence, plain dicts."""
    out = {}
    for s, _ in pairs:
        out[s] = out.get(s, 0) + 1
    nodes = {n for e in pairs for n in e}
    rank = {n: SCALE for n in nodes}
    base = (100 - damping_pct) * SCALE // 100
    for _ in range(iterations):
        inflow = {n: 0 for n in nodes}
        for s, d in pairs:
            inflow[d] += (rank[s] * damping_pct) // (100 * out[s])
        rank = {n: base + inflow[n] for n in nodes}
    return rank


@pytest.mark.parametrize("iterations", [1, 3, 5])
def test_pagerank_matches_integer_model(spark, iterations):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c")]  # d is a source-only node; no one links to d
    got = {r["node"]: r["rank"]
           for r in pagerank(_edges(spark, pairs),
                             iterations=iterations).collect()}
    assert got == _model_pagerank(pairs, iterations)


def test_pagerank_dangling_node_keeps_base_rank(spark):
    # b has no out-edges (dangling): it receives but never sends
    pairs = [("a", "b")]
    got = {r["node"]: r["rank"]
           for r in pagerank(_edges(spark, pairs), iterations=2).collect()}
    assert got == _model_pagerank(pairs, 2)
    # a receives nothing -> floor rank
    assert got["a"] == 15 * SCALE // 100


def test_pagerank_checkpoint_interval_is_transparent(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b")]
    r1 = {r["node"]: r["rank"]
          for r in pagerank(_edges(spark, pairs), iterations=6,
                            checkpoint_every=2).collect()}
    r2 = {r["node"]: r["rank"]
          for r in pagerank(_edges(spark, pairs), iterations=6,
                            checkpoint_every=100).collect()}
    assert r1 == r2 == _model_pagerank(pairs, 6)


def test_pagerank_rejects_bad_damping(spark):
    with pytest.raises(ValueError):
        pagerank(_edges(spark, [("a", "b")]), damping_pct=0)


def test_khop_chain_min_hops(spark):
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"),
                           ("a", "c")])  # shortcut a->c
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["hops"] for r in k_hop(edges, seeds, k=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}  # min hops via shortcut


def test_khop_direction_in_and_both(spark):
    edges = _edges(spark, [("a", "b"), ("c", "b")])
    seeds = spark.createDataFrame([("b",)], "node string")
    got_in = {r["node"]: r["hops"]
              for r in k_hop(edges, seeds, k=1, direction="in").collect()}
    assert got_in == {"b": 0, "a": 1, "c": 1}
    got_out = {r["node"]: r["hops"]
               for r in k_hop(edges, seeds, k=1, direction="out").collect()}
    assert got_out == {"b": 0}
    got_both = {r["node"]: r["hops"]
                for r in k_hop(edges, seeds, k=3, direction="both").collect()}
    assert got_both == {"b": 0, "a": 1, "c": 1}


def test_khop_stops_early_when_frontier_drains(spark):
    edges = _edges(spark, [("a", "b")])
    seeds = spark.createDataFrame([("a",)], "node string")
    # k far larger than the graph diameter: loop must drain, not spin
    got = {r["node"]: r["hops"] for r in k_hop(edges, seeds, k=50).collect()}
    assert got == {"a": 0, "b": 1}


def test_khop_bad_direction(spark):
    with pytest.raises(ValueError):
        k_hop(_edges(spark, [("a", "b")]),
              spark.createDataFrame([("a",)], "node string"), k=1,
              direction="sideways")


# ---------------------------------------------------------------------------
# shortest_paths
# ---------------------------------------------------------------------------

def _wedges(spark, triples_):
    return spark.createDataFrame(
        triples_, "src string, dst string, weight long")


def _model_sssp(triples_, sources, max_hops):
    """Reference model: hop-bounded Bellman-Ford over plain dicts."""
    dist = {s: 0 for s in sources}
    for _ in range(max_hops):
        nxt = dict(dist)
        for s, d, w in triples_:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        if nxt == dist:
            break
        dist = nxt
    return dist


def _run_sssp(spark, triples_, sources, max_hops=10):
    from meresco_rdf_spark.operators.graph_algos import shortest_paths
    src = spark.createDataFrame([(s,) for s in sources], "node string")
    got = {r["node"]: r["dist"]
           for r in shortest_paths(_wedges(spark, triples_), src,
                                   max_hops=max_hops).collect()}
    return got


def test_sssp_negative_weight_rejected(spark):
    # convergence/early-exit is only sound for non-negative weights;
    # silently wrong distances are worse than a loud refusal
    from meresco_rdf_spark.operators.graph_algos import shortest_paths
    src = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError, match="non-negative"):
        shortest_paths(_wedges(spark, [("a", "b", -1)]), src, max_hops=3)


def test_sssp_validate_weights_opt_out(spark):
    # callers that own a pre-validated edge table skip the guard scan
    # entirely (validate_weights=False) — results on a valid corpus are
    # identical, and the caller accepts responsibility for weight signs
    from meresco_rdf_spark.operators.graph_algos import shortest_paths
    src = spark.createDataFrame([("a",)], "node string")
    tri = [("a", "b", 2), ("b", "c", 3)]
    got = {r["node"]: r["dist"]
           for r in shortest_paths(_wedges(spark, tri), src, max_hops=4,
                                   validate_weights=False).collect()}
    assert got == {"a": 0, "b": 2, "c": 5}
    # with the guard off, a negative weight is NOT rejected — documents
    # that the opt-out genuinely removes the scan
    shortest_paths(_wedges(spark, [("a", "b", -1)]), src, max_hops=1,
                   validate_weights=False).collect()


def test_sssp_guard_is_single_job(spark):
    # the guard must be ONE aggregate job (round-4 verdict #4): the old
    # filter+limit+count form ran a limit-escalation job cascade that
    # never short-circuited on all-positive corpora.  Baseline-relative
    # pin: the guarded call may run at most ONE more Spark job than the
    # opt-out call on the same input.
    from meresco_rdf_spark.operators.graph_algos import shortest_paths

    def n_jobs(**kw):
        src = spark.createDataFrame([("a",)], "node string")
        edges = _wedges(spark, [("a", "b", 1)])
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        shortest_paths(edges, src, max_hops=1, **kw)
        return len(tracker.getJobIdsForGroup(None) or []) - before

    without = n_jobs(validate_weights=False)
    with_guard = n_jobs(validate_weights=True)
    assert with_guard - without <= 1, (without, with_guard)


def test_sssp_matches_model(spark):
    tri = [("a", "b", 4), ("a", "c", 1), ("c", "b", 1), ("b", "d", 1),
           ("c", "d", 10), ("d", "e", 2)]
    got = _run_sssp(spark, tri, ["a"])
    assert got == _model_sssp(tri, ["a"], 10)
    assert got["b"] == 2 and got["d"] == 3 and got["e"] == 5


def test_sssp_multi_source_takes_min(spark):
    tri = [("a", "m", 5), ("b", "m", 1), ("m", "z", 1)]
    got = _run_sssp(spark, tri, ["a", "b"])
    assert got["m"] == 1 and got["z"] == 2
    assert got["a"] == 0 and got["b"] == 0


def test_sssp_cycle_converges(spark):
    # ring with a cheap long way round: a->b direct 10 vs a->c->d->b = 3
    tri = [("a", "b", 10), ("a", "c", 1), ("c", "d", 1), ("d", "b", 1),
           ("b", "a", 1)]
    got = _run_sssp(spark, tri, ["a"])
    assert got == _model_sssp(tri, ["a"], 10)
    assert got["b"] == 3


def test_sssp_hop_bound_limits_walks(spark):
    # cheapest path needs 3 edges; with max_hops=2 only the expensive
    # 1-edge walk is admissible
    tri = [("a", "b", 10), ("a", "c", 1), ("c", "d", 1), ("d", "b", 1)]
    got = _run_sssp(spark, tri, ["a"], max_hops=2)
    assert got["b"] == 10
    assert got == _model_sssp(tri, ["a"], 2)


def test_sssp_unreachable_absent(spark):
    tri = [("a", "b", 1), ("x", "y", 1)]
    got = _run_sssp(spark, tri, ["a"])
    assert "x" not in got and "y" not in got


def test_sssp_equal_paths_deterministic(spark):
    tri = [("a", "b", 2), ("a", "c", 1), ("c", "b", 1)]
    got = _run_sssp(spark, tri, ["a"])
    assert got["b"] == 2


def test_sssp_rejects_zero_hops(spark):
    from meresco_rdf_spark.operators.graph_algos import shortest_paths
    src = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError):
        shortest_paths(_wedges(spark, [("a", "b", 1)]), src, max_hops=0)


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

def _model_hits(pairs, iterations):
    from meresco_rdf_spark.operators.graph_algos import HITS_SCALE
    pairs = sorted(set(pairs))
    nodes = sorted({n for e in pairs for n in e})
    auth = {n: HITS_SCALE for n in nodes}
    hub = {n: HITS_SCALE for n in nodes}

    def phase(scores, incoming):
        raw = {n: 0 for n in nodes}
        for s, d in pairs:
            if incoming:
                raw[d] += scores[s]
            else:
                raw[s] += scores[d]
        mx = max(raw.values()) or 1
        return {n: (v * HITS_SCALE) // mx for n, v in raw.items()}

    for _ in range(iterations):
        auth = phase(hub, True)
        hub = phase(auth, False)
    return auth, hub


@pytest.mark.parametrize("iterations", [1, 3])
def test_hits_matches_integer_model(spark, iterations):
    from meresco_rdf_spark.operators.graph_algos import hits
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"), ("c", "a")]
    got = {r["node"]: (r["auth"], r["hub"])
           for r in hits(_edges(spark, pairs),
                         iterations=iterations).collect()}
    auth, hub = _model_hits(pairs, iterations)
    assert got == {n: (auth[n], hub[n]) for n in auth}


def test_hits_hub_and_authority_separate(spark):
    from meresco_rdf_spark.operators.graph_algos import HITS_SCALE, hits
    # star: h points at a1..a3 — h is the max hub with zero authority,
    # targets are max-tied authorities with zero hub
    pairs = [("h", "a1"), ("h", "a2"), ("h", "a3")]
    got = {r["node"]: (r["auth"], r["hub"])
           for r in hits(_edges(spark, pairs), iterations=2).collect()}
    assert got["h"] == (0, HITS_SCALE)
    assert got["a1"] == (HITS_SCALE, 0)
    assert got["a1"] == got["a2"] == got["a3"]


def test_hits_parallel_edges_count_once(spark):
    from meresco_rdf_spark.operators.graph_algos import hits
    base = [("a", "b"), ("c", "b")]
    got1 = {r["node"]: (r["auth"], r["hub"])
            for r in hits(_edges(spark, base), iterations=1).collect()}
    got2 = {r["node"]: (r["auth"], r["hub"])
            for r in hits(_edges(spark, base + [("a", "b")]),
                          iterations=1).collect()}
    assert got1 == got2


def test_hits_rejects_zero_iterations(spark):
    from meresco_rdf_spark.operators.graph_algos import hits
    with pytest.raises(ValueError):
        hits(_edges(spark, [("a", "b")]), iterations=0)


# ---------------------------------------------------------------------------
# deterministic_walks
# ---------------------------------------------------------------------------

def _model_walks(pairs, starts, steps):
    import hashlib

    def h(wid, step, dst):
        m = hashlib.md5(("\x1f".join([wid, str(step), dst])).encode())
        return int(m.hexdigest()[:15], 16)

    out_adj = {}
    for s, d in sorted(set(pairs)):
        out_adj.setdefault(s, []).append(d)
    rows = []
    for wid in sorted(set(starts)):
        node = wid
        rows.append((wid, 0, node))
        for step in range(1, steps + 1):
            nbrs = out_adj.get(node)
            if not nbrs:
                break
            node = min(nbrs, key=lambda d: (h(wid, step, d), d))
            rows.append((wid, step, node))
    return sorted(rows)


def _run_walks(spark, pairs, starts, steps):
    from meresco_rdf_spark.operators.graph_algos import deterministic_walks
    s = spark.createDataFrame([(x,) for x in starts], "node string")
    return sorted(tuple(r) for r in deterministic_walks(
        _edges(spark, pairs), s, steps).collect())


def test_walks_match_model(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
             ("d", "a"), ("d", "b")]
    assert _run_walks(spark, pairs, ["a", "b", "d"], 5) \
        == _model_walks(pairs, ["a", "b", "d"], 5)


def test_walks_end_at_sinks(spark):
    pairs = [("a", "b")]  # b is a sink
    got = _run_walks(spark, pairs, ["a"], 5)
    assert got == [("a", 0, "a"), ("a", 1, "b")]


def test_walks_partitioning_invariant(spark):
    pairs = [("n%d" % i, "n%d" % ((i * 3 + 1) % 20)) for i in range(20)]
    pairs += [("n%d" % i, "n%d" % ((i + 7) % 20)) for i in range(20)]
    starts = ["n0", "n5", "n13"]
    a = _run_walks(spark, pairs, starts, 6)
    from meresco_rdf_spark.operators.graph_algos import deterministic_walks
    s = spark.createDataFrame([(x,) for x in starts], "node string")
    b = sorted(tuple(r) for r in deterministic_walks(
        _edges(spark, pairs).repartition(13), s, 6).collect())
    assert a == b == _model_walks(pairs, starts, 6)


def test_walks_reject_zero_steps(spark):
    from meresco_rdf_spark.operators.graph_algos import deterministic_walks
    s = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError):
        deterministic_walks(_edges(spark, [("a", "b")]), s, 0)
