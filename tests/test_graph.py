"""Graph analytics operators: degrees, degree distribution, and
degree-ordered triangle counting vs a pure-Python oracle."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from lexicator_spark.operators import graph as G


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "a string, b string"
    ).distinct()


def test_known_graph(spark):
    # square a-b-c-d-a plus diagonal a-c: triangles (a,b,c), (a,c,d)
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("a", "c")]
    edges = _edges_df(spark, pairs)
    degs = {r.node: r.degree for r in G.degrees(edges).collect()}
    assert degs == {"a": 3, "b": 2, "c": 3, "d": 2}
    dist = {r.degree: r.n_nodes for r in G.degree_distribution(edges).collect()}
    assert dist == {2: 2, 3: 2}
    assert G.triangle_count(edges).first().n_triangles == 2


def test_triangle_count_matches_bruteforce_on_random_graphs(spark):
    """The degree-ordered orientation counts each triangle exactly
    once on arbitrary graphs — compared against the O(n^3) oracle."""
    rng = random.Random(7)
    for trial in range(3):
        nodes = [f"n{i:02d}" for i in range(18)]
        pairs = {
            tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)
        }
        want = sum(
            1
            for u, v, w in itertools.combinations(sorted(nodes), 3)
            if (u, v) in pairs and (v, w) in pairs and (u, w) in pairs
        )
        got = G.triangle_count(_edges_df(spark, pairs)).first().n_triangles
        assert got == want, f"trial {trial}: {got} != {want}"


def _py_pagerank(pairs, damping=0.85, iterations=10, undirected=True):
    """Reference implementation of the exact same fixed-iteration
    update rule (incl. uniform dangling-mass redistribution)."""
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        if undirected:
            edges.add((b, a))
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {u: 0 for u in nodes}
    for u, _v in edges:
        out[u] += 1
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(iterations):
        contrib = {u: 0.0 for u in nodes}
        for u, v in edges:
            contrib[v] += rank[u] / out[u]
        dangling = sum(rank[u] for u in nodes if out[u] == 0)
        rank = {
            u: (1 - damping) / n + damping * (contrib[u] + dangling / n)
            for u in nodes
        }
    return rank


def test_pagerank_matches_reference_undirected(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("a", "c")]
    want = _py_pagerank(pairs)
    got = {
        r.node: r.rank for r in G.pagerank(_edges_df(spark, pairs)).collect()
    }
    assert set(got) == set(want)
    assert all(abs(got[u] - want[u]) < 1e-9 for u in want)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the degree-3 hubs outrank the degree-2 nodes
    assert min(got["a"], got["c"]) > max(got["b"], got["d"])


def test_pagerank_directed_with_dangling(spark):
    """Directed chain into a sink: the sink's rank leaks back uniformly
    (dangling correction) so ranks stay a distribution."""
    pairs = [("u", "v"), ("v", "w")]  # w is dangling
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {
        r.node: r.rank
        for r in G.pagerank(df, undirected=False, iterations=8).collect()
    }
    want = _py_pagerank(pairs, iterations=8, undirected=False)
    assert all(abs(got[u] - want[u]) < 1e-9 for u in want)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["w"] > got["v"] > got["u"]


def test_cooccurrence_edges(spark):
    mentions = spark.createDataFrame(
        [
            ("c1", "x"), ("c1", "y"), ("c1", "y"),  # dup mention collapses
            ("c2", "y"), ("c2", "z"),
            ("c3", "w"),  # singleton group: no edges
        ],
        "conv_id string, surface string",
    )
    got = {
        (r.a, r.b) for r in G.cooccurrence_edges(mentions).collect()
    }
    assert got == {("x", "y"), ("y", "z")}
