"""Round-12 property tests.

Schank & Wagner (2005) degree-ordered triangle counting: the operator's
scale posture on power-law graphs is that orienting each undirected edge
from its lower-(degree, id) endpoint bounds every out-degree — and hence
wedge/intersection work — at O(sqrt |E|), where naive key ordering costs
C(hub_degree, 2) at every hub. These tests hold (a) the star-graph
collapse witness for that claim, (b) triangle-set correctness of the
oriented intersection machinery against a brute-force reference on a
seeded random graph, and (c) orientation soundness (it is a bijection on
the undirected edge set).
"""

import itertools
import random

from pyspark.sql import functions as F

from spark_sql_flow_plugin_spark.operators.graphs import (
    count_wedges,
    orient_edges_by_degree,
    triangle_corners,
)


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(int(i), int(j)) for i, j in edges], "i bigint, j bigint"
    )


def test_degree_orientation_collapses_star_wedges(spark):
    # hub 0 linked to 200 leaves; hub has the LOWEST id, so key ordering
    # (the pre-r12 shape) orients every edge out of the hub and pays
    # C(200, 2) = 19900 wedges; degree ordering points every arc INTO
    # the hub (leaves have degree 1 < 200) and pays ZERO
    star = [(0, leaf) for leaf in range(1, 201)]
    pairs = _pairs_df(spark, star)
    oriented = orient_edges_by_degree(pairs)
    assert count_wedges(oriented).count() == 0
    # the naive key-ordered wedge count on the same star, for contrast
    key_wedges = sum(1 for _ in itertools.combinations(range(1, 201), 2))
    assert key_wedges == 19_900


def test_degree_orientation_bounds_skewed_graph_wedges(spark):
    # power-law-ish graph: one hub wired to every node, plus a sparse
    # random background — the shape crawl link graphs actually have.
    # Key ordering pays >= C(hub_degree, 2); degree ordering's wedge
    # count must come in far under it (the hub's arcs all point INTO it)
    rng = random.Random(12)
    n = 300
    edges = {(0, v) for v in range(1, n)}
    for _ in range(400):
        u, v = rng.randrange(1, n), rng.randrange(1, n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    pairs = _pairs_df(spark, sorted(edges))
    oriented = orient_edges_by_degree(pairs)
    got = count_wedges(oriented).count()
    hub_cost = (n - 1) * (n - 2) // 2  # what key ordering pays at the hub
    assert got < hub_cost // 20, f"wedges {got} did not collapse vs {hub_cost}"


def test_oriented_triangles_match_bruteforce(spark):
    # seeded Erdos-Renyi-ish graph; triangle multiset from the oriented
    # intersection machinery must equal the brute-force reference
    rng = random.Random(7)
    n = 60
    edges = sorted(
        {
            (min(u, v), max(u, v))
            for u, v in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(500)
            )
            if u != v
        }
    )
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {
        (a, b, c)
        for a in adj
        for b in adj[a]
        if b > a
        for c in adj[a] & adj[b]
        if c > b
    }
    pairs = _pairs_df(spark, edges)
    rows = triangle_corners(orient_edges_by_degree(pairs)).collect()
    got = {tuple(sorted((r.u, r.v, r.w))) for r in rows}
    assert len(rows) == len(got), "a triangle was listed more than once"
    assert got == want


def test_orientation_is_bijection_on_edges(spark):
    # every undirected input edge appears exactly once, as exactly one
    # arc, and dord is strictly the larger packed (degree, id) key
    rng = random.Random(3)
    edges = sorted(
        {
            (min(u, v), max(u, v))
            for u, v in (
                (rng.randrange(40), rng.randrange(40)) for _ in range(200)
            )
            if u != v
        }
    )
    pairs = _pairs_df(spark, edges)
    rows = orient_edges_by_degree(pairs).collect()
    assert len(rows) == len(edges)
    assert {tuple(sorted((r.src, r.dst))) for r in rows} == set(edges)
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    base = 4_294_967_296
    for r in rows:
        assert (deg[r.src], r.src) < (deg[r.dst], r.dst)
        assert r.dord == deg[r.dst] * base + r.dst
