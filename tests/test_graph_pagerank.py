"""Third-implementation check for graph_pagerank_centrality: a pure-Python
fixed-point PageRank (hashlib md5, Python ints — exact by construction)
must reproduce the Spark DataFrame loop bit-for-bit. The DuckDB oracle
already cross-checks Spark; this adds an implementation that shares NO
engine code with either, so a common-mode SQL mistake can't hide."""

import hashlib

from spark_sql_flow_plugin_spark.operators import graphs
from spark_sql_flow_plugin_spark.registry import queries


def _py_pagerank(doc_ids):
    n = len(doc_ids)
    ids = sorted(doc_ids)
    edges = []
    for d in ids:
        for k in range(1, graphs._FANOUT + 1):
            h = hashlib.md5(f"{d}:{k}".encode()).hexdigest()[:8]
            dst = int(h, 16) % n
            if dst != d:
                edges.append((d, dst))
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    init = graphs._SCALE // n
    base = ((graphs._DAMP_DEN - graphs._DAMP_NUM) * init) // graphs._DAMP_DEN
    rank = {d: init for d in ids}
    for _ in range(graphs._K):
        contrib = {d: 0 for d in ids}
        for s, t in edges:
            contrib[t] += rank[s] // out_deg[s]
        rank = {
            d: base + (graphs._DAMP_NUM * contrib[d]) // graphs._DAMP_DEN
            for d in ids
        }
    return rank, out_deg


def test_pagerank_matches_pure_python(spark, sf_dir):
    rows = queries()["graph_pagerank_centrality"](spark, sf_dir).collect()
    # doc_ids are 0..N-1 by construction of the testdata generator; the
    # python model re-derives the same edge set from the ids themselves
    ids = [r.doc_id for r in rows]
    rank, out_deg = _py_pagerank(ids)
    assert len(rows) == len(ids)
    for r in rows:
        assert r.rank_fp == rank[r.doc_id], r.doc_id
        assert r.out_deg == out_deg.get(r.doc_id, 0), r.doc_id
    # total rank mass is conserved up to integer-division loss: never
    # above the fixed-point scale, never absurdly below it
    total = sum(rank.values())
    assert total <= graphs._SCALE
    assert total >= graphs._SCALE * 0.5
