"""Lineage extraction over MACHINE-GENERATED plans: the differential
fuzzer's seeded queries double as a plan-shape fuzzer for the lineage
engine. The registry sweep covers 355 hand-written plans and the TPC-DS
sweep covers 103 corpus plans — all chosen by an author; these 80 seeds
produce join/aggregate/window/set-op/rollup/subquery/limit combinations
nobody curated, and every one must still yield a connected,
column-attributed graph in BOTH extraction modes with agreeing source
tables (the same invariants as test_lineage_over_registry /
test_tpcds_lineage)."""

from __future__ import annotations

import pytest

from spark_sql_flow_plugin_spark import extract, fuzz
from spark_sql_flow_plugin_spark.sources import register_views

N_SEEDS = 80


@pytest.fixture(scope="module")
def fuzz_session(spark, sf_dir):
    s = spark.newSession()  # isolated temp-view catalog
    register_views(s, sf_dir, *fuzz.FUZZ_TABLES)
    return s


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_lineage_over_generated_plan(fuzz_session, seed):
    shape, s_sql, _ = fuzz.gen_pair(seed)
    df = fuzz_session.sql(s_sql)
    nodes, edges = extract(df, flow_name=f"fz_{seed}")
    assert nodes and edges, f"seed {seed} ({shape}): empty graph"
    by_id = {n.unique_id for n in nodes}
    for e in edges:
        assert e.from_id in by_id and e.to_id in by_id
    qnode = next(n for n in nodes if n.tpe.value == "QueryNode")
    assert qnode.attribute_names == df.columns
    cnodes, cedges = extract(df, contracted=True, flow_name=f"cfz_{seed}")
    assert {n.tpe.value for n in cnodes} <= {
        "TableNode",
        "LeafPlanNode",
        "QueryNode",
    }
    # both modes must agree on which source tables feed the query
    def _sources(ns):
        return {
            n.ident.rsplit("/", 1)[-1]
            for n in ns
            if n.tpe.value in ("TableNode", "LeafPlanNode")
        }

    assert _sources(cnodes) <= _sources(nodes)
    # the contracted graph keeps at least one source wired to the query
    cids = {n.unique_id for n in cnodes}
    assert any(e.to_id == f"cfz_{seed}" for e in cedges), (
        f"seed {seed}: no edge reaches the contracted query node"
    )
    assert all(e.from_id in cids and e.to_id in cids for e in cedges)
