"""Catalog-mode lineage fuzzing over random multi-stage view DAGs
(round-11 verdict item #5).

The reference's hardest catalog machinery — temp-view collapse and
semanticHash subplan substitution (SQLFlow.scala:94-171) — was previously
tested on hand-written corpora only, while the plan fuzzer exercised
single-statement DataFrame mode. Each seed here builds a random 3-5 stage
temp-view chain on top of a fuzzer-generated base query, registers every
stage in an isolated session catalog, and additionally defines one
"hash reuse" stage from a FRESH re-analysis of the base query's SQL text
(never referencing the base view by name) — the shape that can only be
wired up by semanticHash substitution, not by structural
SubqueryAlias(View) matching.

Invariants per seed, both catalog modes:
- every stage view appears as a graph node and every edge endpoint exists;
- consecutive stages are DIRECTLY connected in contracted mode and
  reachable in expanded mode;
- the hash-reuse stage has a direct contracted edge from the base stage
  (proof the textual copy collapsed to a TempViewNode instead of
  duplicating the base tables);
- contracted never invents source views/tables the expanded mode lacks.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from spark_sql_flow_plugin_spark import fuzz
from spark_sql_flow_plugin_spark.api import extract
from spark_sql_flow_plugin_spark.sources import register_views

N_DAGS = 30


def _transform(rng: random.Random, df):
    """A random type-agnostic stage transform (works on any schema)."""
    cols = df.columns
    c0 = cols[0]
    r = rng.random()
    if r < 0.25:
        return df.where(F.col(c0).isNotNull())
    if r < 0.45:
        keep = cols[: max(1, rng.randint(1, len(cols)))]
        return df.select(*keep).distinct()
    if r < 0.70:
        return df.groupBy(c0).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows")
        )
    if r < 0.85:
        return df.unionAll(df)
    return df.orderBy(F.col(c0).asc_nulls_first()).limit(100)


def _build_dag(spark, sf_dir, seed: int):
    """Register the random view chain in a fresh session; returns
    (session, stage names in order, hash-reuse stage name)."""
    rng = random.Random(10_000 + seed)
    s = spark.newSession()  # isolated temp-view catalog per seed
    register_views(s, sf_dir, *fuzz.FUZZ_TABLES)
    _, base_sql, _ = fuzz.gen_pair(7_000 + seed)
    stages = []
    base = f"st{seed}_0"
    s.sql(base_sql).createOrReplaceTempView(base)
    stages.append(base)
    for i in range(1, rng.randint(3, 5)):
        name = f"st{seed}_{i}"
        prev = s.table(stages[-1])
        _transform(rng, prev).createOrReplaceTempView(name)
        stages.append(name)
    # hash-reuse stage: the base query's TEXT re-analyzed from scratch —
    # no table() reference to the base view anywhere in its plan. The
    # seed-tag projection can never hash-collide with a chain stage
    # (none adds a literal column), so the only collapsible subtree is
    # the inlined base query itself.
    reuse = f"st{seed}_reuse"
    fresh = s.sql(base_sql)
    fresh.select("*", F.lit(seed).alias("seed_tag")).createOrReplaceTempView(
        reuse
    )
    return s, stages, reuse


def _reachable(edges, src: str, dst: str) -> bool:
    adj: dict[str, set[str]] = {}
    for e in edges:
        adj.setdefault(e.from_id, set()).add(e.to_id)
    seen, todo = set(), [src]
    while todo:
        cur = todo.pop()
        if cur == dst:
            return True
        if cur in seen:
            continue
        seen.add(cur)
        todo.extend(adj.get(cur, ()))
    return False


@pytest.mark.parametrize("seed", range(N_DAGS))
def test_catalog_dag_lineage(spark, sf_dir, seed):
    session, stages, reuse = _build_dag(spark, sf_dir, seed)

    xnodes, xedges = extract(session, contracted=False)
    cnodes, cedges = extract(session, contracted=True)

    for nodes, edges, mode in ((xnodes, xedges, "expanded"), (cnodes, cedges, "contracted")):
        assert nodes and edges, f"seed {seed} {mode}: empty catalog graph"
        ids = {n.unique_id for n in nodes}
        for e in edges:
            assert e.from_id in ids and e.to_id in ids, (
                f"seed {seed} {mode}: dangling edge {e.from_id}->{e.to_id}"
            )
        idents = {n.ident for n in nodes}
        missing = (set(stages) | {reuse}) - idents
        assert not missing, f"seed {seed} {mode}: missing stage views {missing}"

    # chain wiring: direct in contracted, reachable in expanded
    cdirect = {(e.from_id, e.to_id) for e in cedges}
    for a, b in zip(stages, stages[1:]):
        assert (a, b) in cdirect, f"seed {seed}: no contracted edge {a}->{b}"
        assert _reachable(xedges, a, b), (
            f"seed {seed}: {b} unreachable from {a} in expanded mode"
        )

    # semanticHash substitution: the reuse stage never names any view,
    # yet its textual copy of the base plan must collapse onto a stage
    # view (stages[0], or a later stage if one happens to be
    # hash-identical to the base) instead of re-deriving base tables
    cpreds = {e.from_id for e in cedges if e.to_id == reuse}
    assert cpreds and cpreds <= set(stages), (
        f"seed {seed}: hash substitution missed — reuse stage fed by"
        f" {cpreds or 'nothing'} instead of a stage view"
    )
    assert _reachable(xedges, stages[0], reuse), (
        f"seed {seed}: reuse stage unreachable from base in expanded mode"
    )

    # mode agreement on source views/tables feeding the DAG
    def _srcs(nodes, edges):
        targets = {e.from_id for e in edges}
        return {
            n.ident
            for n in nodes
            if n.unique_id in targets and n.ident in fuzz.FUZZ_TABLES
        }

    assert _srcs(cnodes, cedges) <= _srcs(xnodes, xedges), (
        f"seed {seed}: contracted invented sources expanded lacks"
    )