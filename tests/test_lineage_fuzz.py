"""Property-based lineage fuzzing: random DataFrame pipelines → extraction
invariants. The TPC-DS/corpus sweeps cover real-world shapes; hypothesis
composes operator sequences nobody wrote down (a window over a union over a
join over a cube, ...) and asserts the properties that must hold for EVERY
plan:

- both modes extract without error and non-empty;
- every edge endpoint is a node;
- the query node's columns are the DataFrame's columns;
- contracted mode never emits operator nodes;
- contracted source tables ⊆ expanded source tables (contraction can only
  collapse, never invent sources).

Extraction is analysis-only (no execution), so examples are cheap.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_sql_flow_plugin_spark.api import extract
from spark_sql_flow_plugin_spark.plans.graph import NodeType


def _base(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_regionkey", "n_name")
    )


def _other(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey", "r_name"
    )


def _apply_op(spark, sf_dir, df, op: int):
    """One of 10 plan-shaping operators, keyed by a hypothesis-drawn int.
    Each returns a valid DataFrame regardless of the incoming schema."""
    cols = df.columns
    c0 = cols[0]
    if op == 0:
        return df.where(F.col(c0).cast("string") != "zzz")
    if op == 1:
        return df.select(*cols[: max(1, len(cols) - 1)])
    if op == 2:
        return df.withColumn("derived", F.length(F.col(c0).cast("string")))
    if op == 3:
        return df.groupBy(c0).agg(F.count("*").alias("cnt"))
    if op == 4:
        other = _other(spark, sf_dir)
        joined = df.join(
            other, F.col(c0).cast("long") == other["r_regionkey"], "left"
        )
        # unique column names: a second join would otherwise make later
        # by-name references ambiguous (harness concern, not extractor's)
        return joined.toDF(*[f"c{i}" for i in range(len(joined.columns))])
    if op == 5:
        return df.union(df)
    if op == 6:
        return df.distinct()
    if op == 7:
        return df.orderBy(c0).limit(7)
    if op == 8:
        w = Window.partitionBy(c0).orderBy(F.col(cols[-1]).cast("string"))
        return df.withColumn("rn", F.row_number().over(w))
    if op == 9:
        return df.cube(c0).agg(F.count("*").alias("cnt"))
    if op == 10:
        # alias must be unique per application: applying this op twice would
        # otherwise produce two `ex` columns and make every later by-name
        # reference ambiguous (hypothesis found ops=[10, 10, ...])
        return df.select(
            "*",
            F.explode(F.array(F.col(c0).cast("string"), F.lit("x"))).alias(
                f"ex{len(cols)}"
            ),
        )
    # 11-14: the pandas/arrow map family (FlatMapGroupsInPandas,
    # FlatMapCoGroupsInPandas, MapInPandas, PythonMapInArrow). Extraction
    # is analysis-only, so the identity lambdas never execute — these
    # exercise the plan-node branches, not the UDF runtime.
    schema = ", ".join(f"`{c}` string" for c in df.columns)
    if op == 11:
        return df.select(
            *[F.col(c).cast("string").alias(c) for c in cols]
        ).mapInPandas(lambda it: it, schema)
    if op == 12:
        return (
            df.select(*[F.col(c).cast("string").alias(c) for c in cols])
            .groupBy(c0)
            .applyInPandas(lambda pdf: pdf, schema)
        )
    if op == 13:
        other = _other(spark, sf_dir)
        return (
            df.groupBy(F.col(c0).cast("long"))
            .cogroup(other.groupBy("r_regionkey"))
            .applyInPandas(
                lambda left, right: left,
                ", ".join(f"`{c}` string" for c in df.columns),
            )
        )
    if op == 14:
        return df.select(
            *[F.col(c).cast("string").alias(c) for c in cols]
        ).mapInArrow(lambda it: it, schema)
    return df


@given(ops=st.lists(st.integers(min_value=0, max_value=14), min_size=1, max_size=5))
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_pipeline_lineage_invariants(spark, sf_dir, ops):
    df = _base(spark, sf_dir)
    for op in ops:
        df = _apply_op(spark, sf_dir, df, op)

    nodes, edges = extract(df, flow_name="fuzz")
    assert nodes and edges
    ids = {n.unique_id for n in nodes}
    for e in edges:
        assert e.from_id in ids and e.to_id in ids, f"dangling {e} for ops={ops}"
    qnode = next(n for n in nodes if n.tpe == NodeType.QUERY)
    assert qnode.attribute_names == df.columns

    cnodes, cedges = extract(df, contracted=True, flow_name="cfuzz")
    assert cnodes and cedges
    cids = {n.unique_id for n in cnodes}
    for e in cedges:
        assert e.from_id in cids and e.to_id in cids, f"dangling {e} for ops={ops}"
    assert not any(n.tpe == NodeType.PLAN for n in cnodes), f"plan node, ops={ops}"

    def tables(ns):
        return {
            n.unique_id
            for n in ns
            if n.tpe in (NodeType.TABLE, NodeType.LEAF_PLAN)
        }

    assert tables(cnodes) <= tables(nodes) | {qnode.unique_id}, (
        f"contraction invented a source, ops={ops}"
    )
