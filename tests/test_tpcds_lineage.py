"""TPC-DS lineage robustness sweep.

The reference proves its extractor on the 103 TPC-DS v1.4 queries over a
24-table empty-parquet-table schema (TPCDSFlowTestSuite.scala:22-36,
TPCDSTest.scala:26-55, TPCDSSchema.scala:47-545) — that corpus is the
hardest plan-shape stress test available (multi-level subqueries ×
grouping sets × 20-way joins × INTERSECT chains). This module runs every
query through BOTH extraction modes and asserts the structural invariants
a lineage graph must satisfy; golden edge-sets are impractical at this
plan size, but "no exception + non-empty + every edge endpoint exists +
the query's base tables appear as sources" catches the unhandled-plan-shape
class of bug a real warehouse query would hit.

The query texts are read from the reference checkout (public TPC-DS
benchmark SQL); the sweep skips cleanly when that checkout is absent.
"""

import glob
import os

import pytest

from spark_sql_flow_plugin_spark.api import extract
from spark_sql_flow_plugin_spark.plans.graph import NodeType
from tests.fixtures.tpcds_schema import TPCDS_TABLE_COLUMNS

TPCDS_INPUT_DIR = "/root/reference/src/test/resources/tpcds-flow-tests/inputs"

_QUERY_FILES = sorted(glob.glob(os.path.join(TPCDS_INPUT_DIR, "*.sql")))

pytestmark = pytest.mark.skipif(
    not _QUERY_FILES, reason="TPC-DS query corpus not available"
)


@pytest.fixture(scope="module")
def tpcds(spark):
    """The 24 TPC-DS tables as empty managed parquet tables — real catalog
    relations (like the reference's fixture), so scans exercise the
    LeafNode/stats path, not LocalRelation."""
    for name, cols in TPCDS_TABLE_COLUMNS.items():
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"CREATE TABLE {name} ({cols}) USING parquet")
    yield spark
    for name in TPCDS_TABLE_COLUMNS:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _base_tables(nodes) -> set:
    """TPC-DS base tables appearing as source nodes of a lineage graph."""
    out = set()
    for n in nodes:
        if n.tpe in (NodeType.TABLE, NodeType.LEAF_PLAN):
            for t in TPCDS_TABLE_COLUMNS:
                if t in n.ident:
                    out.add(t)
    return out


@pytest.mark.parametrize(
    "qfile", _QUERY_FILES, ids=[os.path.basename(f)[:-4] for f in _QUERY_FILES]
)
def test_tpcds_query_lineage(tpcds, qfile):
    sql = open(qfile).read()
    df = tpcds.sql(sql)

    # expanded mode: every plan operator is a node
    nodes, edges = extract(df, flow_name=os.path.basename(qfile)[:-4])
    assert nodes and edges, "expanded lineage must be non-empty"
    ids = {n.unique_id for n in nodes}
    for e in edges:
        assert e.from_id in ids and e.to_id in ids, f"dangling edge {e}"
    src = _base_tables(nodes)
    assert src, "every TPC-DS query scans at least one base table"

    # contracted mode: only source tables + the query node survive, and both
    # modes must agree on WHICH base tables feed the query (a mode that
    # drops a source on a deep plan is exactly the bug this sweep hunts)
    cnodes, cedges = extract(df, contracted=True)
    assert cnodes and cedges, "contracted lineage must be non-empty"
    cids = {n.unique_id for n in cnodes}
    for e in cedges:
        assert e.from_id in cids and e.to_id in cids, f"dangling edge {e}"
    assert not any(n.tpe == NodeType.PLAN for n in cnodes)
    assert _base_tables(cnodes) == src, "modes disagree on source tables"
