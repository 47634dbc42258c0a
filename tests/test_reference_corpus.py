"""Reference SQL-logic corpus sweep.

Runs the reference's own sql-flow-tests inputs (14 files: basics, joins,
group-by/cube, window, set-ops, exists/in/scalar subqueries, lateral FROM
— src/test/resources/sql-flow-tests/inputs/*.sql) statement-by-statement
in an isolated session, then extracts catalog lineage in both modes and
asserts structural validity. Byte-comparing against the reference's golden
DOT files is impossible (Spark 3.2-era optimizer shapes vs 4.x — SURVEY
§8), but the corpus itself now runs verbatim, and the subquery-predicate
file additionally asserts COLUMN-level subquery edges (the
SubqueryPredicate analog, SQLFlow.scala:481-562).

Inputs are read from the reference checkout (public test SQL); the sweep
skips cleanly when the checkout is absent.
"""

import glob
import os
import re

import pytest

from spark_sql_flow_plugin_spark.api import extract

CORPUS_DIR = "/root/reference/src/test/resources/sql-flow-tests/inputs"

_FILES = sorted(glob.glob(os.path.join(CORPUS_DIR, "*.sql")))

pytestmark = pytest.mark.skipif(not _FILES, reason="reference corpus not available")


def _statements(path: str):
    text = open(path).read()
    text = re.sub(r"--[^\n]*", "", text)
    return [s.strip() for s in text.split(";") if s.strip()]


@pytest.fixture()
def corpus_session(spark):
    s = spark.newSession()
    # Spark's standard SQLTestData.testData fixture ((i, i.toString) for
    # 1..100) — the only external table the corpus references; everything
    # else is created by the input files themselves
    s.range(1, 101).selectExpr(
        "cast(id as int) AS key", "cast(id as string) AS value"
    ).createOrReplaceTempView("testData")
    yield s
    for t in s.catalog.listTables():
        if t.isTemporary:
            s.catalog.dropTempView(t.name)


@pytest.mark.parametrize(
    "path", _FILES, ids=[os.path.basename(f)[:-4] for f in _FILES]
)
def test_corpus_catalog_lineage(corpus_session, path):
    s = corpus_session
    for stmt in _statements(path):
        s.sql(stmt)
    for contracted in (False, True):
        nodes, edges = extract(s, contracted=contracted)
        assert nodes and edges, f"{os.path.basename(path)} produced no lineage"
        ids = {n.unique_id for n in nodes}
        for e in edges:
            assert e.from_id in ids and e.to_id in ids, f"dangling edge {e}"


def test_scalar_subquery_predicate_column_edges(corpus_session):
    """The v3 shape of scalar-subquery-predicate.sql: `WHERE t1c = (SELECT
    max(t2c) FROM t2)` must produce a column-level edge from the subquery's
    aggregate into the compared column's ordinal, not a whole-node edge."""
    s = corpus_session
    s.sql(
        "CREATE OR REPLACE TEMP VIEW sq_t1 AS SELECT * FROM VALUES "
        "(1, 2, 3), (4, 5, 6) AS t(t1a, t1b, t1c)"
    )
    s.sql(
        "CREATE OR REPLACE TEMP VIEW sq_t2 AS SELECT * FROM VALUES "
        "(1, 3), (2, 6) AS t(t2a, t2c)"
    )
    df = s.sql(
        "SELECT t1a, t1b FROM sq_t1 WHERE t1c = (SELECT max(t2c) FROM sq_t2)"
    )
    nodes, edges = extract(df, flow_name="flow")
    by_id = {n.unique_id: n for n in nodes}
    agg_ids = {uid for uid, n in by_id.items() if n.ident == "Aggregate"}
    assert agg_ids, "subquery aggregate node missing"
    sub_edges = [e for e in edges if e.from_id in agg_ids]
    # t1c is ordinal 2 in the Filter's output — the precise target
    assert any(
        e.to_idx == 2 and by_id[e.to_id].ident == "Filter" for e in sub_edges
    ), f"no column-level subquery edge: {[str(e) for e in sub_edges]}"
