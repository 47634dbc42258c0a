"""Fixed catalog scenario for golden-file lineage tests — mirrors the
reference SQL-logic corpus shapes (t1/t2 VALUES views; aggregation, joins,
windows, set ops, scalar subqueries over them; see
/root/reference/src/test/resources/sql-flow-tests/inputs/)."""

import re


def build_scenario(spark) -> None:
    spark.sql("CREATE OR REPLACE TEMP VIEW g_t1 AS SELECT * FROM VALUES (1, 10), (1, 20), (2, 30) AS t(a, b)")
    spark.sql("CREATE OR REPLACE TEMP VIEW g_t2 AS SELECT * FROM VALUES (1, 1), (3, 2) AS t(a, c)")
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW g_agg AS "
        "SELECT a, SUM(b) AS sum_b, COUNT(*) AS cnt FROM g_t1 GROUP BY a HAVING COUNT(*) > 0"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW g_semi AS "
        "SELECT a, b FROM g_t1 WHERE a IN (SELECT a FROM g_t2)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW g_union AS "
        "SELECT a FROM g_t1 UNION SELECT a FROM g_t2"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW g_win AS "
        "SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) AS rn FROM g_t1"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW g_sub AS "
        "SELECT a, b FROM g_t1 WHERE b > (SELECT AVG(c) FROM g_t2)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW g_cube AS "
        "SELECT a, b, COUNT(*) AS cnt FROM g_t1 GROUP BY CUBE (a, b)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW g_explode AS "
        "SELECT a, explode(vals) AS v FROM "
        "(SELECT a, collect_list(b) AS vals FROM g_t1 GROUP BY a)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW g_except AS "
        "SELECT a FROM g_t1 EXCEPT SELECT a FROM g_t2"
    )


def drop_scenario(spark) -> None:
    for v in (
        "g_except", "g_explode", "g_cube", "g_sub", "g_win", "g_union",
        "g_semi", "g_agg", "g_t2", "g_t1",
    ):
        spark.catalog.dropTempView(v)


def scenario_edge_set(session, contracted: bool) -> set[str]:
    """Catalog lineage of the session as a normalized edge-line set
    (reference comparison rules, SQLFlowTestUtils.scala:43-56: random id
    suffixes masked, only edge lines compared, order ignored). Run against
    a dedicated ``spark.newSession()`` so only the scenario's temp views
    are in the catalog."""
    from spark_sql_flow_plugin_spark import to_sql_flow_string

    dot = to_sql_flow_string(session, contracted=contracted)
    return {
        re.sub(r"_[0-9a-f]{7}", "_x", line.strip())
        for line in dot.splitlines()
        if " -> " in line
    }
