"""Negative controls for the differential fuzzer's exactness conventions.

The fuzzer (spark_sql_flow_plugin_spark/fuzz.py) BAKES the repo's
cross-engine conventions into its node constructors, so a clean 750-seed
run proves the conventions are COMPLETE for the generated surface — but
not that each one is load-bearing. These tests prove that: for every
convention, a minimal witness query built WITHOUT it produces a real
Spark/DuckDB divergence (different values, different rows, or a
driver-unfaithful type). If an engine upgrade ever makes one of these
witnesses AGREE, the corresponding convention can be retired — the test
failing in that direction is a signal, not a bug.
"""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_bare_cast_rounds_in_duckdb_truncates_in_spark(spark, duck):
    # convention: floor-quantize money (FLOOR(x*100 + 0.5)), never bare
    # CAST. The operand must be a non-integral DOUBLE (as l_extendedprice
    # * 100 is at runtime — e.g. 6.54*100 = 653.9999999999999); decimal
    # LITERALS constant-fold exactly in both engines and hide it, so the
    # witness pins the runtime double via a string cast.
    q = "SELECT CAST(CAST('653.9999999999999' AS DOUBLE) AS BIGINT) AS v"
    s = spark.sql(q).collect()[0].v
    d = duck.sql(q).fetchall()[0][0]
    assert s == 653 and d == 654  # truncate vs round — the r10 TWA bug
    # and the convention itself agrees:
    qf = "SELECT CAST(FLOOR(CAST('653.9999999999999' AS DOUBLE) + 0.5) AS BIGINT) AS v"
    assert spark.sql(qf).collect()[0].v == duck.sql(qf).fetchall()[0][0] == 654


def test_concat_ignores_nulls_in_duckdb(spark, duck):
    # convention: string concatenation uses || (NULL-propagating both),
    # never concat()
    q = "SELECT concat(CAST(NULL AS STRING), 'x') AS v"
    s = spark.sql(q).collect()[0].v
    d = duck.sql("SELECT concat(CAST(NULL AS VARCHAR), 'x') AS v").fetchall()[0][0]
    assert s is None and d == "x"
    # and the convention itself agrees:
    q2s = spark.sql("SELECT CAST(NULL AS STRING) || 'x' AS v").collect()[0].v
    q2d = duck.sql("SELECT CAST(NULL AS VARCHAR) || 'x' AS v").fetchall()[0][0]
    assert q2s is None and q2d is None


def test_default_null_ordering_diverges_under_limit(spark, duck):
    # convention: LIMIT shapes spell out NULLS FIRST/LAST explicitly
    q = "SELECT v FROM (VALUES (1), (NULL)) t(v) ORDER BY v LIMIT 1"
    s = spark.sql(
        "SELECT v FROM VALUES (1), (NULL) AS t(v) ORDER BY v LIMIT 1"
    ).collect()[0].v
    d = duck.sql(q).fetchall()[0][0]
    assert s is None and d == 1  # Spark ASC=NULLS FIRST, DuckDB=NULLS LAST


def test_uncast_sum_widens_to_pandas_unfaithful_hugeint(duck):
    # convention: integer SUMs carry CAST(... AS BIGINT) in the oracle
    rel = duck.sql("SELECT SUM(v) AS s FROM (VALUES (1), (2)) t(v)")
    assert str(rel.types[0]) == "HUGEINT"  # the r4 hash-red root cause
    rel2 = duck.sql(
        "SELECT CAST(SUM(v) AS BIGINT) AS s FROM (VALUES (1), (2)) t(v)"
    )
    assert str(rel2.types[0]) == "BIGINT"


def test_sequence_descends_in_spark_empty_in_duckdb(spark, duck):
    # convention (sliding-window generators): guard sequence(1, n) with
    # CASE WHEN n >= 1 — Spark yields a DESCENDING [1, 0], DuckDB []
    s = spark.sql("SELECT sequence(1, 0) AS v").collect()[0].v
    d = duck.sql("SELECT generate_series(1, 0) AS v").fetchall()[0][0]
    assert s == [1, 0] and d == []


def test_rollup_over_empty_input_diverges(spark, duck):
    # convention: ROLLUP/CUBE/GROUPING SETS carry HAVING COUNT(*) > 0
    qs = (
        "SELECT v, COUNT(*) AS n FROM VALUES (1) AS t(v)"
        " WHERE v > 99 GROUP BY ROLLUP(v)"
    )
    qd = (
        "SELECT v, COUNT(*) AS n FROM (VALUES (1)) t(v)"
        " WHERE v > 99 GROUP BY ROLLUP(v)"
    )
    s = spark.sql(qs).collect()
    d = duck.sql(qd).fetchall()
    assert len(s) == 0 and len(d) == 1  # duck emits the () super-aggregate
    # guarded form agrees (the q80 fix):
    sg = spark.sql(qs + " HAVING COUNT(*) > 0").collect()
    dg = duck.sql(qd + " HAVING COUNT(*) > 0").fetchall()
    assert len(sg) == 0 and len(dg) == 0


def test_null_in_not_in_list_empties_both_engines(spark, duck):
    # convention behind the anti shape's null-aware variant: per ANSI,
    # `x NOT IN (list containing NULL)` is never TRUE (x <> NULL is
    # unknown), so ONE NULL in the subquery list empties the whole
    # result on BOTH engines — an agreement witness, which is why the
    # fuzzer plants a nullable-but-never-NULL CASE instead (populated
    # values, same null-aware plan). The NOT EXISTS twin ignores NULLs
    # and returns rows: the two forms are NOT equivalent under NULLs.
    q = """
    SELECT v FROM (VALUES (1), (2)) AS t(v)
    WHERE v NOT IN (SELECT u FROM (VALUES (2), (NULL)) AS s(u))
    """
    assert spark.sql(q).collect() == []
    assert duck.sql(q).fetchall() == []
    q_exists = """
    SELECT v FROM (VALUES (1), (2)) AS t(v)
    WHERE NOT EXISTS (SELECT 1 FROM (VALUES (2), (NULL)) AS s(u) WHERE u = v)
    """
    assert [r.v for r in spark.sql(q_exists).collect()] == [1]
    assert duck.sql(q_exists).fetchall() == [(1,)]


def test_integer_division_conventions_agree_on_abs(spark, duck):
    # convention: DIV (Spark) pairs with // (DuckDB) on abs()-wrapped
    # dividends; this witnesses they agree there (both truncate toward
    # zero even unwrapped TODAY — the abs() guard is belt-and-braces
    # against either engine adopting floor semantics)
    s = spark.sql("SELECT -7 DIV 2 AS a, abs(-7) DIV 2 AS b").collect()[0]
    d = duck.sql("SELECT -7 // 2 AS a, abs(-7) // 2 AS b").fetchall()[0]
    assert (s.a, s.b) == d == (-3, 3)


def test_grouping_sets_join_equated_keys_diverge(spark, duck):
    # convention: NULL-filling shapes (ROLLUP/CUBE/GROUPING SETS) never
    # draw two keys that are provably equal via the join chain
    # (fuzz._join_equated). Witness: under ON b = a, the SQL-standard
    # result NULL-fills the non-grouped column per set — Spark does —
    # while DuckDB's equivalence-class rewrite substitutes b -> a BEFORE
    # grouping-sets expansion and emits the join value in BOTH columns
    # (found live by seed 10128 after ~2,750 green seed-runs). If an
    # engine upgrade makes this witness AGREE, the guard can be retired.
    q = """
    SELECT a AS c0, b AS c1, CAST(COUNT(*) AS BIGINT) AS c2
    FROM (VALUES (1, 10), (2, 20)) t(k, v)
    JOIN (VALUES (1, 100), (2, 200)) u(a, w) ON a = k
    JOIN (VALUES (1, 1000), (2, 2000)) s(b, z) ON b = a
    GROUP BY GROUPING SETS ((a), (b), (a, b), ())
    """
    s = sorted(str((r.c0, r.c1, r.c2)) for r in spark.sql(q).collect())
    d = sorted(str(t) for t in duck.sql(q).fetchall())
    # Spark: standard NULL-fill — set (a) leaves c1 NULL and vice versa
    assert "(1, None, 1)" in s and "(None, 1, 1)" in s
    # DuckDB: equivalence-collapsed — no half-NULL rows at all
    assert not any("None, 1" in x or "1, None" in x for x in d)
    assert s != d


def test_lateral_sum_only_empty_group_diverges(spark, duck):
    # convention (r14, _shape_lateral): every generated LATERAL aggregate
    # list includes CAST(COUNT(*) AS BIGINT). Witness for WHY: DuckDB
    # 1.0's decorrelation of a correlated lateral aggregate WITHOUT a
    # count drops outer rows whose per-key group is empty — the textbook
    # COUNT bug — while the SQL standard (and Spark) emit the outer row
    # with a NULL aggregate. Adding COUNT(*) flips DuckDB to the correct
    # left-join plan. If an engine upgrade makes the sum-only form
    # agree, the convention can be retired.
    bad = """
    SELECT x, v.s FROM (VALUES (1), (2)) t(x),
    LATERAL (SELECT SUM(y) AS s FROM (VALUES (1, 10), (2, 20)) u(k, y)
             WHERE k = x AND y < 15) v
    """
    s = sorted(tuple(r) for r in spark.sql(bad).collect())
    d = sorted(duck.sql(bad).fetchall())
    assert s == [(1, 10), (2, None)]  # standard: empty group -> NULL row
    assert d == [(1, 10)]  # DuckDB: outer row x=2 silently dropped
    good = """
    SELECT x, v.s, v.c FROM (VALUES (1), (2)) t(x),
    LATERAL (SELECT SUM(y) AS s, CAST(COUNT(*) AS BIGINT) AS c
             FROM (VALUES (1, 10), (2, 20)) u(k, y)
             WHERE k = x AND y < 15) v
    """
    s2 = sorted(tuple(r) for r in spark.sql(good).collect())
    d2 = sorted(duck.sql(good).fetchall())
    assert s2 == d2 == [(1, 10, 1), (2, None, 0)]


def test_grouping_sets_coalesce_wrapper_restores_standard(spark, duck):
    # r14 (verdict item #6): the guard became COVERAGE — the grammar
    # keeps generating join-equated grouping-sets keys and wraps the
    # ORACLE side's second key in COALESCE(e, e), which DuckDB's
    # equivalence rewrite cannot collapse (probed: `e + 0` constant-
    # folds away and still collapses; COALESCE survives). Same witness
    # query as the divergence test, wrapped — must now MATCH Spark's
    # standard NULL-fill bit-for-bit.
    qs = """
    SELECT a AS c0, b AS c1, CAST(COUNT(*) AS BIGINT) AS c2
    FROM (VALUES (1, 10), (2, 20)) t(k, v)
    JOIN (VALUES (1, 100), (2, 200)) u(a, w) ON a = k
    JOIN (VALUES (1, 1000), (2, 2000)) s(b, z) ON b = a
    GROUP BY GROUPING SETS ((a), (b), (a, b), ())
    """
    qd = """
    SELECT a AS c0, COALESCE(b, b) AS c1, CAST(COUNT(*) AS BIGINT) AS c2
    FROM (VALUES (1, 10), (2, 20)) t(k, v)
    JOIN (VALUES (1, 100), (2, 200)) u(a, w) ON a = k
    JOIN (VALUES (1, 1000), (2, 2000)) s(b, z) ON b = a
    GROUP BY GROUPING SETS ((a), (COALESCE(b, b)), (a, COALESCE(b, b)), ())
    """
    s = sorted(str((r.c0, r.c1, r.c2)) for r in spark.sql(qs).collect())
    d = sorted(str(t) for t in duck.sql(qd).fetchall())
    assert "(1, None, 1)" in s and "(None, 1, 1)" in s  # standard fill
    assert s == d


def test_join_equated_guard_matches_witness_pair():
    from spark_sql_flow_plugin_spark.fuzz import Ex, _join_equated, _same

    a = _same("n_nationkey", "int", 50)
    b = _same("s_nationkey", "int", 50)
    assert _join_equated(a, b)
    # same member twice is NOT equated (rewrite can't unify anything)
    assert not _join_equated(a, _same("(abs(n_nationkey) % 3)", "int", 3))
    # derived expressions over distinct members ARE treated as equated
    # (conservative: the rewrite applies inside expressions too)
    assert _join_equated(
        Ex("(abs(s_nationkey) % 7)", "(abs(s_nationkey) % 7)", "int", 7), a
    )
    assert not _join_equated(a, _same("p_size", "int", 60))
