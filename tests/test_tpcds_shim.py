"""TPC-DS shim materializer concurrency + self-healing contract.

Round-7 verdict demonstrated a cross-application race: the materializer
rmtree'd every ``.tpcds_shim/<app>`` dir that wasn't the *current*
application's, so two concurrent Spark apps on one checkout (pytest +
bench, driver + builder) deleted each other's live shim parquet
mid-query (42/74 TPC-DS queries failed with FAILED_READ_FILE). The
round-8 contract: dirs are keyed ``<applicationId>-<pid>``; reaping
skips any sibling whose pid is alive; a vanished table dir is
re-materialized instead of trusted via the in-memory ``done`` set.
"""

import os
import shutil

import pytest

from spark_sql_flow_plugin_spark.operators import tpcds
from spark_sql_flow_plugin_spark.registry import queries


def _shim_base():
    return os.path.join(tpcds._repo_root(), ".tpcds_shim")


def test_live_sibling_app_dir_never_reaped(spark, sf_dir):
    # simulate a second *live* application on the same checkout: its dir
    # embeds a pid that exists (our own), under a different appId
    base = _shim_base()
    os.makedirs(base, exist_ok=True)
    other = os.path.join(base, "local-9999999999999-%d" % os.getpid())
    os.makedirs(other, exist_ok=True)
    sentinel = os.path.join(other, "sf0.1", "date_dim")
    os.makedirs(sentinel, exist_ok=True)
    with open(os.path.join(sentinel, "part-000.parquet"), "w") as f:
        f.write("live data belonging to another application")
    try:
        queries()["tpcds_q3"](spark, sf_dir).collect()
        assert os.path.isfile(os.path.join(sentinel, "part-000.parquet")), (
            "materializer deleted a live sibling application's shim data"
        )
    finally:
        shutil.rmtree(other, ignore_errors=True)


def test_dead_app_dir_is_reaped(spark, sf_dir):
    # a leftover dir whose embedded pid no longer exists is reclaimed.
    # pid_max is <= 2^22 on Linux, so 99999999 is never a live process.
    base = _shim_base()
    os.makedirs(base, exist_ok=True)
    dead = os.path.join(base, "local-1111111111111-99999999")
    os.makedirs(dead, exist_ok=True)
    # force a materialization pass: drop one table from the done set
    s, done = tpcds._shim_session(spark, sf_dir)
    done.discard("date_dim")
    queries()["tpcds_q3"](spark, sf_dir).collect()
    assert not os.path.exists(dead), "dead application's dir not reaped"


def test_vanished_table_dir_rematerializes(spark, sf_dir):
    # the in-memory done set must not mask filesystem deletion: if a
    # table's parquet vanished (reaped by mistake, disk cleanup), the
    # next query re-materializes instead of failing FAILED_READ_FILE
    rows_before = queries()["tpcds_q3"](spark, sf_dir).collect()
    mine = "%s-%d" % (spark.sparkContext.applicationId, os.getpid())
    table_dir = os.path.join(
        _shim_base(), mine,
        os.path.basename(os.path.abspath(sf_dir)), "date_dim")
    assert os.path.isdir(table_dir)
    shutil.rmtree(table_dir)
    rows_after = queries()["tpcds_q3"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows_after)) == sorted(map(tuple, rows_before))


def test_pid_alive_detects_self_and_dead():
    assert tpcds._pid_alive(os.getpid())
    assert not tpcds._pid_alive(99999999)
    assert not tpcds._pid_alive(-1)
