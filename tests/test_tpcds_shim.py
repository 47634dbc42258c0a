"""TPC-DS shim materializer concurrency + self-healing contract.

Round-7 verdict demonstrated a cross-application race: the materializer
rmtree'd every ``.tpcds_shim/<app>`` dir that wasn't the *current*
application's, so two concurrent Spark apps on one checkout (pytest +
bench, driver + builder) deleted each other's live shim parquet
mid-query (42/74 TPC-DS queries failed with FAILED_READ_FILE). The
round-8 contract: dirs are keyed ``<applicationId>-<pid>``; reaping
skips any sibling whose owner is alive; a vanished table dir is
re-materialized instead of trusted via the in-memory ``done`` set.

Round 9 hardened ownership: liveness is read from an explicit ``OWNER``
marker (``<pid> <starttime>``) inside the dir — never parsed from the
dir name — so pid reuse cannot pin a dead app's data, foreign dir-name
formats (standalone ``app-...-0001``) are not mis-parsed, and
markerless dirs are reapable only by age.
"""

import os
import shutil
import time

import pytest

from spark_sql_flow_plugin_spark.operators import tpcds
from spark_sql_flow_plugin_spark.registry import queries


def _shim_base():
    return os.path.join(tpcds._repo_root(), ".tpcds_shim")


def _make_app_dir(name, owner_line=None, mtime_ago=None):
    """Create a fake sibling app dir with a sentinel parquet file and an
    optional OWNER marker; returns (dir, sentinel_file)."""
    base = _shim_base()
    os.makedirs(base, exist_ok=True)
    d = os.path.join(base, name)
    os.makedirs(d, exist_ok=True)
    sentinel_dir = os.path.join(d, "sf0.1", "date_dim")
    os.makedirs(sentinel_dir, exist_ok=True)
    sentinel = os.path.join(sentinel_dir, "part-000.parquet")
    with open(sentinel, "w") as f:
        f.write("data belonging to another application")
    if owner_line is not None:
        with open(os.path.join(d, "OWNER"), "w") as f:
            f.write(owner_line)
    if mtime_ago is not None:
        old = time.time() - mtime_ago
        os.utime(d, (old, old))
    return d, sentinel


def _force_reap_pass(spark, sf_dir):
    """Run a query through the shim with a guaranteed materialization
    pass (earlier session-scoped tests may already have materialized
    everything, which would early-exit before the reap loop — the
    vacuity flagged by round-8 advice)."""
    s, done = tpcds._shim_session(spark, sf_dir)
    done.discard("date_dim")
    queries()["tpcds_q3"](spark, sf_dir).collect()


def test_live_sibling_app_dir_never_reaped(spark, sf_dir):
    # simulate a second *live* application: its OWNER marker names a
    # live pid (ours) with the matching /proc start-time. The dir mtime
    # is set 2h in the past so the age fallback would reap it — only
    # the liveness check protects it.
    start = tpcds._proc_start_time(os.getpid())
    other, sentinel = _make_app_dir(
        "local-9999999999999-%d" % os.getpid(),
        owner_line="%d %s" % (os.getpid(), start),
        mtime_ago=2 * 3600,
    )
    try:
        _force_reap_pass(spark, sf_dir)
        assert os.path.isfile(sentinel), (
            "materializer deleted a live sibling application's shim data"
        )
    finally:
        shutil.rmtree(other, ignore_errors=True)


def test_dead_app_dir_is_reaped(spark, sf_dir):
    # a leftover dir whose OWNER pid no longer exists is reclaimed.
    # pid_max is <= 2^22 on Linux, so 99999999 is never a live process.
    dead, _ = _make_app_dir(
        "local-1111111111111-99999999", owner_line="99999999 12345")
    _force_reap_pass(spark, sf_dir)
    assert not os.path.exists(dead), "dead application's dir not reaped"


def test_pid_reuse_dir_is_reaped(spark, sf_dir):
    # OWNER names a live pid (ours) but a start-time that doesn't match
    # /proc — the original owner died and the pid was recycled. Must be
    # reclaimed, not protected forever (round-8 advice: name-parsed
    # liveness leaked these unboundedly).
    reused, _ = _make_app_dir(
        "local-2222222222222-%d" % os.getpid(),
        owner_line="%d 1" % os.getpid(),
    )
    try:
        _force_reap_pass(spark, sf_dir)
        assert not os.path.exists(reused), (
            "pid-reuse impostor protected a dead application's dir"
        )
    finally:
        shutil.rmtree(reused, ignore_errors=True)


def test_markerless_dir_reaped_only_by_age(spark, sf_dir):
    # no OWNER marker (mid-creation sibling, legacy layout, or a foreign
    # name like standalone app-...-0001 with no pid suffix): protected
    # while fresh, reapable once older than the grace period. Note the
    # foreign-format dir embeds trailing "0001" — under the old
    # name-parsing scheme pid 1 is always alive and the dir was
    # protected forever.
    fresh, fresh_sentinel = _make_app_dir("app-20260814120000-0001")
    stale, _ = _make_app_dir(
        "app-20250101000000-0001",
        mtime_ago=tpcds._ORPHAN_GRACE_SEC + 60,
    )
    try:
        _force_reap_pass(spark, sf_dir)
        assert os.path.isfile(fresh_sentinel), (
            "fresh markerless dir reaped inside the grace period"
        )
        assert not os.path.exists(stale), (
            "stale markerless dir never reaped (unbounded disk leak)"
        )
    finally:
        shutil.rmtree(fresh, ignore_errors=True)
        shutil.rmtree(stale, ignore_errors=True)


def test_stray_plain_file_is_removed(spark, sf_dir):
    # a non-directory entry under .tpcds_shim (crashed writer's tmp file,
    # manual debris): rmtree on a plain file fails and is swallowed by
    # ignore_errors, so under the old loop it was never reclaimed (and
    # _owner_alive depended on NotADirectoryError falling into the age
    # path). It must be os.remove()d directly.
    base = _shim_base()
    os.makedirs(base, exist_ok=True)
    stray = os.path.join(base, "OWNER.tmp.424242")
    with open(stray, "w") as f:
        f.write("leftover tmp marker from a crashed writer")
    try:
        _force_reap_pass(spark, sf_dir)
        assert not os.path.exists(stray), (
            "stray plain file under .tpcds_shim never reclaimed"
        )
    finally:
        if os.path.exists(stray):
            os.remove(stray)


def test_own_dir_carries_owner_marker(spark, sf_dir):
    _force_reap_pass(spark, sf_dir)
    mine = "%s-%d" % (spark.sparkContext.applicationId, os.getpid())
    marker = os.path.join(_shim_base(), mine, "OWNER")
    assert os.path.isfile(marker)
    with open(marker) as f:
        pid_s, start_s = f.read().split()
    assert int(pid_s) == os.getpid()
    assert start_s == str(tpcds._proc_start_time(os.getpid()))


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


def test_proc_start_time_stable_and_missing():
    st1 = tpcds._proc_start_time(os.getpid())
    st2 = tpcds._proc_start_time(os.getpid())
    assert st1 is not None and st1 == st2
    assert tpcds._proc_start_time(99999999) is None
