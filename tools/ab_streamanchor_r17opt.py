"""r16 verdict item #3: matched-anchor re-measure of stream_user_totals
(driver read -32% r15->r16 with the streaming module untouched). One
JVM, bench-identical timing (clearCache + .count()), each round runs
the fsync anchor (bench.py's calibration: 512 x 4 KiB files, each
fsync'd) immediately before each streaming query so every reading has
its own anchor.

Usage: python tools/ab_streamanchor_r17opt.py [sf_dir] [rounds]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 6


def fsync_anchor() -> float:
    d = tempfile.mkdtemp(prefix="ab_fsync_")
    payload = b"x" * 4096
    t0 = time.time()
    for i in range(512):
        p = os.path.join(d, f"f{i}")
        with open(p, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
    dt = time.time() - t0
    for i in range(512):
        os.unlink(os.path.join(d, f"f{i}"))
    os.rmdir(d)
    return dt


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-streamanchor", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = _reg.queries()
    names = ["stream_user_totals", "stream_click_purchase_join"]
    # codegen warm-up run per query (bench.py reports min-of-2 for the
    # same reason); not recorded
    for n in names:
        spark.catalog.clearCache()
        qs[n](spark, SF).count()
    res = {n: [] for n in names}
    anchors = {n: [] for n in names}
    for _ in range(ROUNDS):
        for n in names:
            anchors[n].append(round(fsync_anchor(), 3))
            spark.catalog.clearCache()
            t0 = time.time()
            qs[n](spark, SF).count()
            res[n].append(round(time.time() - t0, 3))
    out = {
        "sf_dir": SF,
        "rounds": res,
        "anchors": anchors,
        "mins": {n: min(v) for n, v in res.items()},
        "anchor_mins": {n: min(v) for n, v in anchors.items()},
        "normalized_min": {
            n: round(min(res[n]) / min(anchors[n]), 2) for n in names
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
