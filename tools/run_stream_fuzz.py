"""Streaming differential fuzzer runner: stream(availableNow) ≡ batch on
generated stateful shapes over a staged multi-file events source (see
spark_sql_flow_plugin_spark/stream_fuzz.py).

Usage: python tools/run_stream_fuzz.py [sf_dir] [n_seeds] [start_seed]

Exit 1 on any divergence; per-shape non-empty counts in the summary
(the committed artifact is this script's output).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_sql_flow_plugin_spark import stream_fuzz  # noqa: E402
from spark_sql_flow_plugin_spark.session import get_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    start = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    spark = get_session("fuzz-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(
        tempfile.gettempdir(),
        f"stream_fuzz_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    staged = {
        3: stream_fuzz.stage_events(spark, sf_dir, base, n_files=3),
        4: stream_fuzz.stage_events(spark, sf_dir, base + "_f4", n_files=4),
    }

    n_ok = 0
    failures = []
    total: dict[str, int] = {}
    nonempty: dict[str, int] = {}
    t_all = time.time()
    for seed in range(start, start + n):
        t0 = time.time()
        rec = stream_fuzz.run_stream_seed(spark, staged, seed)
        total[rec["shape"]] = total.get(rec["shape"], 0) + 1
        if rec["ok"]:
            n_ok += 1
            if rec["n_rows"]:
                nonempty[rec["shape"]] = nonempty.get(rec["shape"], 0) + 1
            print(
                f"pass  seed={seed} shape={rec['shape']}"
                f" files={rec['max_files']} mode={rec['mode']}"
                f" rows={rec['n_rows']} [{time.time() - t0:.1f}s]",
                flush=True,
            )
        else:
            failures.append(rec)
            print(
                f"FAIL  seed={seed} shape={rec['shape']}"
                f" files={rec['max_files']}: {rec['err']}",
                flush=True,
            )
    print("\nper-shape non-empty counts (nonempty/total):")
    for s in sorted(total):
        print(f"  {s:14} {nonempty.get(s, 0):>3} / {total[s]}")
    print(
        f"\n{n_ok} pass, {len(failures)} fail / {n} seeds"
        f" (sf_dir={sf_dir}, start={start}) [{time.time() - t_all:.0f}s]"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
