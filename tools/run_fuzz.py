"""Differential fuzzer runner: generate N seeded random queries over the
TPC-H views and assert Spark == DuckDB bit-exact on each (see
spark_sql_flow_plugin_spark/fuzz.py for the grammar and the exactness
conventions it bakes in).

Usage: python tools/run_fuzz.py [sf_dir] [n_seeds] [start_seed]

Prints one line per seed and a summary; on any divergence prints BOTH
dialect texts so the failure is immediately reproducible. Exit 1 on any
failure. The committed artifact (artifacts/fuzz_r11_seeds.log) is this
script's output.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_sql_flow_plugin_spark import fuzz  # noqa: E402
from spark_sql_flow_plugin_spark.session import get_session  # noqa: E402
from spark_sql_flow_plugin_spark.sources import register_views  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    start = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    only = sys.argv[4] if len(sys.argv) > 4 else None  # pin one shape

    spark = get_session("fuzz-differential")
    register_views(spark, sf_dir, *fuzz.FUZZ_TABLES)
    con = fuzz.duck_connection(sf_dir)

    n_ok = 0
    failures = []
    total: dict[str, int] = {}
    nonempty: dict[str, int] = {}
    t_all = time.time()
    for seed in range(start, start + n):
        t0 = time.time()
        rec = fuzz.run_seed(spark, con, seed, only)
        total[rec["shape"]] = total.get(rec["shape"], 0) + 1
        if rec["ok"]:
            n_ok += 1
            if rec["n_rows"]:
                nonempty[rec["shape"]] = nonempty.get(rec["shape"], 0) + 1
            print(
                f"pass  seed={seed} shape={rec['shape']}"
                f" rows={rec['n_rows']} [{time.time()-t0:.1f}s]"
            )
        else:
            failures.append(rec)
            print(f"FAIL  seed={seed} shape={rec['shape']}: {rec['err']}")
            print(f"  spark: {rec['spark_sql']}")
            print(f"  duck:  {rec['duck_sql']}")
    print("\nper-shape non-empty counts (nonempty/total):")
    for sh in sorted(total):
        print(f"  {sh:12s} {nonempty.get(sh, 0):4d} / {total[sh]}")
    print(
        f"\n{n_ok} pass, {len(failures)} fail / {n} seeds"
        f" (sf_dir={sf_dir}, start={start}) [{time.time()-t_all:.0f}s]"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
