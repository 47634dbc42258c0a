"""Dump the physical plan of every bench-tagged registry query to
artifacts/plans_r{N}/<name>.txt — the per-round plan snapshot the verdict
audits for shuffle/broadcast/cartesian regressions.

Usage: python tools/gen_plans.py <round> [sf_dir] [extra_query ...]

Bench-tagged queries are always dumped; extra registry names (e.g. the
non-bench TPC-DS heavies the verdict audits) can be appended.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_sql_flow_plugin_spark.registry import all_specs  # noqa: E402
from spark_sql_flow_plugin_spark.session import get_session  # noqa: E402


def main() -> None:
    rnd = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    extra = set(sys.argv[3:])
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        f"plans_r{rnd}",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    dumped = set()
    for spec in all_specs():
        if "bench" not in spec.tags and spec.name not in extra:
            continue
        df = spec.builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        with open(os.path.join(out_dir, f"{spec.name}.txt"), "w") as f:
            f.write(f"-- {spec.name} @ {sf_dir}\n{plan}")
        print(f"wrote {spec.name}")
        dumped.add(spec.name)
    spark.stop()
    # A typo'd extra name must not yield a silently-incomplete snapshot
    # with exit code 0 (round-8 advice): fail loudly on unmatched names.
    unmatched = sorted(extra - dumped)
    if unmatched:
        print(f"ERROR: no registry spec matched: {', '.join(unmatched)}",
              file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
