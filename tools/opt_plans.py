"""Capture `.explain("formatted")` output for registry queries into
plans/r<N>/<name>_<tag>.txt — the optimization-round before/after evidence
(distinct from artifacts/plans_rN, which snapshots executedPlan toString
for every bench query).

Usage: python tools/opt_plans.py <tag> <query> [<query> ...]
       tag is "before" or "after"; the round defaults to 17 and can be
       overridden with $SPARK_GRAFT_PLANS_ROUND.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{os.environ.get('SPARK_GRAFT_PLANS_ROUND', '17')}",
    )
    os.makedirs(out_dir, exist_ok=True)

    from spark_sql_flow_plugin_spark.registry import queries
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("opt-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        if name not in qs:
            raise SystemExit(f"unknown registry query: {name}")
        df = qs[name](spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({tag}) @ {sf_dir}\n{plan}")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
