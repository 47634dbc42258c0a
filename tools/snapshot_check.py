"""End-of-round snapshot guard (round-9 verdict item #1: the committed
verification-artifacts invariant lapsed three consecutive rounds).

FAILS (exit 1) unless the CURRENT round's verification artifacts exist
in the working tree:

  artifacts/oracle_matrix_r{N}_sf0.001.log   (full registry, bit-exact)
  artifacts/oracle_matrix_r{N}_sf0.01.log
  artifacts/oracle_matrix_r{N}_sf0.1.log
  artifacts/plans_r{N}/                      (non-empty plan snapshot)

and each matrix log actually ends in a green summary ("0 fail"), and no
registry query is VACUOUS (0-row pass) at ALL committed scale factors —
the exact blind spot that hid the empty anti-subquery gates for 12 rounds
(r12 verdict item #2). Sparse-at-one-SF entries (e.g. TPC-DS at sf0.001)
are fine; empty everywhere means the value gate has never checked a row.

Run it BEFORE the end-of-round snapshot commit:

  python tools/snapshot_check.py 9

The driver's 50-query sample has contained zero TPC-DS rows for eight
straight rounds — these committed matrices are the only durable
evidence the full registry is green, so the check is mechanical, not
advisory.
"""

from __future__ import annotations

import os
import re
import sys

_VACUOUS_RE = re.compile(r"^pass\s+(\S+): rows=0\b.*VACUOUS", re.MULTILINE)
_PASS_RE = re.compile(r"^(?:pass|weak)\s+(\S+):", re.MULTILINE)


def all_sf_vacuous(logs: list[str]) -> list[str]:
    """Queries that passed with 0 rows in EVERY one of the given matrix
    logs — i.e. whose value gate is empty-vs-empty at all committed SFs.
    A query absent from a log (e.g. added mid-round) only counts against
    the logs that contain it."""
    vac: dict[str, int] = {}
    seen: dict[str, int] = {}
    for text in logs:
        for name in _PASS_RE.findall(text):
            seen[name] = seen.get(name, 0) + 1
        for name in _VACUOUS_RE.findall(text):
            vac[name] = vac.get(name, 0) + 1
    return sorted(n for n, k in vac.items() if k == seen.get(n, 0))


def main() -> int:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        print("usage: python tools/snapshot_check.py <round-number>",
              file=sys.stderr)
        return 2
    rnd = int(sys.argv[1])
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
    )
    problems: list[str] = []

    logs: list[str] = []
    for sf in ("0.001", "0.01", "0.1"):
        path = os.path.join(root, f"oracle_matrix_r{rnd:02d}_sf{sf}.log")
        rel = os.path.relpath(path)
        if not os.path.isfile(path):
            problems.append(f"missing {rel}")
            continue
        text = open(path, errors="replace").read()
        logs.append(text)
        if " 0 fail" not in text[-500:]:
            problems.append(f"{rel} does not end in a green '0 fail' summary")

    for name in all_sf_vacuous(logs):
        problems.append(
            f"{name} is VACUOUS (0-row pass) at every committed SF — "
            "its value gate has never compared a row; retune its predicates"
        )

    # r15 verdict item #6: the sf0.001 vacuous set may only SHRINK.
    # Every query that passes vacuous at the smallest SF must carry a
    # committed rationale (artifacts/vacuous_sf0001_rationale.json);
    # entries that are no longer vacuous must be pruned, so the file
    # tracks reality and additions are always a visible diff.
    if rnd >= 16 and logs:
        import json as _json

        rat_path = os.path.join(root, "vacuous_sf0001_rationale.json")
        rationale: dict = {}
        if os.path.isfile(rat_path):
            with open(rat_path) as f:
                rationale = {
                    k: v for k, v in _json.load(f).items()
                    if not k.startswith("_")
                }
        else:
            problems.append(
                f"missing {os.path.relpath(rat_path)} — every sf0.001 "
                "vacuous query needs a committed rationale"
            )
        sf0001_vac = set(_VACUOUS_RE.findall(logs[0]))
        for name in sorted(sf0001_vac - set(rationale)):
            problems.append(
                f"{name} is VACUOUS at sf0.001 with no rationale entry — "
                "retune it to populate, or add a justified entry to "
                "vacuous_sf0001_rationale.json"
            )
        for name in sorted(set(rationale) - sf0001_vac):
            problems.append(
                f"vacuous_sf0001_rationale.json lists {name} but it is "
                "no longer vacuous at sf0.001 — prune the stale entry"
            )

    # r14 verdict item #3: the Spark-side timing sweep is a standing
    # close artifact, and every query above the 5 s line must be
    # bench-tagged so the driver bench tracks it round-over-round.
    times_path = os.path.join(root, f"registry_times_r{rnd:02d}_sf0.1.json")
    if rnd >= 15 and not os.path.isfile(times_path):
        problems.append(
            f"missing {os.path.relpath(times_path)} — run "
            f"`python tools/registry_times.py {rnd}` at final HEAD"
        )
    elif rnd >= 15 and os.path.isfile(times_path):
        import json

        with open(times_path) as f:
            sweep = json.load(f).get("times", {})
        slow = sorted(n for n, t in sweep.items() if t > 5.0)
        if slow:
            prev_times: dict = {}
            prev_path2 = os.path.join(
                root, f"registry_times_r{rnd - 1:02d}_sf0.1.json"
            )
            if os.path.isfile(prev_path2):
                with open(prev_path2) as f:
                    prev_times = json.load(f).get("times", {})
            try:
                sys.path.insert(
                    0,
                    os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))
                    ),
                )
                from spark_sql_flow_plugin_spark.registry import all_specs

                bench = {s.name for s in all_specs() if "bench" in s.tags}
            except Exception as exc:  # registry import needs pyspark
                bench = None
                problems.append(
                    f"could not audit bench tags for >5s queries: {exc}"
                )
            if bench is not None:
                for n in slow:
                    # every >5s query needs a round-over-round number:
                    # either the driver bench tracks it (tag) or the
                    # previous round's standing sweep has it.
                    if n not in bench and n not in prev_times:
                        problems.append(
                            f"{n} ran >5s in the sf0.1 sweep with no "
                            "round-over-round number — bench-tag it or "
                            "keep the standing sweep artifacts"
                        )

    plans = os.path.join(root, f"plans_r{rnd:02d}")
    alt = os.path.join(root, f"plans_r{rnd}")
    plans_dir = plans if os.path.isdir(plans) else alt
    if not os.path.isdir(plans_dir) or not os.listdir(plans_dir):
        problems.append(
            f"missing/empty plan snapshot {os.path.relpath(plans)}"
        )

    if problems:
        print("SNAPSHOT CHECK FAILED — do not commit the round snapshot:",
              file=sys.stderr)
        for p in problems:
            print(f"  - {p}", file=sys.stderr)
        print(
            "regenerate with:\n"
            f"  python tools/check_oracle.py /root/testdata/sf0.001 "
            f"2>&1 | tee artifacts/oracle_matrix_r{rnd:02d}_sf0.001.log\n"
            "  (repeat for sf0.01, sf0.1)\n"
            f"  python tools/gen_plans.py {rnd:02d} /root/testdata/sf0.1 "
            "tpcds_q14a tpcds_q14b tpcds_q64 tpcds_q75 tpcds_q78",
            file=sys.stderr,
        )
        return 1
    print(f"snapshot check OK for round {rnd}: matrices green at 3 SFs, "
          f"plan snapshot present ({os.path.relpath(plans_dir)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
