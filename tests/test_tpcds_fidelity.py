"""Fidelity-tier contract for the executable TPC-DS slice.

Round-9 verdict item: "all 103 corpus queries, bit-exact" needs a
fidelity label — several queries are adapted analogs (param-retuned
thresholds, structure-adapted join edges), not dialect-only ports.
The machine-readable tier lives in ``operators.tpcds.FIDELITY`` and is
stamped on every registration as a ``fidelity:<tier>`` tag; COVERAGE.md
surfaces the counts. These tests keep classification total, current,
and consistent with the docstrings' strongest claims.
"""

from spark_sql_flow_plugin_spark.operators import tpcds
from spark_sql_flow_plugin_spark.registry import all_specs


def _tpcds_specs():
    return [s for s in all_specs() if "tpcds" in s.tags]


def test_every_registered_query_is_classified():
    names = {s.name for s in _tpcds_specs()}
    assert names == set(tpcds.FIDELITY), (
        "unclassified: %s, stale: %s"
        % (sorted(names - set(tpcds.FIDELITY)),
           sorted(set(tpcds.FIDELITY) - names))
    )


def test_every_spec_carries_exactly_its_fidelity_tag():
    for s in _tpcds_specs():
        ftags = [t for t in s.tags if t.startswith("fidelity:")]
        assert ftags == ["fidelity:" + tpcds.FIDELITY[s.name]], (s.name, ftags)


def test_tiers_are_valid_and_counts_sum():
    counts = tpcds.fidelity_counts()
    assert set(counts) == set(tpcds._FIDELITY_TIERS)
    assert sum(counts.values()) == len(tpcds.FIDELITY) == 103


def test_structure_adapted_is_the_documented_set():
    # the structure-adapted set is small and every member's docstring
    # names the exact substitution — keep the set explicit so a new
    # structural adaptation is a conscious, reviewed decision.
    # (q19 and q59 left this set in round 10: the zip co-grid lets
    # q19's substr-zip-prefix edge run verbatim, and q59's duplicate-row
    # fan-out is multiset-deterministic so the reference shape runs
    # unmodified)
    adapted = {n for n, t in tpcds.FIDELITY.items()
               if t == "structure-adapted"}
    assert adapted == {
        "tpcds_q64", "tpcds_q78",
    }


def test_verbatim_queries_never_claim_adaptation():
    # a docstring that says "Adaptation(s):" flags a non-verbatim query —
    # the tier must not be verbatim-dialect for those.
    by_name = {s.name: s for s in _tpcds_specs()}
    for name, tier in tpcds.FIDELITY.items():
        doc = (by_name[name].builder.__doc__ or "")
        if "Adaptation" in doc:
            assert tier != "verbatim-dialect", name
