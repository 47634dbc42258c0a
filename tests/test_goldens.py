"""Golden-file lineage tests (reference methodology: SQLFlowTestSuite +
SQLFlowTestUtils edge-set comparison). Regenerate goldens after an
intentional graph change with:

    SPARK_GENERATE_GOLDEN_FILES=1 python -m pytest tests/test_goldens.py
"""

import os

import pytest

from golden_scenario import build_scenario, scenario_edge_set

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
_REGEN = os.environ.get("SPARK_GENERATE_GOLDEN_FILES", "") == "1"


@pytest.fixture(scope="module")
def scenario_session(spark):
    s = spark.newSession()  # isolated temp-view catalog
    build_scenario(s)
    return s


@pytest.mark.parametrize("contracted", [False, True], ids=["expanded", "contracted"])
def test_catalog_lineage_golden(scenario_session, contracted):
    edges = scenario_edge_set(scenario_session, contracted)
    assert edges, "scenario produced no lineage edges"
    name = "catalog_contracted.edges" if contracted else "catalog_expanded.edges"
    path = os.path.join(GOLDEN_DIR, name)
    if _REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write("\n".join(sorted(edges)) + "\n")
        pytest.skip("golden regenerated")
    with open(path) as f:
        golden = {line.strip() for line in f if line.strip()}
    assert edges == golden
