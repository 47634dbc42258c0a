"""Catalog-mode lineage over the runnable LLM-curation example pipeline
(round-11 verdict item #4): the @auto_tracking_with-decorated stages must
appear as named view nodes forming the full stage chain — M3/M5 exercised
on a realistic multi-stage pipeline, not a single statement.

Edge-set goldens follow the reference methodology (SQLFlowTestUtils
edge-set comparison, random id suffixes masked). Regenerate after an
intentional graph change with:

    SPARK_GENERATE_GOLDEN_FILES=1 python -m pytest tests/test_example_pipeline_lineage.py
"""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from golden_scenario import scenario_edge_set  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
_REGEN = os.environ.get("SPARK_GENERATE_GOLDEN_FILES", "") == "1"

_STAGES = [
    "quality_gate",
    "takedown_survivors",
    "deduped_corpus",
    "dsir_selected",
    "packed_chunks",
]


@pytest.fixture(scope="module")
def pipeline_session(spark, sf_dir):
    from llm_curation_pipeline import build_stages

    s = spark.newSession()  # isolated temp-view catalog
    build_stages(s, sf_dir)
    return s


def _mask(edges: set[str], sf_dir: str) -> set[str]:
    return {e.replace(sf_dir.rstrip("/"), "SFDIR") for e in edges}


@pytest.mark.parametrize("contracted", [False, True], ids=["expanded", "contracted"])
def test_pipeline_catalog_golden(pipeline_session, sf_dir, contracted):
    edges = _mask(scenario_edge_set(pipeline_session, contracted), sf_dir)
    assert edges, "pipeline produced no catalog lineage edges"
    name = (
        "llm_pipeline_catalog_contracted.edges"
        if contracted
        else "llm_pipeline_catalog_expanded.edges"
    )
    path = os.path.join(GOLDEN_DIR, name)
    if _REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write("\n".join(sorted(edges)) + "\n")
        pytest.skip("golden regenerated")
    with open(path) as f:
        golden = {line.strip() for line in f if line.strip()}
    assert edges == golden


def test_pipeline_stage_chain_reachable(pipeline_session):
    """Every consecutive stage pair must be connected in the contracted
    catalog graph: documents -> quality_gate -> ... -> packed_chunks."""
    from spark_sql_flow_plugin_spark.api import extract

    nodes, edges = extract(pipeline_session, contracted=True)
    idents = {n.ident for n in nodes}
    assert set(_STAGES) <= idents, f"missing stage views: {set(_STAGES) - idents}"
    direct = {(e.from_id, e.to_id) for e in edges}
    for a, b in zip(_STAGES, _STAGES[1:]):
        assert (a, b) in direct, f"no edge {a} -> {b}"
    # the source table feeds the first stage
    assert any(
        re.search(r"documents", f) and t == "quality_gate" for f, t in direct
    )
