"""End-to-end LLM training-data curation pipeline, composed from the
registered operators, with column-level lineage captured at the end.

Stages (each is an oracle-verified registry operator — see COVERAGE.md):

1. quality gate        quality_gopher_rules    (rule-battery keep flags)
2. takedown sweep      compliance_delete_audit semantics (content-addressed
                       tombstone anti-join, inlined here to keep survivors)
3. exact dedup         md5 fingerprint keeper (dedup_exact semantics)
4. target-domain rank  dsir_importance_weights (hashed-unigram likelihood
                       ratios vs the src0 target domain)
5. selection           distributed top-k by avg DSIR score
                       (TakeOrderedAndProject — no global window)
6. sequence packing    docs_chunk_tokens (fixed windows for the tokenizer)

Every stage function is wrapped in ``@auto_tracking_with`` (reference
python/sqlflow.py decorator semantics), so each stage's DataFrame is
registered as a NAMED temp view and catalog-mode lineage sees the whole
pipeline as a chain of named nodes — the M3/M5 path on a realistic
multi-stage pipeline, not a single statement. The run emits THREE
lineage artifacts under examples/llm_curation_out/:

- llm_curation_pipeline.dot         DataFrame mode (final plan only)
- llm_curation_catalog.dot          catalog mode, expanded
- llm_curation_catalog_contracted.dot  catalog mode, contracted
  (source tables -> stage views with the per-column closure)

tests/test_example_pipeline_lineage.py holds the catalog edge sets as
goldens (reference methodology: SQLFlowTestUtils edge-set comparison).

Run:  python examples/llm_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_sql_flow_plugin_spark.api import (  # noqa: E402
    save_as_sql_flow,
    save_data_lineage,
)
from spark_sql_flow_plugin_spark.functions.tracking import (  # noqa: E402
    auto_tracking_with,
)
from spark_sql_flow_plugin_spark.registry import queries  # noqa: E402
from spark_sql_flow_plugin_spark.session import get_session  # noqa: E402
from spark_sql_flow_plugin_spark.sources import load  # noqa: E402


@auto_tracking_with("quality_gate")
def stage_quality_gate(spark, sf_dir, docs):
    """Keep docs passing the Gopher rule battery."""
    return (
        queries()["quality_gopher_rules"](spark, sf_dir)
        .where(F.col("keep") == 1)
        .select("doc_id")
        .join(docs, "doc_id")
    )


@auto_tracking_with("takedown_survivors")
def stage_takedown(docs, kept):
    """Drop any doc whose content fingerprint is tombstoned (same
    contract as compliance_delete_audit)."""
    tomb = (
        docs.where(F.col("doc_id") % 17 == 3)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    return kept.withColumn("fp", F.md5("text")).join(
        F.broadcast(tomb), "fp", "left_anti"
    )


@auto_tracking_with("deduped_corpus")
def stage_dedup(survivors):
    """One keeper per content fingerprint (dedup_exact semantics)."""
    return (
        survivors.groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(survivors, ["fp", "doc_id"])
        .drop("fp")
    )


@auto_tracking_with("dsir_selected")
def stage_select(spark, sf_dir, deduped, sel_n):
    """Top-k of the deduped pool by avg quantized DSIR score
    (TakeOrderedAndProject: distributed top-k, no global window)."""
    scores = queries()["dsir_importance_weights"](spark, sf_dir)
    return (
        deduped.join(scores, "doc_id")
        .orderBy(F.col("avg_q6").desc(), "doc_id")
        .limit(sel_n)
    )


@auto_tracking_with("packed_chunks")
def stage_chunks(spark, sf_dir, selected):
    """Fixed-window chunking of the selected corpus."""
    return queries()["docs_chunk_tokens"](spark, sf_dir).join(
        selected.select("doc_id"), "doc_id"
    )


def build_stages(spark, sf_dir: str) -> dict:
    """Build (and auto-track) every pipeline stage; returns them by name."""
    docs = load(spark, sf_dir, "documents")["documents"]
    kept = stage_quality_gate(spark, sf_dir, docs)
    survivors = stage_takedown(docs, kept)
    deduped = stage_dedup(survivors)
    # selection size is a quarter of the deduped pool (floor, min 1)
    sel_n = max(1, deduped.count() // 4)
    selected = stage_select(spark, sf_dir, deduped, sel_n)
    chunks = stage_chunks(spark, sf_dir, selected)
    return {
        "documents": docs,
        "quality_gate": kept,
        "takedown_survivors": survivors,
        "deduped_corpus": deduped,
        "dsir_selected": selected,
        "packed_chunks": chunks,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("llm-curation-example")
    stages = build_stages(spark, sf_dir)
    counts = {name: df.count() for name, df in stages.items()}
    print(
        " -> ".join(f"{name} {n}" for name, n in counts.items())
    )

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "llm_curation_out"
    )
    # the sink's write contract replaces its whole output dir (reference
    # basicSinks.scala overwrite semantics), so each artifact gets a subdir
    written = save_as_sql_flow(
        stages["packed_chunks"],
        os.path.join(out, "dataframe"),
        filename_prefix="llm_curation_pipeline",
        overwrite=True,
    )
    print(f"dataframe-mode lineage written to {written}")
    # catalog mode: the auto-tracked stage views as one pipeline graph,
    # expanded and contracted (semanticHash substitution links stages)
    for contracted, prefix in (
        (False, "llm_curation_catalog"),
        (True, "llm_curation_catalog_contracted"),
    ):
        written = save_data_lineage(
            spark,
            os.path.join(out, prefix.replace("llm_curation_", "")),
            filename_prefix=prefix,
            contracted=contracted,
            overwrite=True,
        )
        print(f"catalog-mode ({prefix}) lineage written to {written}")
    spark.stop()


if __name__ == "__main__":
    main()
