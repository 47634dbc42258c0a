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

Run:  python examples/llm_curation_pipeline.py [sf_dir]
Emits row counts per stage and writes the final plan's lineage DOT under
examples/llm_curation_out/ (DataFrame mode, GraphViz sink — NOTE the sink's
``overwrite=True`` clears its output directory, so it gets its own subdir).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_sql_flow_plugin_spark.api import save_as_sql_flow  # noqa: E402
from spark_sql_flow_plugin_spark.registry import queries  # noqa: E402
from spark_sql_flow_plugin_spark.session import get_session  # noqa: E402
from spark_sql_flow_plugin_spark.sources import load  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("llm-curation-example")
    q = queries()
    docs = load(spark, sf_dir, "documents")["documents"]
    n0 = docs.count()

    # 1. quality gate: keep flags from the Gopher rule battery
    kept = (
        q["quality_gopher_rules"](spark, sf_dir)
        .where(F.col("keep") == 1)
        .select("doc_id")
        .join(docs, "doc_id")
    )
    n1 = kept.count()

    # 2. takedown sweep: drop any doc whose content fingerprint is
    #    tombstoned (same contract as compliance_delete_audit)
    tomb = (
        docs.where(F.col("doc_id") % 17 == 3)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    survivors = (
        kept.withColumn("fp", F.md5("text"))
        .join(F.broadcast(tomb), "fp", "left_anti")
    )
    n2 = survivors.count()

    # 3. exact dedup: one keeper per content fingerprint
    deduped = (
        survivors.groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(survivors, ["fp", "doc_id"])
        .drop("fp")
    )
    n3 = deduped.count()

    # 4-5. DSIR scores for the raw pool, top-25% by avg quantized score
    scores = q["dsir_importance_weights"](spark, sf_dir)
    sel_n = max(1, n3 // 4)
    selected = (
        deduped.join(scores, "doc_id")
        .orderBy(F.col("avg_q6").desc(), "doc_id")
        .limit(sel_n)  # TakeOrderedAndProject: distributed top-k
    )
    n4 = selected.count()

    # 6. fixed-window chunking of the selected corpus
    chunks = q["docs_chunk_tokens"](spark, sf_dir).join(
        selected.select("doc_id"), "doc_id"
    )
    n5 = chunks.count()

    print(
        f"corpus {n0} -> quality {n1} -> takedown {n2} -> dedup {n3}"
        f" -> dsir-selected {n4} -> chunks {n5}"
    )

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "llm_curation_out"
    )
    written = save_as_sql_flow(
        chunks, out, filename_prefix="llm_curation_pipeline", overwrite=True
    )
    print(f"lineage written to {written}")
    spark.stop()


if __name__ == "__main__":
    main()
