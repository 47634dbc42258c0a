"""Pipeline observability via ``df.observe`` (Spark Observation API).

The reference's listener layer captures per-query wall-clock metrics
(``listeners.scala:58-61`` durationMs/timestamp); this module is the
data-plane complement: named AGGREGATE metrics computed inside the query
itself, for free, during the action that runs it anyway. At 100 TB this
is how a pipeline audits itself — row counts in/out of every stage, null
rates, filter selectivity — without a second pass over the data.

``Observation`` metrics are collected on the driver via an internal
listener when the first action completes; they cost one extra aggregate
expression per metric inside the existing plan, not a job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_metrics(df: DataFrame, **metrics) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a DataFrame.

    Returns ``(df, observation)``; after any action on ``df`` (or a plan
    built on it), ``observation.get`` yields ``{name: value}``.

    >>> df, obs = with_metrics(docs, n_rows=F.count(F.lit(1)),
    ...                        null_texts=F.count_if(F.col("text").isNull()))
    >>> df.write.parquet(...)   # the action that was happening anyway
    >>> obs.get["null_texts"]
    """
    if not metrics:
        raise ValueError("at least one named metric expression is required")
    obs = Observation()
    names = sorted(metrics)
    return df.observe(obs, *(metrics[n].alias(n) for n in names)), obs


def row_audit(df: DataFrame) -> tuple[DataFrame, Observation]:
    """The default audit every stage boundary wants: total rows plus a
    per-column null count (``null_<col>``), all inside the existing
    action."""
    metrics = {"n_rows": F.count(F.lit(1))}
    for c in df.columns:
        # backtick-quote: a column literally named "a.b" would otherwise
        # resolve as struct-field access
        quoted = "`" + c.replace("`", "``") + "`"
        metrics[f"null_{c}"] = F.count_if(F.col(quoted).isNull())
    return with_metrics(df, **metrics)
