"""Custom stateful streaming operator via ``applyInPandasWithState``
(NEW — the reference has no streaming at all; SURVEY.md §2.D "Streaming").

Per-user running aggregates with explicit GroupState: each micro-batch
updates (n_events, sum_scaled) state and emits the running totals. With an
availableNow trigger the last update per key equals the batch aggregate,
which is what the DuckDB oracle checks.

Determinism note: rows reach the state function in shuffle order, so a
float sum would wobble in the last bits; values are accumulated as
``floor(value * 10000)`` int64 — bit-identical in numpy and SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register
from .events import _read_events_stream, _run_to_memory


def _update_user_state(key, pdfs, state: GroupState):
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += int(np.floor(pdf["value"].to_numpy() * 10000).astype("int64").sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_scaled": [total]}
    )


@register(
    "stream_stateful_user_agg",
    """
    SELECT user_id, COUNT(*) AS n_events,
           SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS sum_scaled
    FROM events GROUP BY user_id
    """,
    "streaming",
)
def stream_stateful_user_agg(spark, sf_dir):
    stream = _read_events_stream(spark, sf_dir).select("user_id", "value")
    agg = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType="user_id bigint, n_events bigint, sum_scaled bigint",
        stateStructType="n bigint, total bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    updates = _run_to_memory(agg, "update")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_scaled")
    )
