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
           CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT) AS sum_scaled
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


class _UserAggProcessor:
    """StatefulProcessor for transformWithStateInPandas — defined lazily in
    _make_processor (the base class import requires a running session)."""


def _make_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserAggProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, total BIGINT")

        def handleInputRows(self, key, rows, timer_values):
            n, total = (
                tuple(self._agg.get()) if self._agg.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total += int(
                    np.floor(pdf["value"].to_numpy() * 10000)
                    .astype("int64")
                    .sum()
                )
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_scaled": [total]}
            )

        def close(self) -> None:
            pass

    return UserAggProcessor()


def _has_protobuf() -> bool:
    """transformWithStateInPandas talks to the JVM state server over a
    protobuf protocol; the `protobuf` package is not in this container
    (verified: StateMessage_pb2 import crashes the driver worker), so the
    v2 API is gated exactly like the PIL/neo4j optional deps."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_transform_with_state(spark, sf_dir):
    """Spark 4 arbitrary-state v2 (``transformWithStateInPandas`` +
    StatefulProcessor with typed ValueState) — the successor to
    applyInPandasWithState above, same per-user running aggregate so both
    APIs check against the identical batch SQL
    (`SELECT user_id, COUNT(*), SUM(CAST(FLOOR(value*10000) AS BIGINT))
    FROM events GROUP BY user_id`). Registered as a query only when the
    `protobuf` package is available (see _has_protobuf); the RocksDB state
    store conf is scoped to this builder and restored afterwards.
    """
    if not _has_protobuf():
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package; "
            "install it on the cluster image. applyInPandasWithState "
            "(stream_stateful_user_agg) covers the same semantics here."
        )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = _read_events_stream(spark, sf_dir).select("user_id", "value")
        agg = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_make_processor(),
            outputStructType="user_id bigint, n_events bigint, sum_scaled bigint",
            outputMode="Update",
            timeMode="None",
        )
        updates = _run_to_memory(agg, "update")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_scaled")
    )


if _has_protobuf():  # pragma: no cover - container lacks protobuf
    register(
        "stream_transform_with_state",
        """
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT) AS sum_scaled
        FROM events GROUP BY user_id
        """,
        "streaming",
    )(stream_transform_with_state)
