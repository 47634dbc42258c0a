"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

A deterministic synthetic-documents source — the pattern a training-data
pipeline uses to plug a non-file system (an internal corpus service, a
queue, a proprietary store) into Spark as a first-class ``spark.read``
format. Spark 4's Python DataSource API is the public, Arrow-backed way
to do that without a JVM connector.

Scale posture: ``partitions()`` declares one :class:`InputPartition` per
row-range, so the read is distributed — every executor slot pulls its own
range; no driver-side materialization, no single-reader bottleneck. Rows
are generated with pure closed-form functions of ``doc_id`` (md5 text,
modular n_chars), so a DuckDB ``generate_series`` oracle reproduces the
exact dataset and any drift in the partition/range bookkeeping (skipped
rows, double-read boundaries) breaks the value hash.

Filter pushdown (``pushFilters``) is deliberately NOT implemented: on
Spark 4.1 the planned Python scan is cached per ``load()`` relation, and a
pushed-down range from one plan leaks into OTHER plans built from the same
DataFrame — measured: ``df.where(rng).count()`` followed by a plain
``df.count()`` returned the filtered count (silent row loss). Until the
engine scopes Python-source pushdown per query plan, a stateless reader is
the only configuration that cannot corrupt results; the partition-pruning
upside is small next to that risk. The probe is kept as a regression test
(consistency across filtered-then-unfiltered actions).
"""

from __future__ import annotations

import hashlib
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = "doc_id bigint, source string, n_chars int, text string"
#: rows per InputPartition — the distribution grain; at 100 TB you size
#: this so a partition is a few hundred MB of generated rows
_ROWS_PER_PARTITION = 1250


def synth_row(doc_id: int) -> tuple:
    """Closed-form row — MUST stay in lockstep with the DuckDB oracle in
    operators.misc.source_python_datasource."""
    return (
        doc_id,
        f"src{doc_id % 10}",
        (doc_id * 37) % 991,
        hashlib.md5(str(doc_id).encode()).hexdigest(),
    )


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", "10000"))

    def partitions(self):
        out = []
        start = 0
        while start < self.n_rows:
            end = min(start + _ROWS_PER_PARTITION, self.n_rows)
            out.append(InputPartition((start, end)))
            start = end
        # zero-row reads still need >= 1 partition
        return out or [InputPartition((0, 0))]

    def read(self, partition: InputPartition):
        # Yield ONE pyarrow.RecordBatch per partition instead of per-row
        # tuples: the DataSource API's Arrow fast path skips per-row
        # Python->JVM pickling (r15; the row path measured 7.7-9.7 s for
        # 10k rows, almost all of it serialization machinery). Values
        # stay in lockstep with synth_row/the DuckDB oracle — pinned by
        # test_python_datasource_batch_equals_rows.
        import pyarrow as pa

        lo, hi = partition.value
        ids = list(range(lo, hi))
        yield pa.record_batch(
            [
                pa.array(ids, pa.int64()),
                pa.array([f"src{i % 10}" for i in ids], pa.string()),
                pa.array([(i * 37) % 991 for i in ids], pa.int32()),
                pa.array(
                    [
                        hashlib.md5(str(i).encode()).hexdigest()
                        for i in ids
                    ],
                    pa.string(),
                ),
            ],
            names=["doc_id", "source", "n_chars", "text"],
        )


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotently register the format with this session."""
    spark.dataSource.register(SyntheticDocsDataSource)


# ---------------------------------------------------------------------------
# Write path: a Python DataSource SINK (Spark 4 DataSourceWriter) — the API
# a pipeline uses to mount a non-file service (feature store, index
# ingest endpoint) as a first-class df.write target. Here the "service"
# is JSON-lines part files so the round-trip is verifiable.
# ---------------------------------------------------------------------------


from pyspark.sql.datasource import DataSourceWriter


class JsonLinesWriter(DataSourceWriter):
    """One part file per partition; executors only touch their own file.
    The commit message carries the written path + row count (the standard
    two-phase pattern: executors stage, the driver's commit() seals)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires a 'path' option")

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark.sql.datasource import WriterCommitMessage

        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return WriterCommitMessage()

    def commit(self, messages):
        import os

        open(os.path.join(self.path, "_SUCCESS"), "w").close()

    def abort(self, messages):
        pass


class JsonLinesSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def schema(self) -> str:  # not used for writes; required by the ABC
        return "doc_id bigint"

    def writer(self, schema, overwrite):
        return JsonLinesWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonLinesSinkDataSource)
