"""Multimodal column plumbing (NEW — SURVEY.md §7 M7).

Images/audio/video are carried as opaque ``binary`` columns next to a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signatures, partitioning — is real and tested; the actual
codec step is stubbed: the container has no image/audio libraries, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` behind an
import gate, and the tested pipelines use a deterministic fake "decode"
(byte inspection / md5 features) so correctness is oracle-checkable.

At 100 TB the pattern matters more than the stub: binary payloads stay in
Arrow buffers end to end (no base64, no driver collect), batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, and per-batch
work is vectorized.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..registry import register
from ..sources import load


def decode_image(payload: bytes) -> "object":
    """Decode an image payload → (h, w, c) array. STUB: no codec libs here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires Pillow; install it on the cluster image. "
            "The Spark-side plumbing (binary column + mapInPandas) is real — "
            "only the codec call is stubbed."
        ) from exc
    raise NotImplementedError("wire Image.open(io.BytesIO(payload)) here")


def decode_audio(payload: bytes) -> "object":
    """Decode an audio payload → waveform. STUB: no codec libs here."""
    raise NotImplementedError(
        "audio decode requires soundfile/librosa; install on the cluster image"
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct to documents.

    Stands in for reading real image/audio bytes: payload = utf-8 bytes of
    the text. Schema shape is what a production multimodal table looks like:
    (id, payload binary, meta struct<mime,n_bytes,kind>).
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
            (F.col("doc_id") % 3).cast("int").alias("kind"),
        ).alias("meta"),
    )


@register(
    "multimodal_meta_extract",
    """
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
           CAST(doc_id % 3 AS INT) AS kind
    FROM documents
    """,
    "multimodal",
)
def multimodal_meta_extract(spark, sf_dir):
    """mapInPandas 'decode' over a binary column: inspects raw bytes.

    The fake decode reads payload bytes (length + first byte) — exactly the
    shape a real feature extractor has, minus the codec.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    binary = with_binary_payload(d)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0]).astype("int32"),
                    "kind": pdf["kind"].astype("int32"),
                }
            )

    return binary.select("doc_id", "payload", F.col("meta.kind").alias("kind")).mapInPandas(
        extract, "doc_id bigint, byte_len bigint, first_byte int, kind int"
    )


@register(
    "multimodal_thumbnail",
    """
    SELECT doc_id, md5(substr(text, 1, 16)) AS thumb_sig,
           CAST(LEAST(strlen(text), 16) AS INT) AS thumb_bytes
    FROM documents
    """,
    "multimodal",
)
def multimodal_thumbnail(spark, sf_dir):
    """'Thumbnail' extraction shape: slice a fixed-size prefix from each
    binary payload inside mapInPandas (stand-in for a resize/crop codec) and
    emit a content signature + size. The corpus is ASCII so byte slicing
    equals char slicing and the md5 signature is oracle-checkable."""
    d = load(spark, sf_dir, "documents")["documents"]
    binary = with_binary_payload(d)

    def thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sliced = pdf["payload"].map(lambda b: bytes(b[:16]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb_sig": sliced.map(lambda b: hashlib.md5(b).hexdigest()),
                    "thumb_bytes": sliced.map(len).astype("int32"),
                }
            )

    return binary.select("doc_id", "payload").mapInPandas(
        thumb, "doc_id bigint, thumb_sig string, thumb_bytes int"
    )


@register(
    "multimodal_frame_sample",
    """
    WITH f AS (
        SELECT doc_id, n_chars,
               unnest(generate_series(0, CAST(floor(n_chars / 50) AS BIGINT), 2)) AS frame_id
        FROM documents)
    SELECT doc_id, frame_id,
           substr(md5(concat(CAST(doc_id AS VARCHAR), ':', CAST(frame_id AS VARCHAR))), 1, 8) AS feature
    FROM f
    """,
    "multimodal",
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling: explode every 2nd 'frame', extract a feature per frame
    via a deterministic fake decode (md5) inside mapInPandas."""
    d = load(spark, sf_dir, "documents")["documents"]
    frames = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.floor(F.col("n_chars") / 50), F.lit(2))
        ).alias("frame_id"),
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf["doc_id"].astype(str) + ":" + pdf["frame_id"].astype(str)
            pdf = pdf.assign(
                feature=keys.map(lambda k: hashlib.md5(k.encode()).hexdigest()[:8])
            )
            yield pdf[["doc_id", "frame_id", "feature"]]

    return frames.mapInPandas(featurize, "doc_id bigint, frame_id bigint, feature string")


@register(
    "multimodal_dedup_payload",
    """
    SELECT fp, MIN(id) AS keeper, COUNT(*) AS n_copies,
           MIN(n_bytes) AS n_bytes
    FROM (
        SELECT doc_id AS id, md5(hex(encode(text))) AS fp,
               octet_length(encode(text)) AS n_bytes
        FROM documents) t
    GROUP BY fp
    HAVING COUNT(*) >= 1
    """,
    "multimodal",
)
def multimodal_dedup_payload(spark, sf_dir):
    """Exact media dedup on the raw BINARY payload — the first pass every
    multimodal pipeline runs before any decode: identical files (same
    bytes) collapse regardless of filename/metadata, at the cost of one
    shuffle on a 16-byte fingerprint. Content-defined near-dup (perceptual
    hashing) sits behind the decode stubs; byte-exact dedup needs no codec
    and catches the bulk of crawl duplicates.

    The fingerprint is md5(hex(payload)): DuckDB's md5 only accepts
    VARCHAR, and hex is a bit-exact, engine-neutral binary->text encoding
    (Spark's base64 is MIME-chunked with line breaks, DuckDB's isn't). At
    scale you'd use Spark's md5(binary) directly or xxhash64 — the text
    hop here is purely for oracle parity.
    """
    docs = load(spark, sf_dir, "documents")["documents"]
    media = with_binary_payload(docs)
    return (
        media.select(
            F.col("doc_id").alias("id"),
            F.md5(F.hex(F.col("payload"))).alias("fp"),
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("fp")
        .agg(
            F.min("id").alias("keeper"),
            F.count("*").alias("n_copies"),
            F.min("n_bytes").alias("n_bytes"),
        )
        .select("fp", "keeper", "n_copies", "n_bytes")
    )
