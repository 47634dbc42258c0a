"""End-to-end training-data curation pipeline (NEW, north-star flagship):
quality-score → language filter → fingerprint dedup → curated corpus, each
stage a pure DataFrame transformation and `@auto_tracking`-registered so
catalog-mode lineage shows the whole pipeline as named stages.

At 100 TB this is the shape of a real pretraining-data job: one scan, all
per-document scoring fused into it by Catalyst (single stage, no shuffle),
then exactly one shuffle for the dedup groupBy. The curated output would be
written `partitionBy(lang)` + bucketed on doc_id for downstream joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tracking import auto_tracking
from ..partitioning import SPREAD_MIN_BYTES as _SPREAD_MIN_BYTES
from ..partitioning import spread
from ..registry import register
from ..sources import load
from .text import _SPARK_WTOKS, _SW_LIST_SQL

_MIN_WORDS = 16
_MIN_QUALITY = 0.30


@auto_tracking
def score_documents(docs: DataFrame) -> DataFrame:
    """Per-document metrics — identical formulas to text_quality_score."""
    c = docs.select(
        "doc_id",
        "text",
        "lang",
        F.length("text").alias("n_chars"),
        F.size(F.expr(_SPARK_WTOKS)).alias("n_words"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("n_alpha"),
        F.size(F.expr(f"filter({_SPARK_WTOKS}, t -> t IN ({_SW_LIST_SQL}))")).alias(
            "n_stop"
        ),
    )
    return c.where(F.col("n_words") > 0).select(
        "doc_id",
        "text",
        "lang",
        "n_words",
        F.round(
            F.least(F.col("n_words").cast("double") / 64.0, F.lit(1.0))
            * (F.col("n_alpha").cast("double") / F.col("n_chars")),
            6,
        ).alias("quality"),
    )


@auto_tracking
def filter_quality(scored: DataFrame) -> DataFrame:
    return scored.where(
        (F.col("n_words") >= _MIN_WORDS) & (F.col("quality") >= _MIN_QUALITY)
    )


@auto_tracking
def dedup_by_fingerprint(filtered: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per normalized-text fingerprint."""
    fp = filtered.withColumn(
        "fp", F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    )
    keepers = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return fp.join(keepers, ["fp", "doc_id"]).drop("fp")


@register(
    "curate_corpus",
    rf"""
    WITH scored AS (
        SELECT doc_id, text, lang,
               len({{toks}}) AS n_words,
               ROUND(LEAST(CAST(len({{toks}}) AS DOUBLE) / 64.0, 1.0)
                     * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                        / length(text)), 6) AS quality
        FROM documents WHERE len({{toks}}) > 0),
    filtered AS (
        SELECT * FROM scored WHERE n_words >= {_MIN_WORDS} AND quality >= {_MIN_QUALITY}),
    fp AS (
        SELECT *, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
        FROM filtered),
    keepers AS (SELECT f, MIN(doc_id) AS doc_id FROM fp GROUP BY f)
    SELECT fp.doc_id, fp.lang, fp.n_words, fp.quality
    FROM fp JOIN keepers ON fp.f = keepers.f AND fp.doc_id = keepers.doc_id
    """.replace(
        "{toks}", r"list_filter(string_split_regex(lower(text), '\s+'), t -> t != '')"
    ),
    "pipeline",
    "bench",
)
def curate_corpus(spark, sf_dir):
    # size-bounded spread (the text tokenize-battery gate): the whole
    # score pipeline is fused into the scan and runs in BOTH fingerprint
    # join branches — on a split-starved source past the floor that is
    # 2x the corpus tokenize on one core
    docs = spread(
        spark,
        load(spark, sf_dir, "documents")["documents"],
        sf_dir,
        "documents",
        "doc_id",
        min_bytes=_SPREAD_MIN_BYTES,
    )
    curated = dedup_by_fingerprint(filter_quality(score_documents(docs)))
    return curated.select("doc_id", "lang", "n_words", "quality")
