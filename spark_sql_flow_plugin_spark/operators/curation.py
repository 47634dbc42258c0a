"""Corpus-curation operators for LLM training-data pipelines (NEW — no
reference counterpart; BASELINE.json north star): benchmark decontamination,
deterministic stratified sampling, sequence chunking, repetition scoring,
and domain-mix rebalancing.

These are the steps a 100 TB pre-training pipeline runs between raw ingest
and tokenization. All hot paths are JVM-side `pyspark.sql.functions`
(whole-stage codegen; no Python UDFs), and every formula is replicated
verbatim in the DuckDB oracle:

- the n-gram keys are md5 hex strings (identical in both engines, unlike
  murmur3/xxhash builtins);
- sampling decisions come from md5-derived uniform deviates, so the "random"
  sample is a pure function of the row key — re-runnable, audit-able, and
  cross-engine identical (the property a production pipeline needs anyway:
  elastic re-execution must not resample);
- ratios are plain double divisions of exact integer counts.

Scale posture (asserted in tests/test_scale_plans.py):
- decontamination joins the corpus n-gram stream against the *benchmark*
  n-gram set, which is tiny by construction (eval suites are MBs, the corpus
  is TBs) → broadcast hash join, corpus never shuffles;
- chunking / repetition / sampling are row-local (no Exchange at all beyond
  the final aggregation where one exists);
- domain-mix runs one partial-aggregated groupBy over ~#domains rows.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..partitioning import spread
from ..registry import register
from ..sources import load
from .text import _DUCK_WTOKS, _SPARK_WTOKS

# Word 8-gram keys, md5-hashed: the standard train/test-contamination
# granularity (long enough that natural-language collisions are rare).
_N = 8
_SPARK_NGRAM_KEYS = (
    f"array_distinct(transform(sequence(1, size(toks) - {_N - 1}), "
    f"i -> md5(array_join(slice(toks, i, {_N}), ' '))))"
)
_DUCK_NGRAM_KEYS = (
    f"list_distinct(list_transform(generate_series(1, len(toks) - {_N - 1}), "
    f"i -> md5(array_to_string(toks[i:i+{_N - 1}], ' '))))"
)


@register(
    "decontaminate_ngram",
    f"""
    WITH toks AS (
        SELECT doc_id, {_DUCK_WTOKS} AS toks FROM documents),
    ng AS (
        SELECT doc_id, unnest({_DUCK_NGRAM_KEYS}) AS k
        FROM toks WHERE len(toks) >= {_N}),
    bench AS (SELECT DISTINCT k FROM ng WHERE doc_id % 20 = 0),
    corpus AS (SELECT doc_id, k FROM ng WHERE doc_id % 20 != 0)
    SELECT corpus.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
    FROM corpus JOIN bench USING (k)
    GROUP BY corpus.doc_id
    """,
    "curation",
)
def decontaminate_ngram(spark, sf_dir):
    """Train/test decontamination: flag corpus documents sharing any word
    8-gram with the benchmark holdout (doc_id % 20 == 0 stands in for the
    eval suite).

    100 TB shape: the benchmark n-gram set is small by construction, so the
    join broadcasts it and the corpus n-gram stream never shuffles; per-doc
    dedup happens pre-explode via array_distinct, so the counting groupBy
    aggregates one row per (doc, shared n-gram).
    """
    d = load(spark, sf_dir, "documents")["documents"]
    ng = (
        d.select("doc_id", F.expr(_SPARK_WTOKS).alias("toks"))
        .where(F.expr("size(toks)") >= _N)
        .select("doc_id", F.explode(F.expr(_SPARK_NGRAM_KEYS)).alias("k"))
    )
    bench = ng.where(F.col("doc_id") % 20 == 0).select("k").distinct()
    corpus = ng.where(F.col("doc_id") % 20 != 0)
    return (
        corpus.join(F.broadcast(bench), "k")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


# Uniform deviate in [0, 1) from the first 8 md5 hex digits of the row key.
_SPARK_U = "conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) / 4294967296.0"
_DUCK_U = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0"
# Per-stratum keep rates keyed on a hash of the FULL source string — never
# on positional parsing of the generator's current 'srcN' naming (the driver
# can regenerate testdata with a different source format between sessions,
# and under ANSI mode a failed CAST would abort the whole query). md5 parity
# is engine-portable and stable under any naming scheme.
_SPARK_RATE = (
    "CASE WHEN conv(substr(md5(source), 1, 1), 16, 10) % 2 = 0 "
    "THEN 0.25 ELSE 0.75 END"
)
_DUCK_RATE = (
    "CASE WHEN ('0x' || substr(md5(source), 1, 1))::BIGINT % 2 = 0 "
    "THEN 0.25 ELSE 0.75 END"
)


@register(
    "sample_stratified_hash",
    f"""
    SELECT doc_id, source, round({_DUCK_U}, 9) AS u
    FROM documents
    WHERE {_DUCK_U} < {_DUCK_RATE}
    """,
    "curation",
)
def sample_stratified_hash(spark, sf_dir):
    """Deterministic stratified sampling: keep a row iff its md5-derived
    uniform deviate falls under its stratum's rate.

    Unlike `df.sample()` / TABLESAMPLE, the decision is a pure function of
    the row key — re-running the pipeline (or re-executing a lost partition
    on a 1000-executor cluster) selects the SAME sample, which is what makes
    the result reproducible and oracle-checkable. Row-local: no shuffle.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    u = F.expr(_SPARK_U)
    rate = F.expr(_SPARK_RATE)
    return d.where(u < rate).select("doc_id", "source", F.round(u, 9).alias("u"))


_CHUNK = 32


@register(
    "docs_chunk_tokens",
    f"""
    WITH toks AS (
        SELECT doc_id, {_DUCK_WTOKS} AS toks FROM documents),
    c AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, CAST(floor((len(toks) - 1) / {_CHUNK}) AS INT))) AS chunk_id
        FROM toks WHERE len(toks) > 0)
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(LEAST({_CHUNK}, len(toks) - chunk_id * {_CHUNK}) AS INT) AS n_chunk_tokens,
           md5(array_to_string(toks[chunk_id * {_CHUNK} + 1 : chunk_id * {_CHUNK} + {_CHUNK}], ' ')) AS chunk_fp
    FROM c
    """,
    "curation",
)
def docs_chunk_tokens(spark, sf_dir):
    """Sequence-prep chunking: split every document into fixed 32-token
    windows (the max-sequence-length packing step before tokenization),
    emitting per-chunk token counts and a content fingerprint.

    Row-local fan-out (explode of an in-row sequence): embarrassingly
    parallel, zero shuffles, scales linearly with corpus bytes.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    return (
        d.select("doc_id", F.expr(_SPARK_WTOKS).alias("toks"))
        .where(F.expr("size(toks)") > 0)
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.expr(f"sequence(0, cast((size(toks) - 1) / {_CHUNK} as int))")
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.least(
                F.lit(_CHUNK), F.expr(f"size(toks) - chunk_id * {_CHUNK}")
            ).cast("int").alias("n_chunk_tokens"),
            F.expr(
                f"md5(array_join(slice(toks, chunk_id * {_CHUNK} + 1, {_CHUNK}), ' '))"
            ).alias("chunk_fp"),
        )
    )


_SPARK_3G = (
    "zip_with(slice(toks, 1, size(toks) - 2), "
    "zip_with(slice(toks, 2, size(toks) - 2), slice(toks, 3, size(toks) - 2), "
    "(b, c) -> concat(b, ' ', c)), (a, bc) -> concat(a, ' ', bc))"
)
_DUCK_3G = (
    "list_transform(generate_series(1, len(toks) - 2), "
    "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
)


@register(
    "text_repetition_score",
    f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_WTOKS} AS toks FROM documents),
    c AS (
        SELECT doc_id,
               len(toks) AS n_toks,
               len(list_distinct(toks)) AS n_uniq,
               len(toks) - 2 AS n_3g,
               len(list_distinct({_DUCK_3G})) AS n_uniq_3g
        FROM t WHERE len(toks) >= 3)
    SELECT doc_id, CAST(n_toks AS INT) AS n_toks,
           round(CAST(n_uniq AS DOUBLE) / n_toks, 6) AS uniq_token_ratio,
           round(1.0 - CAST(n_uniq_3g AS DOUBLE) / n_3g, 6) AS dup_3gram_ratio
    FROM c
    """,
    "curation",
)
def text_repetition_score(spark, sf_dir):
    """Repetition / boilerplate detector: unique-token ratio and duplicate
    word-3-gram fraction (the cheap structural proxies for low-quality,
    loopy, or template text that curation filters threshold on).

    Row-local HOFs (zip_with shingles — same trick as dedup_minhash_lsh:
    slice() outside the lambda evaluates once per row); no shuffle.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    c = (
        d.select("doc_id", F.expr(_SPARK_WTOKS).alias("toks"))
        .where(F.expr("size(toks)") >= 3)
        .select(
            "doc_id",
            F.expr("size(toks)").alias("n_toks"),
            F.expr("size(array_distinct(toks))").alias("n_uniq"),
            F.expr("size(toks) - 2").alias("n_3g"),
            F.expr(f"size(array_distinct({_SPARK_3G}))").alias("n_uniq_3g"),
        )
    )
    return c.select(
        "doc_id",
        F.col("n_toks").cast("int").alias("n_toks"),
        F.round(F.col("n_uniq").cast("double") / F.col("n_toks"), 6).alias(
            "uniq_token_ratio"
        ),
        F.round(
            F.lit(1.0) - F.col("n_uniq_3g").cast("double") / F.col("n_3g"), 6
        ).alias("dup_3gram_ratio"),
    )


@register(
    "domain_mix_rates",
    f"""
    WITH per_src AS (
        SELECT source, SUM(len({_DUCK_WTOKS})) AS tok_total
        FROM documents GROUP BY source),
    tot AS (SELECT SUM(tok_total) AS grand, COUNT(*) AS n_src FROM per_src)
    SELECT source, CAST(tok_total AS BIGINT) AS tok_total,
           round(LEAST(1.0, (CAST(grand AS DOUBLE) / n_src) / tok_total), 6)
               AS sample_rate
    FROM per_src, tot
    """,
    "curation",
)
def domain_mix_rates(spark, sf_dir):
    """Domain-mix rebalancing: per-source token totals and the per-source
    sampling rate that moves the corpus toward a uniform target mixture
    (rate = min(1, target_share / actual_share)).

    One partial-aggregated groupBy over the corpus; the grand total joins
    back as a single broadcast row — never a driver-side collect().
    """
    d = load(spark, sf_dir, "documents")["documents"]
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.expr(_SPARK_WTOKS))).alias("tok_total")
    )
    tot = per_src.agg(
        F.sum("tok_total").alias("grand"), F.count("*").alias("n_src")
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("tok_total").cast("bigint").alias("tok_total"),
        F.round(
            F.least(
                F.lit(1.0),
                (F.col("grand").cast("double") / F.col("n_src")) / F.col("tok_total"),
            ),
            6,
        ).alias("sample_rate"),
    )


_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+"
_PHONE_RE = "555-[0-9]+"


@register(
    "pii_scrub",
    f"""
    WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact_' || CAST(doc_id AS VARCHAR)
                         || '@example.com ph 555-0' || CAST(doc_id % 100 AS VARCHAR)
                    ELSE text END AS text
        FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS clean_md5
    FROM aug
    """,
    "curation",
)
def pii_scrub(spark, sf_dir):
    """PII redaction — the scrub pass every training corpus runs before
    tokenization: count and replace email/phone matches, emit the redacted
    text's fingerprint so the oracle verifies the REDACTED BYTES, not just
    the match counts. Deterministic augmentation (every 7th doc gets a
    synthetic email + phone) guarantees the patterns actually fire on this
    clean synthetic corpus. Row-local regex work — zero shuffles; the
    pattern subset used is dialect-portable (no lookarounds/backrefs,
    which diverge between Java regex and RE2-family engines).
    """
    d = load(spark, sf_dir, "documents")["documents"]
    aug = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact_"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com ph 555-0"),
                (F.col("doc_id") % 100).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return aug.select(
        "doc_id",
        F.expr(f"CAST(size(regexp_extract_all(text, '{_EMAIL_RE}', 0)) AS INT)").alias(
            "n_emails"
        ),
        F.expr(f"CAST(size(regexp_extract_all(text, '{_PHONE_RE}', 0)) AS INT)").alias(
            "n_phones"
        ),
        F.md5(clean).alias("clean_md5"),
    )


@register(
    "split_train_val_test",
    f"""
    SELECT source, split, COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
    FROM (
        SELECT source, n_chars,
               CASE WHEN {_DUCK_U} < 0.8 THEN 'train'
                    WHEN {_DUCK_U} < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents) t
    GROUP BY source, split
    """,
    "curation",
)
def split_train_val_test(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment from the same
    md5-derived uniform deviate as `sample_stratified_hash`: membership is
    a pure function of doc_id, so a re-run (or a retried partition on a
    1000-executor job) never moves a document across splits — the property
    that keeps eval sets honest. Row-local + one small aggregation."""
    d = load(spark, sf_dir, "documents")["documents"]
    u = F.expr(_SPARK_U)
    split = (
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
    ).alias("split")
    return (
        d.select("source", "n_chars", split)
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("bigint")).alias("sum_chars"),
        )
    )


_PACK_L = 4096


#: Documents per prefix-sum chunk. Internal to the algorithm — the output
#: is identical for any value (the oracle doesn't know about chunks); it
#: only sets the parallelism grain of the wide stage.
_PACK_CHUNK_DOCS = 1024


def _pack_bins(toks, chunk_docs=_PACK_CHUNK_DOCS):
    """(doc_id, source, n_toks) → (source, n_toks, bin) via a two-phase
    distributed prefix sum. See :func:`pack_sequences_running`."""
    # integer DIV: exact at any doc_id magnitude (a double division would
    # lose precision past 2^53)
    chunked = toks.withColumn("chunk", F.expr(f"doc_id DIV {int(chunk_docs)}"))
    # phase 1: per-chunk token sums — a tiny table (n_docs / chunk_docs rows)
    chunk_sums = chunked.groupBy("source", "chunk").agg(
        F.sum("n_toks").alias("chunk_toks")
    )
    # phase 2: prefix-sum the chunk table per source (n/B rows — small at
    # any scale: 10^10 docs / 1024 ≈ 10^7 rows), then broadcast the
    # per-chunk starting offsets back to the data
    w_chunks = (
        Window.partitionBy("source")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = chunk_sums.select(
        "source",
        "chunk",
        (F.sum("chunk_toks").over(w_chunks) - F.col("chunk_toks")).alias(
            "chunk_offset"
        ),
    )
    # phase 3: running sum WITHIN each (source, chunk) — the wide stage is
    # partitioned by chunk id, so parallelism grows with the corpus, not
    # with the source-column cardinality
    w_in = (
        Window.partitionBy("source", "chunk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # no forced broadcast: the offsets table grows with the corpus
    # (n_docs / chunk_docs rows) — Catalyst broadcasts it while it is
    # small and falls back to a shuffle join on (source, chunk) at scale,
    # which is co-partitioned with the in-chunk window right below
    return (
        chunked.join(offsets, ["source", "chunk"])
        .select(
            "source",
            "n_toks",
            (
                F.col("chunk_offset")
                + F.sum("n_toks").over(w_in)
                - F.col("n_toks")
            ).alias("cum_before"),
        )
        # integer DIV, like the chunk id above: a double division would
        # lose exactness once cumulative token counts pass 2^53
        .select("source", "n_toks", F.expr(f"cum_before DIV {_PACK_L}").alias("bin"))
    )


@register(
    "pack_sequences_running",
    f"""
    WITH toks AS (
        SELECT doc_id, source, len({_DUCK_WTOKS}) AS n_toks FROM documents),
    binned AS (
        SELECT source, n_toks,
               CAST(floor((SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - n_toks) / {_PACK_L}) AS BIGINT) AS bin
        FROM toks)
    SELECT source, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_toks
    FROM binned GROUP BY source, bin
    """,
    "curation",
)
def pack_sequences_running(spark, sf_dir):
    """Sequence packing: assign documents to training-sequence bins of
    ~4096 tokens via a per-source running token count (bin = the cumulative
    count at the document's START, integer-divided by L) — the
    deterministic packing a distributed pipeline uses instead of
    order-dependent greedy bin-packing.

    The running sum is a TWO-PHASE distributed prefix sum, not a bare
    ``Window.partitionBy(source)``: documents has only ~20 sources, so a
    per-source window would cap parallelism at 20 tasks (a ~5 TB
    single-task sort per source at 100 TB). Instead: (1) chunk by
    ``doc_id DIV 1024`` and aggregate per-chunk token sums, (2) prefix-sum
    the chunk table and join each chunk's starting offset back,
    (3) window only WITHIN (source, chunk). Same output for any chunk
    size; parallelism ∝ corpus size. Integer arithmetic end to end, so
    both engines agree exactly.
    """
    from .text import _SPARK_WTOKS

    d = load(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        "doc_id", "source", F.expr(f"size({_SPARK_WTOKS})").alias("n_toks")
    )
    return _pack_bins(toks).groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_toks"),
    )


@register(
    "padding_waste_stats",
    f"""
    WITH lens AS (
        SELECT CAST(len({_DUCK_WTOKS}) AS BIGINT) AS n_toks FROM documents
        WHERE len({_DUCK_WTOKS}) > 0),
    bucketed AS (
        SELECT n_toks,
               CAST(POWER(2, CEIL(LOG2(n_toks))) AS BIGINT) AS bucket
        FROM lens)
    SELECT bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS real_toks,
           CAST(SUM(bucket - n_toks) AS BIGINT) AS padding_toks,
           CAST(SUM(bucket - n_toks) AS DOUBLE)
               / (CAST(SUM(bucket) AS DOUBLE)) AS waste_ratio
    FROM bucketed GROUP BY bucket
    """,
    "curation",
)
def padding_waste_stats(spark, sf_dir):
    """Length-bucketed batching economics: assign each document to its
    power-of-two token-length bucket and report how many pad tokens the
    bucket costs vs the real tokens — the number that decides a training
    job's effective FLOP utilization (padding is compute burned on
    nothing; bucketed batching exists to shrink it). Integer token counts
    end to end; the one ratio is a double division of exact sums.
    Row-local bucket assignment + one small aggregation (#buckets rows):
    no scale hazards."""
    d = load(spark, sf_dir, "documents")["documents"]
    lens = d.select(
        F.expr(f"cast(size({_SPARK_WTOKS}) as bigint)").alias("n_toks")
    ).where(F.col("n_toks") > 0)
    # ceil(log2(n)) in float is safe here: exact powers of two have exact
    # float log2 (so ceil can't overshoot), and non-powers sit >= ~1e-7
    # from the nearest integer for any realistic doc length — far beyond
    # libm's last-ulp differences, so both engines bucket identically
    bucketed = lens.withColumn(
        "bucket",
        F.expr("cast(power(2, ceil(log2(n_toks))) as bigint)"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("real_toks"),
        F.sum(F.col("bucket") - F.col("n_toks")).cast("bigint").alias("padding_toks"),
        (
            F.sum(F.col("bucket") - F.col("n_toks")).cast("double")
            / F.sum("bucket").cast("double")
        ).alias("waste_ratio"),
    )


# --- Bloom-filter decontamination -----------------------------------------
# A 2^20-bit Bloom bitmap (16 KiB of longs) with 4 md5-derived hash
# positions per n-gram.  At 100 TB the benchmark n-gram SET is small but
# still wide (hundreds of MBs of md5 strings); the bitmap is what a real
# pipeline broadcasts instead — constant 128 KiB regardless of benchmark
# size.  md5-derived positions make the filter (including its false
# positives) a pure deterministic function of the gram, so DuckDB
# reproduces the exact same flag set via the equivalent position-set
# membership formulation.
_BLOOM_M = 1 << 20
_BLOOM_K = 4
_SPARK_BLOOM_POS = (
    "CAST(conv(substr(md5(concat(k, ':', j)), 1, 8), 16, 10) AS BIGINT) "
    f"% {_BLOOM_M}"
)
_DUCK_BLOOM_POS = (
    "('0x' || substr(md5(k || ':' || j), 1, 8))::BIGINT "
    f"% {_BLOOM_M}"
)


@register(
    "decontaminate_bloom",
    f"""
    WITH toks AS (
        SELECT doc_id, {_DUCK_WTOKS} AS toks FROM documents),
    ng AS (
        SELECT doc_id, unnest({_DUCK_NGRAM_KEYS}) AS k
        FROM toks WHERE len(toks) >= {_N}),
    bench AS (SELECT DISTINCT k FROM ng WHERE doc_id % 20 = 0),
    bpos AS (
        SELECT DISTINCT {_DUCK_BLOOM_POS} AS pos
        FROM bench, generate_series(1, {_BLOOM_K}) AS t(j)),
    corpus AS (SELECT doc_id, k FROM ng WHERE doc_id % 20 != 0),
    cpos AS (
        SELECT doc_id, k, {_DUCK_BLOOM_POS} AS pos
        FROM corpus, generate_series(1, {_BLOOM_K}) AS t(j)),
    hits AS (
        SELECT doc_id, k FROM cpos JOIN bpos USING (pos)
        GROUP BY doc_id, k HAVING COUNT(*) = {_BLOOM_K})
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_flagged_ngrams
    FROM hits GROUP BY doc_id
    """,
    "curation",
)
def decontaminate_bloom(spark, sf_dir):
    """Decontamination against a broadcast Bloom bitmap instead of the raw
    benchmark n-gram set.

    100 TB shape: the corpus n-gram stream is probed against a constant-size
    (2^20-bit) bitmap — built with a word-packed ``bit_or`` aggregation over
    the benchmark grams' hash positions — so the broadcast payload stays
    ~16K longs no matter how large the eval suites grow, and the corpus side
    never shuffles until the tiny per-(doc, gram) hit aggregation.  The
    deliberate false-positive rate ((1-e^(-kn/m))^k, ~1e-3 at sf0.1) is the
    price of the constant-size broadcast; flagged docs would be re-checked
    exactly downstream (`decontaminate_ngram` IS that exact check).
    """
    d = load(spark, sf_dir, "documents")["documents"]
    ng = (
        d.select("doc_id", F.expr(_SPARK_WTOKS).alias("toks"))
        .where(F.expr("size(toks)") >= _N)
        .select("doc_id", F.explode(F.expr(_SPARK_NGRAM_KEYS)).alias("k"))
    )
    # Build: benchmark grams -> 4 bit positions each -> packed 64-bit words.
    bloom = (
        ng.where(F.col("doc_id") % 20 == 0)
        .select("k")
        .distinct()
        .select("k", F.explode(F.expr(f"sequence(1, {_BLOOM_K})")).alias("j"))
        .select(F.expr(_SPARK_BLOOM_POS).alias("pos"))
        .distinct()
        .select(
            F.expr("pos DIV 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )
    # Probe: every corpus gram checks its 4 bits against the broadcast words.
    probe = (
        ng.where(F.col("doc_id") % 20 != 0)
        .select("doc_id", "k", F.explode(F.expr(f"sequence(1, {_BLOOM_K})")).alias("j"))
        .withColumn("pos", F.expr(_SPARK_BLOOM_POS))
        .withColumn("word_idx", F.expr("pos DIV 64"))
        .withColumn("bit", F.expr("CAST(pos % 64 AS INT)"))
    )
    hits = (
        probe.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "hit",
            F.expr(
                "CASE WHEN word IS NULL THEN 0 "
                "ELSE CAST(shiftright(word, bit) & 1 AS INT) END"
            ),
        )
        .groupBy("doc_id", "k")
        .agg(F.sum("hit").alias("nh"))
        .where(F.col("nh") == _BLOOM_K)
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_flagged_ngrams")
    )


# ---------------------------------------------------------------------------
# Round 10 — DSIR: Data Selection via Importance Resampling (Xie et al. 2023).
# Score every raw-pool document by how target-like its hashed-unigram
# distribution is under two Laplace-smoothed bag-of-words models (target =
# one curated domain, raw = everything else). The paper ranks by the sum of
# per-feature log probability ratios; this implementation sums per-token
# FLOOR(1e6 * p_target(b)/p_raw(b)) instead — the repo's log-free quantized
# surrogate (same family as the hard-sigmoid in quality_train_logreg and
# the ratio idf in text_tfidf_top_terms): libm log() differs across engines
# in the last bits, while the ratio is a fixed +-*/ sequence on exact
# integer counts, IEEE-identical everywhere. Monotone per token, so
# "target-like tokens score high" is preserved; document scores are exact
# BIGINTs.
# ---------------------------------------------------------------------------

_DSIR_B = 1024  # hashed-feature buckets
_DSIR_TARGET = "src0"  # the curated "target domain" sources
# bucket id from the first 8 md5 hex digits of the token
_SPARK_DSIR_BUCKET = (
    f"CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT) % {_DSIR_B}"
)
_DUCK_DSIR_BUCKET = f"('0x' || substr(md5(tok), 1, 8))::BIGINT % {_DSIR_B}"
# per-bucket quantized likelihood ratio — IDENTICAL op order both engines:
# two Laplace probabilities (each one division of exact ints widened to
# double), one ratio division, scale, floor
_DSIR_Q = (
    "CAST(FLOOR(1e6 * ((CAST(c_t + 1 AS DOUBLE) / CAST(n_t + {B} AS DOUBLE))"
    " / (CAST(c_r + 1 AS DOUBLE) / CAST(n_r + {B} AS DOUBLE)))) AS BIGINT)"
).format(B=_DSIR_B)


@register(
    "dsir_importance_weights",
    f"""
    WITH occ AS (
        SELECT doc_id, source, unnest(toks) AS tok
        FROM (SELECT doc_id, source, {_DUCK_WTOKS} AS toks FROM documents)
        ),
    occb AS (
        SELECT doc_id, source = '{_DSIR_TARGET}' AS is_t,
               {_DUCK_DSIR_BUCKET} AS b
        FROM occ),
    tot AS (
        SELECT CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
               CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS n_r
        FROM occb),
    model AS (
        SELECT b,
               CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
               CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS c_r
        FROM occb GROUP BY b),
    q AS (
        SELECT b, {_DSIR_Q} AS qv
        FROM model CROSS JOIN tot)
    SELECT occb.doc_id,
           CAST(COUNT(*) AS INT) AS n_toks,
           CAST(SUM(q.qv) AS BIGINT) AS dsir_q6,
           CAST(SUM(q.qv) AS BIGINT) // COUNT(*) AS avg_q6
    FROM occb JOIN q USING (b)
    WHERE NOT occb.is_t
    GROUP BY occb.doc_id
    """,
    "curation",
    "llm-pipeline",
    "bench",
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR importance scores for the raw pool against a curated target
    domain (source = 'src0'): hashed-unigram features (md5 -> 1024
    buckets), two Laplace-smoothed bag-of-words models, per-token
    quantized likelihood ratios summed per document. Selection is then
    `ORDER BY avg_q6 DESC LIMIT k` — Spark plans distributed top-k
    (TakeOrderedAndProject), so no global-sort bottleneck is baked in
    here.

    Scale posture: feature hashing is row-local; both models are
    {_DSIR_B}-row aggregates (map-side partial agg) crossed with a 1-row
    totals frame and BROADCAST back onto the token stream — the corpus
    shuffles once on the {_DSIR_B}-key bucket for the model build and
    never for scoring; the per-doc rollup is the only corpus-scale
    aggregation. The ratio arithmetic stays in exact BIGINT counts
    widened to double (no log, no summation-order hazard) — see module
    comment."""
    d = load(spark, sf_dir, "documents")["documents"]
    # spread before tokenize (single-row-group source would pin it to one
    # core) and PERSIST at (doc, bucket) grain, not token grain (r16-opt
    # continuation, guide §2.3 aggregate early): the corpus vocabulary is
    # small, so per-doc bucket COUNTS carry ~4x fewer rows than token
    # occurrences through the cache and all three consumer scans (the
    # corpus totals, the bucket model, and the scoring join) — and the
    # pre-aggregation is partition-local (the spread already hash-
    # partitions by doc_id, which satisfies the (doc_id, is_t, b)
    # clustering, so no exchange is added). Every downstream SUM over
    # occurrences becomes the identical exact-BIGINT SUM(c * ...).
    docb = (
        spread(spark, d, sf_dir, "documents", "doc_id")
        .select(
            "doc_id",
            (F.col("source") == _DSIR_TARGET).alias("is_t"),
            F.explode(F.expr(_SPARK_WTOKS)).alias("tok"),
        )
        .select("doc_id", "is_t", F.expr(_SPARK_DSIR_BUCKET).alias("b"))
        .groupBy("doc_id", "is_t", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    tot = docb.agg(
        F.sum(F.when(F.col("is_t"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n_t"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(F.col("c")))
        .cast("bigint")
        .alias("n_r"),
    )
    model = docb.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("c_t"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(F.col("c")))
        .cast("bigint")
        .alias("c_r"),
    )
    q = model.crossJoin(F.broadcast(tot)).select("b", F.expr(_DSIR_Q).alias("qv"))
    from ..caching import scope_caches

    return scope_caches(
        docb.where(~F.col("is_t"))
        .join(F.broadcast(q), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("int").alias("n_toks"),
            F.sum(F.col("c") * F.col("qv")).cast("bigint").alias("dsir_q6"),
            F.expr(
                "CAST(SUM(c * qv) AS BIGINT) DIV CAST(SUM(c) AS BIGINT)"
            ).alias("avg_q6"),
        ),
        docb,
    )


# ---------------------------------------------------------------------------
# Round 10 — temperature-scaled domain sampling (the XLM-R / Gopher / LLaMA
# mixture rule): sampling weight per domain ∝ p_i^alpha with alpha = 1/2,
# which upweights small domains relative to proportional sampling without
# letting any one domain dominate. alpha = 1/2 keeps the power inside IEEE
# sqrt (exactly rounded, cross-engine identical — no libm pow()); each
# sqrt is floor-quantized to a BIGINT before the cross-domain normalization
# sum, so the denominator is exact and order-independent.
# ---------------------------------------------------------------------------


@register(
    "domain_mix_temperature",
    f"""
    WITH per_src AS (
        SELECT source,
               CAST(SUM(len({_DUCK_WTOKS})) AS BIGINT) AS tok_total
        FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(tok_total) AS BIGINT) AS grand FROM per_src),
    wq AS (
        SELECT source, tok_total,
               CAST(FLOOR(1e9 * sqrt(CAST(tok_total AS DOUBLE)
                                     / CAST(grand AS DOUBLE))) AS BIGINT) AS w_q9
        FROM per_src, tot),
    norm AS (SELECT CAST(SUM(w_q9) AS BIGINT) AS w_sum FROM wq)
    SELECT source, tok_total,
           CAST(w_q9 AS DOUBLE) / w_sum AS mix_rate,
           CAST(FLOOR((CAST(w_q9 AS DOUBLE) / w_sum)
                      * (SELECT grand FROM tot)) AS BIGINT) AS epoch_tokens
    FROM wq, norm
    """,
    "curation",
    "llm-pipeline",
)
def domain_mix_temperature(spark, sf_dir):
    """Temperature-scaled domain mixture (T = 2, i.e. weight ∝ share^(1/2)):
    per-source token mass, the normalized temperature-sampled mix rate,
    and the expected tokens drawn per epoch-equivalent. The knob between
    proportional sampling (T=1, head domains dominate) and uniform (T=∞,
    tiny domains oversample into repetition) for multilingual / multi-
    domain pre-training.

    Scale posture: one partial-aggregated groupBy over the corpus to
    #domains rows; the grand total and the normalization sum are 1-row
    broadcast frames (never a driver collect). Exactness: share and its
    sqrt are IEEE-exact on exact BIGINT inputs; each weight is floor-
    quantized to a BIGINT BEFORE the cross-domain sum, so the denominator
    is order-independent; mix_rate and epoch_tokens are then single
    divisions/floors of exact integers."""
    d = load(spark, sf_dir, "documents")["documents"]
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.expr(_SPARK_WTOKS))).cast("bigint").alias("tok_total")
    )
    tot = per_src.agg(F.sum("tok_total").cast("bigint").alias("grand"))
    wq = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "tok_total",
        "grand",
        F.expr(
            "CAST(FLOOR(1e9 * sqrt(CAST(tok_total AS DOUBLE)"
            " / CAST(grand AS DOUBLE))) AS BIGINT)"
        ).alias("w_q9"),
    )
    norm = wq.agg(F.sum("w_q9").cast("bigint").alias("w_sum"))
    return wq.crossJoin(F.broadcast(norm)).select(
        "source",
        "tok_total",
        (F.col("w_q9").cast("double") / F.col("w_sum")).alias("mix_rate"),
        F.expr(
            "CAST(FLOOR((CAST(w_q9 AS DOUBLE) / w_sum) * grand) AS BIGINT)"
        ).alias("epoch_tokens"),
    )


# ---------------------------------------------------------------------------
# Round 10 — compliance deletion (right-to-be-forgotten / takedown): remove
# every document matching a tombstone list and account for what was removed.
# Content-addressed (md5-of-text fingerprints), so exact duplicates of the
# requested content are swept too — the contract a real takedown needs.
# ---------------------------------------------------------------------------


@register(
    "compliance_delete_audit",
    """
    WITH tomb AS (
        SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 17 = 3),
    corpus AS (
        SELECT source, md5(text) AS fp, length(text) AS nb FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_before,
           CAST(SUM(CASE WHEN t.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_deleted,
           CAST(SUM(CASE WHEN t.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(CASE WHEN t.fp IS NOT NULL THEN nb ELSE 0 END) AS BIGINT)
               AS bytes_deleted
    FROM corpus LEFT JOIN tomb t USING (fp)
    GROUP BY source
    """,
    "curation",
    "llm-pipeline",
)
def compliance_delete_audit(spark, sf_dir):
    """Targeted deletion sweep with an audit trail: a tombstone list of
    content fingerprints (here: docs with doc_id % 17 == 3 stand in for
    takedown requests) is applied content-addressed — md5 over the text,
    so EXACT DUPLICATES of requested content are deleted wherever they
    live, not just the requested row ids. Output is the per-source audit
    a compliance pipeline must produce: docs before, deleted, kept, and
    bytes removed. The surviving corpus itself is the same LEFT JOIN
    filtered to t.fp IS NULL (an anti-join).

    Scale posture: the tombstone list is deletion-request-sized (small
    by construction) and broadcasts; the corpus stream is fingerprinted
    row-locally and never shuffles except the final per-source
    aggregation — asserted in tests/test_scale_plans.py."""
    d = load(spark, sf_dir, "documents")["documents"]
    tomb = (
        d.where(F.col("doc_id") % 17 == 3)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    corpus = d.select(
        "source", F.md5("text").alias("fp"), F.length("text").alias("nb")
    )
    return (
        corpus.join(
            F.broadcast(tomb.withColumnRenamed("fp", "t_fp")),
            F.col("fp") == F.col("t_fp"),
            "left",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_before"),
            F.sum(F.when(F.col("t_fp").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_deleted"),
            F.sum(F.when(F.col("t_fp").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("t_fp").isNotNull(), F.col("nb")).otherwise(0))
            .cast("bigint")
            .alias("bytes_deleted"),
        )
    )


# ---------------------------------------------------------------------------
# Round 10 — filter-ensemble calibration: before wiring quality filters in
# series, a curation team needs the agreement matrix — which documents the
# model filter, the Gopher rule battery, and the bigram-LM filter each keep,
# and how often they disagree (every disagreement cell is review material
# and a threshold-tuning signal). Composes the three REGISTERED filters
# (both their Spark builders and their DuckDB oracle texts), so the report
# is exactly the production filters, not re-derivations that could drift.
# ---------------------------------------------------------------------------

# fixed LM keep threshold: avg quantized conditional bigram probability
# (lm_score_q9 / n_bigrams) at least 0.0345 — the corpus median at sf0.01,
# pinned as a constant so the decision is data-independent and portable
_LM_KEEP_Q9 = 34_500_000


def _ensemble_oracle() -> str:
    from ..registry import _REGISTRY

    oracle_of = {s.name: s.oracle for s in _REGISTRY}
    m, g, l = (oracle_of[n] for n in
               ("quality_model_filter", "quality_gopher_rules",
                "lm_bigram_score"))
    return f"""
    WITH m AS ({m}),
    g AS ({g}),
    l AS ({l})
    SELECT m.keep AS model_keep,
           g.keep = 1 AS gopher_keep,
           COALESCE(CAST(l.lm_score_q9 AS DOUBLE) / l.n_bigrams
                    >= {_LM_KEEP_Q9}, FALSE) AS lm_keep,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM m JOIN g ON m.doc_id = g.doc_id
           LEFT JOIN l ON m.doc_id = l.doc_id
    GROUP BY 1, 2, 3
    """


@register(
    "quality_ensemble_agreement",
    None,  # oracle bound below, after the three component oracles resolve
    "curation",
    "llm-pipeline",
)
def quality_ensemble_agreement(spark, sf_dir):
    """Agreement matrix of the three registered quality filters (linear
    model, Gopher rules, bigram-LM threshold): one row per
    (model_keep, gopher_keep, lm_keep) combination with document counts.
    The unanimous cells calibrate how much the cascade actually filters;
    the disagreement cells are the review queue. Built by JOINING the
    registered builders themselves — the report can never drift from the
    filters it audits.

    LM docs need >= 2 tokens to have a score; shorter docs join as NULL
    and count as lm_keep = FALSE (a filter that cannot score a doc does
    not keep it).

    Scale posture: three corpus-scale passes (one per filter — exactly
    what the production cascade pays), joined on doc_id and reduced to
    <= 8 rows; the join shuffles scored doc_ids, never text."""
    from .text import lm_bigram_score, quality_gopher_rules, quality_model_filter

    m = quality_model_filter(spark, sf_dir).select("doc_id", "keep")
    g = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", (F.col("keep") == 1).alias("gopher_keep")
    )
    lm = lm_bigram_score(spark, sf_dir).select(
        "doc_id",
        (
            (F.col("lm_score_q9").cast("double") / F.col("n_bigrams"))
            >= _LM_KEEP_Q9
        ).alias("lm_keep_raw"),
    )
    return (
        m.withColumnRenamed("keep", "model_keep")
        .join(g, "doc_id")
        .join(lm, "doc_id", "left")
        .groupBy(
            "model_keep",
            "gopher_keep",
            F.coalesce(F.col("lm_keep_raw"), F.lit(False)).alias("lm_keep"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


# bind the composed oracle now that text.py's registrations are visible
def _bind_ensemble_oracle():
    from ..registry import _REGISTRY, QuerySpec

    for i, s in enumerate(_REGISTRY):
        if s.name == "quality_ensemble_agreement" and s.oracle is None:
            _REGISTRY[i] = QuerySpec(
                s.name, s.builder, _ensemble_oracle(), s.tags
            )


_bind_ensemble_oracle()


# ---------------------------------------------------------------------------
# Round 10 — corpus drift detection: the monitoring check a continuously-
# ingesting pipeline runs between snapshot t and t+1 (did the crawl mix
# shift?). Pearson chi-square contributions over hashed-unigram feature
# buckets; the statistic is computed with per-bucket quantization so the
# report is bit-exact cross-engine (doc_id parity halves stand in for the
# two snapshots on the fixed testdata).
# ---------------------------------------------------------------------------

_DRIFT_B = 256


@register(
    "corpus_drift_chi2",
    f"""
    WITH occ AS (
        SELECT doc_id % 2 = 1 AS is_new,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % {_DRIFT_B} AS b
        FROM (SELECT doc_id, unnest({{wtoks}}) AS tok FROM documents)),
    cnt AS (
        SELECT b,
               CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS c_old,
               CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS c_new
        FROM occ GROUP BY b),
    tot AS (
        SELECT CAST(SUM(c_old) AS BIGINT) AS n_old,
               CAST(SUM(c_new) AS BIGINT) AS n_new
        FROM cnt)
    SELECT b, c_old, c_new,
           CAST(FLOOR(1e6 * (
               ((c_old - (CAST(c_old + c_new AS DOUBLE) * n_old) / (n_old + n_new))
                * (c_old - (CAST(c_old + c_new AS DOUBLE) * n_old) / (n_old + n_new)))
               / ((CAST(c_old + c_new AS DOUBLE) * n_old) / (n_old + n_new))
             + ((c_new - (CAST(c_old + c_new AS DOUBLE) * n_new) / (n_old + n_new))
                * (c_new - (CAST(c_old + c_new AS DOUBLE) * n_new) / (n_old + n_new)))
               / ((CAST(c_old + c_new AS DOUBLE) * n_new) / (n_old + n_new))
           )) AS BIGINT) AS chi2_q6
    FROM cnt CROSS JOIN tot
    """.format(wtoks=_DUCK_WTOKS),
    "curation",
    "llm-pipeline",
)
def corpus_drift_chi2(spark, sf_dir):
    """Corpus drift monitor: Pearson chi-square contribution per hashed-
    unigram bucket between two corpus snapshots (doc_id parity halves
    stand in for ingest day t vs t+1). Large-contribution buckets name
    WHERE the mixture moved; the summed statistic vs the chi-square(255)
    tail is the alert condition. The check a 100 TB continuously-crawled
    corpus runs before a new snapshot is allowed into training.

    Exactness: expected counts and contributions are a fixed +-*/
    sequence on exact BIGINT counts (identical text both dialects), each
    bucket's contribution floor-quantized independently — no cross-
    bucket float accumulation anywhere.

    Scale posture: feature hashing is row-local; one {_DRIFT_B}-key
    aggregation with map-side combine; totals return as a broadcast
    1-row frame; output is {_DRIFT_B} rows."""
    d = load(spark, sf_dir, "documents")["documents"]
    occ = d.select(
        (F.col("doc_id") % 2 == 1).alias("is_new"),
        F.explode(F.expr(_SPARK_WTOKS)).alias("tok"),
    ).select(
        "is_new",
        F.expr(
            f"CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT) % {_DRIFT_B}"
        ).alias("b"),
    )
    cnt = occ.groupBy("b").agg(
        F.sum(F.when(F.col("is_new"), 0).otherwise(1)).cast("bigint").alias("c_old"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("bigint").alias("c_new"),
    )
    tot = cnt.agg(
        F.sum("c_old").cast("bigint").alias("n_old"),
        F.sum("c_new").cast("bigint").alias("n_new"),
    )
    chi = (
        "CAST(FLOOR(1e6 * ("
        "((c_old - (CAST(c_old + c_new AS DOUBLE) * n_old) / (n_old + n_new))"
        " * (c_old - (CAST(c_old + c_new AS DOUBLE) * n_old) / (n_old + n_new)))"
        " / ((CAST(c_old + c_new AS DOUBLE) * n_old) / (n_old + n_new))"
        " + ((c_new - (CAST(c_old + c_new AS DOUBLE) * n_new) / (n_old + n_new))"
        " * (c_new - (CAST(c_old + c_new AS DOUBLE) * n_new) / (n_old + n_new)))"
        " / ((CAST(c_old + c_new AS DOUBLE) * n_new) / (n_old + n_new))"
        ")) AS BIGINT)"
    )
    return cnt.crossJoin(F.broadcast(tot)).select(
        "b", "c_old", "c_new", F.expr(chi).alias("chi2_q6")
    )


# ---------------------------------------------------------------------------
# Round 11 — packing-planner histogram + epoch budgeting
# ---------------------------------------------------------------------------


@register(
    "curation_length_histogram",
    f"""
    WITH lens AS (
        SELECT CAST(length(bin(len({_DUCK_WTOKS}))) - 1 AS INT) AS bucket,
               len({_DUCK_WTOKS}) AS n_toks
        FROM documents WHERE len({_DUCK_WTOKS}) > 0),
    h AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS tok_sum
        FROM lens GROUP BY bucket),
    t AS (SELECT SUM(n_docs) AS total_docs FROM h)
    SELECT bucket, n_docs, tok_sum,
           (CAST(SUM(n_docs) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) / (SELECT total_docs FROM t)) AS cum_doc_share
    FROM h
    """,
    "curation",
)
def curation_length_histogram(spark, sf_dir):
    """Power-of-two token-length histogram with cumulative document share
    — the input every sequence-packing planner needs (choose the context
    length / packing bin sizes from where the cumulative mass sits, and
    spot truncation loss before paying for it).

    bucket = floor(log2(n_toks)), computed WITHOUT libm (log2 differs in
    last bits across engines): both engines take length(bin(n)) - 1, an
    exact integer bit-length. The cumulative share is one running SUM
    over the ~10-row histogram; the only corpus-scale work is the
    tokenize + one partial-aggregated groupBy.

    100 TB posture: zero joins; one shuffle at histogram grain (<= 64
    rows); the window runs over that reduced frame."""
    d = load(spark, sf_dir, "documents")["documents"]
    lens = d.select(F.size(F.expr(_SPARK_WTOKS)).alias("n_toks")).where(
        F.col("n_toks") > 0
    )
    h = lens.select(
        (F.length(F.bin(F.col("n_toks"))) - 1).cast("int").alias("bucket"),
        "n_toks",
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("tok_sum"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    total = h.agg(F.sum("n_docs").cast("bigint").alias("total_docs"))
    return (
        h.crossJoin(F.broadcast(total))
        .withColumn(
            "cum_doc_share",
            F.sum("n_docs").over(w).cast("double") / F.col("total_docs"),
        )
        .select("bucket", "n_docs", "tok_sum", "cum_doc_share")
    )


#: training-token budget as a multiple of the corpus (the "how many
#: epochs can each domain sustain" question), and the repetition cap in
#: hundredths of an epoch (400 = 4 epochs, the standard degradation
#: threshold from repeated-data studies).
_EPOCH_BUDGET_X = 4
_EPOCH_CAP_Q2 = 400


@register(
    "curation_epoch_schedule",
    f"""
    WITH per_src AS (
        SELECT source, CAST(SUM(len({_DUCK_WTOKS})) AS BIGINT) AS tok_total
        FROM documents GROUP BY source
        HAVING CAST(SUM(len({_DUCK_WTOKS})) AS BIGINT) > 0),
    tot AS (SELECT CAST(SUM(tok_total) AS BIGINT) AS grand,
                   CAST(COUNT(*) AS BIGINT) AS n_src FROM per_src)
    SELECT source, tok_total,
           CAST((grand * {_EPOCH_BUDGET_X}) // n_src AS BIGINT) AS target_toks,
           CAST(LEAST((100 * ((grand * {_EPOCH_BUDGET_X}) // n_src)) // tok_total,
                      {_EPOCH_CAP_Q2}) AS BIGINT) AS epochs_q2,
           CAST((tok_total * LEAST((100 * ((grand * {_EPOCH_BUDGET_X}) // n_src)) // tok_total,
                                   {_EPOCH_CAP_Q2})) // 100 AS BIGINT) AS sampled_toks
    FROM per_src, tot
    """,
    "curation",
)
def curation_epoch_schedule(spark, sf_dir):
    """Per-domain epoch budgeting: given a training-token budget of
    {_EPOCH_BUDGET_X}x the corpus and a uniform per-domain target, how
    many epochs (hundredths) can each domain contribute before hitting
    the {_EPOCH_CAP_Q2 / 100}x repetition cap, and how many tokens does
    that actually yield — the data-budget arithmetic behind mixture
    schedules (small domains exhaust early and cap; large domains are
    subsampled below 1 epoch).

    Exactness: every step is integer (BIGINT) arithmetic — budget and
    targets via integer division, epochs in hundredths, LEAST against
    the integer cap — so both engines agree bit-for-bit with no float
    anywhere.

    100 TB posture: one partial-aggregated groupBy at domain grain; the
    1-row totals frame comes back as a broadcast (same shape as
    domain_mix_temperature)."""
    d = load(spark, sf_dir, "documents")["documents"]
    # tok_total > 0 guard: a source whose docs all tokenize empty would
    # make the epochs_q2 DIV throw under ANSI Spark while DuckDB's //
    # yields NULL — drop degenerate sources identically in both dialects
    per_src = (
        d.groupBy("source")
        .agg(F.sum(F.size(F.expr(_SPARK_WTOKS))).cast("bigint").alias("tok_total"))
        .where(F.col("tok_total") > 0)
    )
    tot = per_src.agg(
        F.sum("tok_total").cast("bigint").alias("grand"),
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
    )
    j = per_src.crossJoin(F.broadcast(tot))
    target = F.expr(f"CAST((grand * {_EPOCH_BUDGET_X}) DIV n_src AS BIGINT)")
    epochs = F.expr(
        f"CAST(LEAST((100 * ((grand * {_EPOCH_BUDGET_X}) DIV n_src)) DIV tok_total,"
        f" {_EPOCH_CAP_Q2}) AS BIGINT)"
    )
    return j.select(
        "source",
        "tok_total",
        target.alias("target_toks"),
        epochs.alias("epochs_q2"),
        # integer DIV, never float division — exactness convention
        F.expr(
            f"CAST((tok_total * CAST(LEAST((100 * ((grand * {_EPOCH_BUDGET_X})"
            f" DIV n_src)) DIV tok_total, {_EPOCH_CAP_Q2}) AS BIGINT))"
            f" DIV 100 AS BIGINT)"
        ).alias("sampled_toks"),
    )


# ---------------------------------------------------------------------------
# Round 13 — deterministic epoch shuffling / sharding
# ---------------------------------------------------------------------------

_SHARD_EPOCHS = 2
_SHARD_BUCKETS = 8

# 48-bit md5 prefix: positive in int64, collision odds ~ N^2 / 2^49 —
# and the (key, doc_id) composite sort key stays total even if two
# documents ever collided.
_SHUF_KEY_SPARK = (
    "cast(conv(substr(md5(concat(cast(epoch as string), ':', "
    "cast(doc_id as string))), 1, 12), 16, 10) as bigint)"
)
_SHUF_KEY_DUCK = (
    "('0x' || substr(md5(CAST(epoch AS VARCHAR) || ':' || "
    "CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT"
)

_SHARD_SQL = f"""
    WITH e AS (
        SELECT d.doc_id, t.epoch
        FROM documents d CROSS JOIN (VALUES {
            ', '.join(f'({i})' for i in range(_SHARD_EPOCHS))}) t(epoch)),
    k AS (
        SELECT doc_id, epoch, {_SHUF_KEY_DUCK} AS shuf_key
        FROM e)
    SELECT CAST(epoch AS INT) AS epoch, doc_id,
           CAST(shuf_key % {_SHARD_BUCKETS} AS INT) AS bucket,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY epoch, shuf_key % {_SHARD_BUCKETS}
               ORDER BY shuf_key, doc_id) AS BIGINT) AS pos
    FROM k
"""


@register(
    "shard_shuffle_epochs",
    _SHARD_SQL,
    "curation",
)
def shard_shuffle_epochs(spark, sf_dir):
    """Deterministic per-epoch corpus shuffling + sharding — the global
    shuffle every LM training run needs (and needs REPRODUCIBLY: a rerun
    of epoch e must place every document in the same shard at the same
    position, which rand()-based shuffles can't give). Each (epoch,
    doc) gets an md5-derived 48-bit sort key; the key's residue picks
    one of {_SHARD_BUCKETS} shards and the key order within the shard is
    the read order. Epochs get independent permutations from the same
    corpus scan (the epoch literal is salted into the hash), so
    multi-epoch training never replays one epoch's document order.

    100 TB posture: this is sort-based shuffle done the Spark-first way
    — no rand() (non-reproducible across retries: a recomputed task
    would re-draw and corrupt exactly-once sharding), no global sort:
    the rank window is PARTITIONED by (epoch, shard), so Spark plans
    one hash exchange at shard grain and sorts only within shards —
    at cluster scale that is ``write.partitionBy(epoch, bucket)`` +
    ``sortWithinPartitions(shuf_key)`` on the same keys. The epoch
    fan-out is a row-local explode of a {_SHARD_EPOCHS}-literal array,
    never a join."""
    d = load(spark, sf_dir, "documents")["documents"].select("doc_id")
    e = d.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(i) for i in range(_SHARD_EPOCHS)])
        ).alias("epoch"),
    )
    k = e.select(
        "doc_id", "epoch", F.expr(_SHUF_KEY_SPARK).alias("shuf_key")
    ).withColumn(
        "bucket", (F.col("shuf_key") % _SHARD_BUCKETS).cast("int")
    )
    w = Window.partitionBy("epoch", "bucket").orderBy("shuf_key", "doc_id")
    return k.select(
        F.col("epoch").cast("int").alias("epoch"),
        "doc_id",
        "bucket",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


# ---------------------------------------------------------------------------
# Round 13 — Pareto-frontier (skyline) corpus selection
# ---------------------------------------------------------------------------

_SKY_SHARDS = 32

_SKY_METRICS_DUCK = r"""
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                    t -> t != '')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(
                        list_filter(string_split_regex(lower(text), '\s+'),
                                    t -> t != ''))) AS BIGINT) AS n_vocab
        FROM documents WHERE length(text) > 0"""

_SKY_SQL = f"""
    WITH m AS ({_SKY_METRICS_DUCK}),
    s AS (
        SELECT doc_id, n_tokens, n_vocab,
               MAX(n_vocab) OVER (
                   ORDER BY n_tokens ASC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vprev,
               MAX(n_vocab) OVER (PARTITION BY n_tokens) AS vsame
        FROM m)
    SELECT doc_id, n_tokens, n_vocab
    FROM s WHERE (vprev IS NULL OR n_vocab > vprev) AND n_vocab = vsame
"""


@register(
    "curation_skyline_frontier",
    _SKY_SQL,
    "curation",
)
def curation_skyline_frontier(spark, sf_dir):
    """Pareto-frontier (SKYLINE) corpus selection: the documents not
    DOMINATED on (maximize distinct-vocabulary coverage, minimize token
    cost) — a doc is dropped iff some other doc is no longer AND covers
    no less vocabulary, strictly better in one (Borzsony/Kossmann/
    Stocker 2001's skyline operator; in curation terms: the
    vocabulary-coverage-per-token frontier a budgeted greedy selection
    sweeps along, the relational core of coverage-driven corpus
    selection). Both metrics are exact integers (whitespace token
    count; distinct lowercased tokens), naturally anti-correlated —
    the frontier stays 15-25 docs at every SF, unlike quality-vs-length
    which degenerates to the single short all-alpha doc.

    The 2-D skyline IS a window sweep: a row survives iff no strictly
    cheaper row covers at least as much (value-based RANGE frame ending
    1 PRECEDING, so the current cost's peer group is excluded) and no
    same-cost peer covers strictly more — one pass, no O(n^2) dominance
    self-join, and exact duplicate points all stay on the frontier (the
    set-semantics skyline).

    100 TB posture: a global-order window is a single-partition sort, so
    the Spark side runs the textbook DISTRIBUTED skyline: phase 1
    computes the same sweep WITHIN each of {_SKY_SHARDS} hash shards
    (window partitioned by shard — fully parallel, no global exchange);
    locally-dominated rows are globally dominated (dominance doesn't
    care which shard the dominator lives in), so phase 1 is
    correctness-preserving and cuts the stream to the union of local
    frontiers — O(shards x frontier) rows, typically ~sqrt-ish of the
    input — before phase 2's tiny single-partition sweep. The oracle
    runs the equivalent single-pass form."""
    d = load(spark, sf_dir, "documents")["documents"].where(
        F.length("text") > 0
    )
    m = d.select(
        "doc_id",
        F.expr(
            r"CAST(size(filter(split(lower(text), '\\s+'), t -> t != ''))"
            r" AS BIGINT)"
        ).alias("n_tokens"),
        F.expr(
            r"CAST(size(array_distinct(filter(split(lower(text), '\\s+'),"
            r" t -> t != ''))) AS BIGINT)"
        ).alias("n_vocab"),
    ).withColumn("shard", (F.col("doc_id") % _SKY_SHARDS).cast("int"))

    def sweep(df, part_cols):
        # a row is dominated iff a STRICTLY cheaper row covers >= vocab
        # (value-based RANGE frame: the current cost's peer group is
        # excluded), or a same-cost peer covers strictly more. Exact
        # duplicate points are ALL kept — neither dominates the other
        # (the doc-229 witness in the property test).
        wprev = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("n_tokens").asc())
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        wsame = Window.partitionBy(*(part_cols + ["n_tokens"]))
        return (
            df.withColumn("vprev", F.max("n_vocab").over(wprev))
            .withColumn("vsame", F.max("n_vocab").over(wsame))
            .where(
                (F.col("vprev").isNull() | (F.col("n_vocab") > F.col("vprev")))
                & (F.col("n_vocab") == F.col("vsame"))
            )
            .drop("vprev", "vsame")
        )

    local = sweep(m, ["shard"])  # parallel local frontiers
    out = sweep(local, []).select("doc_id", "n_tokens", "n_vocab")
    return out


# ---------------------------------------------------------------------------
# Round 13 — reciprocal-rank-fusion quality combining
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_SCALE = 1_000_000_000_000  # FLOOR(1e12 / (k + rank)): exact BIGINT terms

_RRF_SQL = rf"""
    WITH m AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                    t -> t != '')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(
                        list_filter(string_split_regex(lower(text), '\s+'),
                                    t -> t != ''))) AS BIGINT) AS n_vocab,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    AS BIGINT) AS n_alpha
        FROM documents WHERE length(text) > 0),
    r AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS r_tokens,
               ROW_NUMBER() OVER (ORDER BY n_vocab DESC, doc_id) AS r_vocab,
               ROW_NUMBER() OVER (ORDER BY n_alpha DESC, doc_id) AS r_alpha
        FROM m)
    SELECT doc_id,
           CAST(r_tokens AS BIGINT) AS r_tokens,
           CAST(r_vocab AS BIGINT) AS r_vocab,
           CAST(r_alpha AS BIGINT) AS r_alpha,
           CAST({_RRF_SCALE} // ({_RRF_K} + r_tokens)
                + {_RRF_SCALE} // ({_RRF_K} + r_vocab)
                + {_RRF_SCALE} // ({_RRF_K} + r_alpha) AS BIGINT) AS rrf_fp
    FROM r
"""


def _dist_rank(df, metric: str, out: str):
    """Distributed global row_number over (metric DESC, doc_id ASC) —
    WITHOUT a full-data single-partition sort window. Two-phase TeraSort
    ranking: (1) aggregate to value grain and cumulate counts of
    STRICTLY greater values (the only unpartitioned window runs over
    #distinct-values rows, not data rows); (2) broadcast the offsets
    back and rank within each value group by the unique tie-break key
    (a PARTITIONED window — fully parallel). rank = n_gt + within."""
    from pyspark.sql.functions import broadcast

    cnt = df.groupBy(metric).agg(F.count(F.lit(1)).alias("_c"))
    wcum = (
        Window.orderBy(F.col(metric).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cnt.select(
        metric,
        F.coalesce(F.sum("_c").over(wcum), F.lit(0)).alias("_gt"),
    )
    win = Window.partitionBy(metric).orderBy(F.col("doc_id").asc())
    return (
        df.join(broadcast(offs), metric)
        .withColumn(out, (F.col("_gt") + F.row_number().over(win)).cast("bigint"))
        .drop("_gt")
    )


@register(
    "quality_rrf_fusion",
    _RRF_SQL,
    "quality",
    "curation",
)
def quality_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of three
    quality signals — length, distinct-vocabulary coverage, alphabetic
    mass: score = sum_i floor(1e12 / ({_RRF_K} + rank_i)). RRF is the
    standard way to combine heterogeneous rankers without calibrating
    their score scales (here: three exact-integer corpus signals; in
    production: BM25 x embedding x quality-model). The reciprocal terms
    are integer-scaled and floored, so the fused score is an exact
    BIGINT sum — order-independent, no float anywhere.

    100 TB posture: a naive global ROW_NUMBER is a single-partition
    sort of the full corpus — PER SIGNAL. Instead each rank is computed
    with the two-phase TeraSort scheme (`_dist_rank`): a value-grain
    aggregate cumulates strictly-greater counts (the only unpartitioned
    window touches #distinct-values rows), the offsets broadcast back,
    and the within-value tie-break window is PARTITIONED by value —
    so no full-data single-partition exchange exists in the plan
    (plan-gated). The oracle spells the equivalent plain ROW_NUMBER
    form."""
    d = load(spark, sf_dir, "documents")["documents"].where(
        F.length("text") > 0
    )
    m = d.select(
        "doc_id",
        F.expr(
            r"CAST(size(filter(split(lower(text), '\\s+'), t -> t != ''))"
            r" AS BIGINT)"
        ).alias("n_tokens"),
        F.expr(
            r"CAST(size(array_distinct(filter(split(lower(text), '\\s+'),"
            r" t -> t != ''))) AS BIGINT)"
        ).alias("n_vocab"),
        F.expr(
            "CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS BIGINT)"
        ).alias("n_alpha"),
    )
    r = _dist_rank(m, "n_tokens", "r_tokens")
    r = _dist_rank(r, "n_vocab", "r_vocab")
    r = _dist_rank(r, "n_alpha", "r_alpha")
    term = lambda c: F.expr(f"CAST({_RRF_SCALE} DIV ({_RRF_K} + {c}) AS BIGINT)")  # noqa: E731
    return r.select(
        "doc_id",
        "r_tokens",
        "r_vocab",
        "r_alpha",
        (term("r_tokens") + term("r_vocab") + term("r_alpha"))
        .cast("bigint")
        .alias("rrf_fp"),
    )


# ---------------------------------------------------------------------------
# Round 13 — calibration audit of the model quality filter
# ---------------------------------------------------------------------------


def _calibration_oracle() -> str:
    from ..registry import _REGISTRY

    oracle_of = {s.name: s.oracle for s in _REGISTRY}
    m, g = oracle_of["quality_model_filter"], oracle_of["quality_gopher_rules"]
    return f"""
    WITH m AS ({m}),
    g AS ({g}),
    q AS (
        SELECT m.doc_id,
               CAST(FLOOR(m.model_score * 1000) AS BIGINT) AS s_mille,
               g.keep = 1 AS label
        FROM m JOIN g ON m.doc_id = g.doc_id),
    n AS (SELECT COUNT(*) AS n FROM q),
    r AS (
        SELECT s_mille, label,
               ROW_NUMBER() OVER (ORDER BY s_mille DESC, doc_id) AS rn
        FROM q)
    SELECT CAST(((rn - 1) * 10) // (SELECT n FROM n) AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_label_keep,
           CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS label_rate,
           CAST(SUM(s_mille) AS BIGINT) AS sum_s_mille
    FROM r GROUP BY 1
    """


@register(
    "quality_calibration_bins",
    None,  # oracle bound below (composes two registered filter oracles)
    "quality",
    "curation",
)
def quality_calibration_bins(spark, sf_dir):
    """Calibration audit of the linear model quality filter against the
    Gopher rule battery as proxy labels: score-rank DECILES x empirical
    rule-pass rate — the reliability-diagram table every learned filter
    needs before its threshold is trusted (a well-calibrated scorer's
    pass rate should fall monotonically across deciles; a flat column
    means the model adds nothing over the rules). Composes the two
    REGISTERED filters (builders AND oracle texts), so the audit can
    never drift from the filters it audits — the
    quality_ensemble_agreement convention.

    Exactness: scores enter as FLOOR(score*1000) BIGINT (deterministic
    on the identical IEEE double), labels are exact booleans, the rate
    is one final division; deciles come from exact integer ranks.

    100 TB posture: the global score rank uses the same two-phase
    TeraSort scheme as quality_rrf_fusion (`_dist_rank` — value-grain
    offsets broadcast back, value-partitioned tie-break windows), so no
    full-data single-partition sort; the corpus size scalar is one
    driver-side count (bounded-scalar convention); output is exactly 10
    rows."""
    from .text import quality_gopher_rules, quality_model_filter

    m = quality_model_filter(spark, sf_dir).select("doc_id", "model_score")
    g = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", (F.col("keep") == 1).alias("label")
    )
    q = m.join(g, "doc_id").select(
        "doc_id",
        F.expr("CAST(FLOOR(model_score * 1000) AS BIGINT)").alias("s_mille"),
        "label",
    )
    n = q.count()
    r = _dist_rank(q, "s_mille", "rn")
    return (
        r.withColumn(
            "decile", F.expr(f"CAST(((rn - 1) * 10) DIV {n} AS INT)")
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("label"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_label_keep"),
            (
                F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("label_rate"),
            F.sum("s_mille").cast("bigint").alias("sum_s_mille"),
        )
    )


def _bind_calibration_oracle():
    from ..registry import _REGISTRY, QuerySpec

    for i, s in enumerate(_REGISTRY):
        if s.name == "quality_calibration_bins" and s.oracle is None:
            _REGISTRY[i] = QuerySpec(
                s.name, s.builder, _calibration_oracle(), s.tags
            )


_bind_calibration_oracle()


# ---------------------------------------------------------------------------
# Round 14 — temperature-scaled corpus mixture weights
# ---------------------------------------------------------------------------

_MIX_Q = 1 << 20  # sqrt quantization: FLOOR(sqrt(n) * 2^20) — exact BIGINT
_MIX_BUDGET = 1_000_000_000  # reference token budget for the epochs column


@register(
    "corpus_mixture_temperature",
    rf"""
    WITH per_src AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({_DUCK_WTOKS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
    q AS (
        SELECT source, n_docs, n_tokens,
               CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * {_MIX_Q})
                    AS BIGINT) AS q_sqrt
        FROM per_src)
    SELECT source, n_docs, n_tokens, q_sqrt,
           CAST(q_sqrt AS DOUBLE)
               / CAST(SUM(q_sqrt) OVER () AS DOUBLE) AS weight,
           ({_MIX_BUDGET} * (CAST(q_sqrt AS DOUBLE)
               / CAST(SUM(q_sqrt) OVER () AS DOUBLE)))
               / CAST(n_tokens AS DOUBLE) AS epochs_1b
    FROM q
    """,
    "curation",
)
def corpus_mixture_temperature(spark, sf_dir):
    """Temperature-scaled multi-source mixture weights — the standard
    pretraining data-mixing recipe (w_s ∝ n_s^α with α < 1 upweights
    small high-value sources; the multilingual-sampling form from the
    XLM-R / mT5 lineage). α is fixed at 0.5 because sqrt is the one
    fractional power that is CROSS-ENGINE EXACT: IEEE-754 requires
    correctly-rounded sqrt (Java's Math.sqrt and DuckDB's libm agree
    bit-for-bit on every input), while a general pow(n, 0.7) is only
    faithfully rounded and may differ in the last ulp between libms.

    Exactness scheme: per-source token counts are exact BIGINTs (the
    repo's canonical ASCII-whitespace tokenizer); the scaled score is
    FLOOR(sqrt(n) * 2^20) — floor of an identical IEEE double, so an
    exact BIGINT both engines agree on; the normalizer is a BIGINT sum
    (order-free); `weight` and `epochs_1b` are the same two/three-op
    IEEE expression tree on exact integer inputs in both dialects.

    100 TB posture: one map-side-combinable groupBy(source) over a
    row-local token count — the output is source-cardinality rows (tens
    to thousands), and the OVER () normalizer runs on that tiny frame
    only (the value-grain SinglePartition convention). The `epochs_1b`
    column is the operational knob: how many passes over each source a
    fixed token budget implies under the mixture.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.expr(_SPARK_WTOKS))).cast("bigint").alias("n_tokens"),
    )
    q = per_src.withColumn(
        "q_sqrt",
        F.expr(
            f"CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * {_MIX_Q})"
            " AS BIGINT)"
        ),
    )
    w = Window.partitionBy()
    weight = F.col("q_sqrt").cast("double") / F.sum("q_sqrt").over(w).cast(
        "double"
    )
    return q.select(
        "source",
        "n_docs",
        "n_tokens",
        "q_sqrt",
        weight.alias("weight"),
        ((F.lit(_MIX_BUDGET) * weight) / F.col("n_tokens").cast("double")).alias(
            "epochs_1b"
        ),
    )
