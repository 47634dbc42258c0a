"""Remaining consumed-surface coverage (SURVEY.md §2.D): caching,
Range/VALUES scans, NATURAL OUTER join, session windows, and approximate
sketches (rows-only checked — approximate results differ by engine design).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..caching import scope_caches
from ..functions.exprs import SQL_DSUM, dsum
from ..registry import register
from ..sources import load, register_views


@register(
    "cache_table_join",
    """
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    "caching",
)
def cache_table_join(spark, sf_dir):
    """df.cache() on the dimension side (reference corpus: basics.sql CACHE
    TABLE; colors the node lightblue in lineage and produces an
    InMemoryRelation scan in the plan)."""
    t = load(spark, sf_dir, "customer", "nation")
    dim = t["nation"].cache()
    return scope_caches(
        t["customer"]
        .join(dim, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers")),
        dim,
    )


@register(
    "range_scan",
    """
    SELECT CAST(range AS BIGINT) AS id, CAST(range * 3 % 7 AS BIGINT) AS bucket
    FROM range(1000)
    """,
    "scan",
)
def range_scan(spark, sf_dir):
    """spark.range → Catalyst Range leaf (LeafPlanNode in lineage)."""
    return spark.range(1000).select(
        F.col("id"), (F.col("id") * 3 % 7).alias("bucket")
    )


@register(
    "values_inline",
    """
    SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(k, v)
    """,
    "scan",
)
def values_inline(spark, sf_dir):
    """Inline rows → LocalRelation leaf (reference corpus basics.sql:2-3)."""
    return spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")


@register(
    "join_natural_left",
    """
    SELECT regionkey, n_name, r_name
    FROM (SELECT n_nationkey, n_name, n_regionkey AS regionkey FROM nation) a
    NATURAL LEFT JOIN (SELECT r_regionkey AS regionkey, r_name FROM region WHERE r_regionkey < 3) b
    """,
    "join",
)
def join_natural_left(spark, sf_dir):
    register_views(spark, sf_dir, "nation", "region")
    return spark.sql(
        """
        SELECT regionkey, n_name, r_name
        FROM (SELECT n_nationkey, n_name, n_regionkey AS regionkey FROM nation) a
        NATURAL LEFT JOIN (SELECT r_regionkey AS regionkey, r_name FROM region WHERE r_regionkey < 3) b
        """
    )


@register(
    "session_window_agg",
    f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events) ev),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events, {SQL_DSUM.format(x='value')} AS sum_value
    FROM numbered GROUP BY user_id, sid
    """,
    "timeseries",
    "window",
)
def session_window_agg(spark, sf_dir):
    """Spark's native session_window (gap-based session aggregation in one
    operator); the oracle is the equivalent gaps-and-islands SQL — session
    end is last event + gap by definition."""
    ev = load(spark, sf_dir, "events")["events"]
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "approx_count_distinct_sketch",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
           TRUE AS parts_within_tol,
           TRUE AS supps_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    "sketch",
)
def approx_count_distinct_sketch(spark, sf_dir):
    """HLL-sketch distinct counts (reference corpus group-by.sql
    approx_count_distinct), as a derived-check query: the HLL estimate
    itself is engine-specific (DuckDB's HLL differs), so the query emits
    the EXACT distinct counts (DuckDB-checkable) plus Spark-computed
    within-tolerance booleans comparing the sketch against them. The
    oracle asserts the flags are TRUE — Spark's HLL is deterministic for
    fixed data (register maxima are merge-order-independent), so a sketch
    drifting outside its accuracy contract flips the flag and fails the
    hash. Tolerance = 3x the requested rsd (default 0.05 / 0.01)."""
    # NOTE (r16-opt): a gated spread() repartition was measured here and
    # REVERTED — the added exchange of the full lineitem (0.28 -> 0.53 s
    # interleaved) costs more than parallelizing the cheap sketch
    # partials buys on this input.
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("ap"),
            F.approx_count_distinct("l_suppkey", rsd=0.01).alias("asu"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.countDistinct("l_suppkey").alias("exact_supps"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "exact_supps",
            (
                F.abs(F.col("ap") - F.col("exact_parts"))
                <= 3 * 0.05 * F.col("exact_parts")
            ).alias("parts_within_tol"),
            (
                F.abs(F.col("asu") - F.col("exact_supps"))
                <= 3 * 0.01 * F.col("exact_supps")
            ).alias("supps_within_tol"),
        )
    )


@register(
    "approx_percentile_sketch",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    "sketch",
)
def approx_percentile_sketch(spark, sf_dir):
    """Approximate percentiles as a derived-check query.

    The QuantileSummaries estimate is engine-specific, but its accuracy
    CONTRACT is checkable: a value returned for quantile q at relative
    error eps (=1/accuracy) must have rank within (q±eps)·n. The query
    computes the three quartiles from ONE shared sketch per group, then
    recounts ranks of the returned values in a second pass (broadcast of
    the per-group quartiles — the heavy-hitters recount pattern) and emits
    per-quartile rank-contract booleans plus the exact group size. The
    oracle checks n_rows exactly and asserts the flags TRUE; the sketch is
    deterministic for fixed data, so a contract violation fails the hash.
    """
    eps = 1.0 / 10000
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    quartiles = (
        li.groupBy("l_returnflag")
        .agg(F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000).alias("q"))
        .select(
            "l_returnflag",
            F.element_at("q", 1).alias("p25"),
            F.element_at("q", 2).alias("p50"),
            F.element_at("q", 3).alias("p75"),
        )
    )
    j = li.join(F.broadcast(quartiles), "l_returnflag")

    def rank_ok(p_col: str, q: float):
        below = F.sum((F.col("l_extendedprice") < F.col(p_col)).cast("long"))
        at_or_below = F.sum((F.col("l_extendedprice") <= F.col(p_col)).cast("long"))
        n = F.count(F.lit(1))
        # returned value's rank must sit inside [(q-eps)n - 1, (q+eps)n + 1]
        return (below <= (q + eps) * n + 1) & (at_or_below >= (q - eps) * n - 1)

    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        rank_ok("p25", 0.25).alias("p25_ok"),
        rank_ok("p50", 0.50).alias("p50_ok"),
        rank_ok("p75", 0.75).alias("p75_ok"),
    )


@register(
    "string_funcs_battery",
    """
    SELECT c_custkey,
           levenshtein(c_name, 'Customer#000000001') AS lev_to_first,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
           reverse(c_mktsegment) AS seg_rev,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
           repeat(substr(c_mktsegment, 1, 1), 3) AS seg_initial_x3,
           ascii(c_mktsegment) AS seg_ascii
    FROM customer
    """,
    "functions",
)
def string_funcs_battery(spark, sf_dir):
    """Scalar string-function surface: levenshtein / lpad / reverse /
    translate / repeat / ascii, all JVM builtins inside one codegen stage
    (identical semantics in DuckDB, asserted by the oracle)."""
    c = load(spark, sf_dir, "customer")["customer"]
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000001")).alias("lev_to_first"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_lower_vowels"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("seg_initial_x3"),
        F.ascii("c_mktsegment").alias("seg_ascii"),
    )


@register(
    "date_funcs_battery",
    """
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           last_day(o_orderdate) AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_spark,
           CAST(weekofyear(o_orderdate) AS INT) AS week_of_year,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS INT) AS days_since_epoch_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
    FROM orders
    """,
    "functions",
)
def date_funcs_battery(spark, sf_dir):
    """Scalar date-function surface: quarter / last_day / dayofweek /
    weekofyear / datediff / date_add. DuckDB numbers dayofweek from Sunday=0
    while Spark uses Sunday=1, hence the +1 shim in the oracle — the one
    cross-engine divergence in this battery."""
    o = load(spark, sf_dir, "orders")["orders"]
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("order_quarter"),
        F.last_day("o_orderdate").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow_spark"),
        F.weekofyear("o_orderdate").alias("week_of_year"),
        F.datediff(
            "o_orderdate", F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


# ---------------------------------------------------------------------------
# Round-4: non-parquet source formats (JSON lines / CSV). The engine writes a
# deterministic projection of the documents table to the format under the
# repo-local spark-warehouse, reads it back through the format's parser with
# an EXPLICIT schema (schema inference costs a full extra pass at scale and
# can mis-type empty partitions), and aggregates. The DuckDB oracle computes
# the same aggregate straight from the parquet view, so the round-trip
# validates parser fidelity (quoting, escaping, unicode, header handling),
# not just the aggregate.
# ---------------------------------------------------------------------------

_ROUNDTRIP_ORACLE = """
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars,
           MIN(md5(text)) AS min_text_md5
    FROM documents
    GROUP BY source
"""


def _session_token(spark) -> str:
    # per-session suffix for scratch dirs under the shared spark-warehouse:
    # two concurrent sessions running the same operator would otherwise race
    # on mode("overwrite") and a reader could observe a half-overwritten
    # dataset. applicationId is stable within a session (so re-runs reuse
    # and overwrite their own dir) and unique across sessions.
    return spark.sparkContext.applicationId


#: scratch dirs from sessions older than this are presumed dead and pruned
#: (sessions here live minutes; 6 h is a generous upper bound)
_SCRATCH_TTL_SEC = 6 * 3600


def scratch_path(spark, base: str) -> str:
    """``spark-warehouse/<base>_<applicationId>`` — anchored to the repo
    (not CWD or the session warehouse conf: the harness may launch from
    any working directory). Same-base dirs left behind by DEAD sessions
    (mtime older than the TTL) are pruned best-effort on the way, so the
    per-session suffixing that kills the concurrent-overwrite race cannot
    accumulate scratch data forever."""
    import glob
    import os
    import shutil
    import time

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    wh = os.path.join(repo, "spark-warehouse")
    token = _session_token(spark)
    now = time.time()
    # include the pre-suffix legacy layout (exactly `base`) so scratch
    # data written by earlier rounds is pruned too, not just `base_<app>`
    for old in glob.glob(os.path.join(wh, base + "_*")) + glob.glob(
        os.path.join(wh, base)
    ):
        if old.endswith(token):
            continue
        try:
            if now - os.path.getmtime(old) > _SCRATCH_TTL_SEC:
                shutil.rmtree(old, ignore_errors=True)
        except OSError:
            pass
    return os.path.join(wh, f"{base}_{token}")


def _roundtrip_dir(spark, sf_dir: str, fmt: str) -> str:
    import os

    return scratch_path(
        spark, f"roundtrip_{fmt}_{os.path.basename(sf_dir.rstrip('/'))}"
    )


def _roundtrip_agg(df):
    return df.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).cast("bigint").alias("sum_chars"),
        F.min(F.md5("text")).alias("min_text_md5"),
    )


# CSV byte-fidelity contract (tests/test_roundtrip_adversarial.py probes it
# with control chars, CR/LF, whitespace-only fields, edge quotes, NFD, and
# 4-byte emoji):
# - the univocity WRITER trims whitespace by default — ignore*WhiteSpace
#   must be false on BOTH sides or '  x  ' silently becomes 'x';
# - multiLine=true on read, or embedded newlines abort the FAILFAST parse;
# - nulls need a sentinel (classic \\N) to stay distinguishable from empty
#   strings — both map to an empty field otherwise. A field whose VALUE is
#   the literal sentinel would read back as null; acceptable for corpus
#   text, documented here;
# - NUL (U+0000) is EXCLUDED from the contract inside quoted fields: the
#   univocity parser uses '\0' as its internal "no character" sentinel
#   (e.g. CsvFormat quote='\0' means "unset"), so a literal NUL inside a
#   quoted field is silently dropped on read no matter the option set
#   (verified against multiLine true/false and every
#   unescapedQuoteHandling mode; the bytes on disk are correct — the loss
#   is read-side). Unquoted NULs round-trip fine. Corpus text containing
#   NUL that also needs quoting (embedded quotes/delimiters/newlines)
#   must go through a binary-safe format (parquet/ORC/JSON) instead.
_CSV_NULL = "\\N"


def csv_write_fidelity(writer):
    """Apply the byte-preserving option set to a CSV DataFrameWriter."""
    return (
        writer.option("header", True)
        .option("escape", '"')
        .option("nullValue", _CSV_NULL)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
    )


def csv_read_fidelity(reader):
    """Apply the matching byte-preserving option set to a CSV reader."""
    return (
        reader.option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("nullValue", _CSV_NULL)
        .option("emptyValue", "")
        .option("mode", "FAILFAST")
    )


@register("source_json_roundtrip", _ROUNDTRIP_ORACLE, "scan", "source-format")
def source_json_roundtrip(spark, sf_dir):
    """JSON-lines source: write documents as gzipped JSONL, read back with an
    explicit schema (never inferred), aggregate per source. Exercises the
    JSON parser on real unicode corpus text; gzip on the write side checks
    the codec path a crawl-dump ingest would hit. At scale: JSONL is
    splittable per FILE (gzip is not splittable within a file), so the
    writer shuffles to defaultParallelism files first."""
    docs = load(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "source", "n_chars", "text"
    )
    path = _roundtrip_dir(spark, sf_dir, "json")
    n = spark.sparkContext.defaultParallelism
    docs.repartition(n).write.mode("overwrite").option("compression", "gzip").json(path)
    back = spark.read.schema(
        "doc_id bigint, source string, n_chars int, text string"
    ).json(path)
    return _roundtrip_agg(back)


@register("source_orc_roundtrip", _ROUNDTRIP_ORACLE, "scan", "source-format")
def source_orc_roundtrip(spark, sf_dir):
    """ORC source: write documents as zlib ORC and read back — the columnar
    format a Hive-heritage warehouse feeds a pipeline from. ORC is binary
    and schema-full, so unlike the CSV/JSON/XML round-trips there is no
    quoting/escaping fidelity surface; the round-trip proves the
    reader/writer wiring and that corpus bytes (any unicode, embedded
    newlines/controls) survive the ORC string codec."""
    docs = load(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "source", "n_chars", "text"
    )
    path = _roundtrip_dir(spark, sf_dir, "orc")
    n = spark.sparkContext.defaultParallelism
    docs.repartition(n).write.mode("overwrite").option(
        "compression", "zlib"
    ).orc(path)
    back = spark.read.schema(
        "doc_id bigint, source string, n_chars int, text string"
    ).orc(path)
    return _roundtrip_agg(back)


@register("source_csv_roundtrip", _ROUNDTRIP_ORACLE, "scan", "source-format")
def source_csv_roundtrip(spark, sf_dir):
    """CSV source: write documents as headered, quoted CSV and read back with
    an explicit schema + strict (FAILFAST) parsing — corpus text contains
    commas/quotes/newlines-adjacent punctuation, so this round-trip proves
    the quote/escape configuration actually preserves bytes, which silent
    PERMISSIVE mode would paper over with nulls. The full fidelity option
    set (multiLine, no whitespace trimming, null sentinel) lives in
    :func:`csv_write_fidelity`/:func:`csv_read_fidelity` and is probed with
    an adversarial corpus in tests/test_roundtrip_adversarial.py."""
    docs = load(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "source", "n_chars", "text"
    )
    path = _roundtrip_dir(spark, sf_dir, "csv")
    csv_write_fidelity(docs.write.mode("overwrite")).csv(path)
    back = csv_read_fidelity(
        spark.read.schema("doc_id bigint, source string, n_chars int, text string")
    ).csv(path)
    return _roundtrip_agg(back)


# ---------------------------------------------------------------------------
# Round-4: scalar-function surface depth — higher-order array functions and
# null/NaN semantics, each value-checked against a DuckDB twin written in
# that engine's native idiom (list_* / IS DISTINCT FROM) so the test proves
# SEMANTIC agreement, not shared syntax.
# ---------------------------------------------------------------------------

_HOF_TOKS = r"filter(split(lower(text), '\\s+'), t -> t != '')"
_DUCK_HOF_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t != '')"


@register(
    "array_hof_battery",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_HOF_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(toks, t -> length(t) > 4)) AS INT) AS n_long,
           array_to_string(list_transform(toks[1:3], t -> upper(t)), '-') AS upper_first3,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS total_len,
           array_to_string(
               list_transform(list_zip(toks[1:2], toks[2:3]),
                              x -> x[1] || '_' || x[2]), ' ') AS bigrams_first2,
           len(list_filter(toks, t -> t IN ('the', 'a', 'of'))) > 0 AS has_stop,
           len(list_filter(toks, t -> length(t) >= 25)) = 0 AS all_short,
           list_sort(toks)[1] AS min_tok
    FROM t
    """,
    "functions",
)
def array_hof_battery(spark, sf_dir):
    """Higher-order array functions over real corpus tokens: filter,
    transform, aggregate (fold), zip_with, exists, forall, array_sort —
    all JVM-side Catalyst HOFs (zero Python). The DuckDB oracle computes
    the same values through list_filter/list_transform/list_sum/list_zip,
    so agreement is semantic, not syntactic: fold result types, lambda
    scoping, empty-slice behavior, and binary string collation for the
    sort all have to line up."""
    d = load(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id", F.expr(_HOF_TOKS).alias("toks")
    ).select(
        "doc_id",
        F.expr("CAST(size(filter(toks, t -> length(t) > 4)) AS INT)").alias("n_long"),
        F.expr(
            "array_join(transform(slice(toks, 1, 3), t -> upper(t)), '-')"
        ).alias("upper_first3"),
        F.expr(
            "CAST(aggregate(toks, 0L, (acc, t) -> acc + length(t)) AS BIGINT)"
        ).alias("total_len"),
        F.expr(
            "array_join(zip_with(slice(toks, 1, 2), slice(toks, 2, 2),"
            " (a, b) -> concat(a, '_', b)), ' ')"
        ).alias("bigrams_first2"),
        F.expr("exists(toks, t -> t IN ('the', 'a', 'of'))").alias("has_stop"),
        F.expr("forall(toks, t -> length(t) < 25)").alias("all_short"),
        F.expr("array_sort(toks)[0]").alias("min_tok"),
    )


@register(
    "null_safe_battery",
    """
    SELECT k,
           a IS NOT DISTINCT FROM b AS eq_ns,
           coalesce(a, b, -1.0) AS coal,
           nullif(a, b) AS nn,
           CASE WHEN isnan(a) THEN b ELSE a END AS nanfix,
           CAST(a IS NULL AS BOOLEAN) AS a_null
    FROM (VALUES (1, 10.0, 10.0),
                 (2, CAST(NULL AS DOUBLE), 5.0),
                 (3, 'NaN'::DOUBLE, 2.0),
                 (4, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))) AS v(k, a, b)
    """,
    "functions",
)
def null_safe_battery(spark, sf_dir):
    """Null/NaN semantics battery on an inline relation: null-safe equality
    (<=> vs IS NOT DISTINCT FROM), coalesce chains, NULLIF, nanvl (vs the
    CASE-isnan idiom), IS NULL — the exact cross-engine footguns (NaN
    equality, NULL propagation through conditionals) a federated pipeline
    hits."""
    rows = [
        (1, 10.0, 10.0),
        (2, None, 5.0),
        (3, float("nan"), 2.0),
        (4, None, None),
    ]
    v = spark.createDataFrame(rows, "k int, a double, b double")
    return v.select(
        "k",
        F.expr("a <=> b").alias("eq_ns"),
        F.coalesce("a", "b", F.lit(-1.0)).alias("coal"),
        F.expr("nullif(a, b)").alias("nn"),
        F.expr("nanvl(a, b)").alias("nanfix"),
        F.col("a").isNull().alias("a_null"),
    )


@register(
    "partitioned_write_prune",
    f"""
    SELECT event_type, COUNT(*) AS n_events,
           {SQL_DSUM.format(x='value')} AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY event_type
    """,
    "scan",
    "source-format",
)
def partitioned_write_prune(spark, sf_dir):
    """Write-side layout meets read-side pruning: events written as a
    date-partitioned parquet dataset (``sources.layout.write_partitioned``
    — partition-key repartition, bounded files), read back with a date
    filter that must prune to 3 of ~30 directory partitions (asserted in
    test_scale_plans — at 100 TB this is the difference between scanning
    3 days and scanning 8 years). The oracle computes the same aggregate
    from the unpartitioned source, proving the partitioned round-trip
    loses nothing."""
    import os

    from ..sources.layout import write_partitioned

    ev = load(spark, sf_dir, "events")["events"].withColumn(
        "d", F.to_date("ts")
    )
    path = scratch_path(
        spark, f"events_by_day_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    write_partitioned(ev, path, ["d"])
    back = spark.read.parquet(path).where(
        F.col("d").between(F.lit("2024-01-10"), F.lit("2024-01-12"))
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"), dsum("value", "sum_value")
    )


@register(
    "zorder_layout_prune",
    f"""
    SELECT event_type, COUNT(*) AS n_events,
           {SQL_DSUM.format(x='value')} AS sum_value
    FROM (SELECT event_type, value,
                 user_id % 64 AS x,
                 hour(CAST(ts AS TIMESTAMP)) AS y
          FROM events)
    WHERE x BETWEEN 12 AND 27 AND y BETWEEN 9 AND 16
    GROUP BY event_type
    """,
    "scan",
    "source-format",
)
def zorder_layout_prune(spark, sf_dir):
    """Multi-dimensional data skipping via Z-ORDER layout: events laid out
    on a Morton curve over (user bucket, hour-of-day bucket), partitioned
    by the z-value's high bits, then queried with a 2-D box predicate that
    prunes to only the directory partitions whose z-range intersects the
    box — linear partitioning can prune one of the two dimensions, the
    space-filling curve prunes BOTH (the Delta/Iceberg OPTIMIZE ZORDER
    technique in plain Spark SQL bit ops, sources.layout.zvalue_expr).

    The driver enumerates the box's z-buckets (a superset), pushes
    ``zbucket IN (...)`` as a partition filter, and re-applies the exact
    box predicate after the scan — so the result is exactly the oracle's
    unpartitioned filter, while the scan touches a fraction of the
    partitions (asserted in test_scale_plans)."""
    import os

    from ..sources.layout import (
        ZORDER_BITS,
        write_partitioned,
        zorder_buckets_for_box,
        zvalue_expr,
    )

    ev = (
        load(spark, sf_dir, "events")["events"]
        .withColumn("x", F.expr("CAST(pmod(user_id, 64) AS INT)"))
        .withColumn("y", F.expr("CAST(hour(ts) AS INT)"))
        .withColumn("z", F.expr(zvalue_expr("x", "y")))
        .withColumn("zbucket", F.expr(f"z >> {ZORDER_BITS}"))
    )
    path = scratch_path(
        spark, f"events_zorder_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    write_partitioned(
        ev.select("event_type", "value", "x", "y", "zbucket"), path, ["zbucket"]
    )
    buckets = zorder_buckets_for_box(12, 27, 9, 16)
    back = (
        spark.read.parquet(path)
        .where(F.col("zbucket").isin(buckets))  # partition pruning
        .where(F.col("x").between(12, 27) & F.col("y").between(9, 16))
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"), dsum("value", "sum_value")
    )


@register(
    "sql_udf_battery",
    f"""
    SELECT l_returnflag, t.i AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(date_diff('day', DATE '1992-01-01', l_shipdate)) AS BIGINT) AS sum_ship_days
    FROM lineitem CROSS JOIN (VALUES (1), (2)) t(i)
    WHERE l_shipdate <= DATE '1995-03-01'
    GROUP BY l_returnflag, t.i
    """,
    "scalar-func",
    "spark4",
)
def sql_udf_battery(spark, sf_dir):
    """Spark 4 SQL-language UDF surface in one battery: a scalar SQL UDF
    (CREATE TEMPORARY FUNCTION ... RETURN expr), a date-arithmetic scalar
    UDF, a TABLE-valued SQL UDF consumed in the FROM clause, and a session
    VARIABLE (DECLARE / SET VAR) driving the filter predicate.

    SQL UDFs are the catalog-managed alternative to Python UDFs with NONE
    of their cost: the body inlines into the plan at analysis time, so
    everything below stays whole-stage-codegen JVM expressions — the
    oracle simply substitutes the bodies textually. At 100 TB this is the
    difference between a UDF library your analysts share and a serialized
    Python round-trip per row.

    Session hygiene: the temp functions and the session variable are DDL
    on the session catalog, so everything runs in ``spark.newSession()``
    (isolated SQLConf + temp catalog, shared SparkContext) — the caller's
    session never sees disc_price/ship_days_since/row_buckets/ship_cutoff
    (the r3/r4 verdicts' session-mutation discipline)."""
    from ..sources.tables import register_views

    spark = spark.newSession()
    register_views(spark, sf_dir, "lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ship_days_since(d DATE) "
        "RETURNS INT RETURN CAST(datediff(d, DATE'1992-01-01') AS INT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION row_buckets(n INT) "
        "RETURNS TABLE(i INT) RETURN SELECT explode(sequence(1, n))"
    )
    spark.sql(
        "DECLARE OR REPLACE VARIABLE ship_cutoff DATE DEFAULT DATE'1990-01-01'"
    )
    spark.sql("SET VAR ship_cutoff = DATE'1995-03-01'")
    return spark.sql(
        """
        SELECT l_returnflag, t.i AS bucket,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(disc_price(l_extendedprice, l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(ship_days_since(l_shipdate))
                    AS BIGINT) AS sum_ship_days
        FROM lineitem CROSS JOIN row_buckets(2) t
        WHERE l_shipdate <= ship_cutoff
        GROUP BY l_returnflag, t.i
        """
    )


# ---------------------------------------------------------------------------
# Round-4: modern SQL surface both engines share — GROUP BY ALL, lateral
# column aliases, and the dedicated UNPIVOT clause.
# ---------------------------------------------------------------------------


@register(
    "groupby_all_agg",
    """
    SELECT c_mktsegment, c_nationkey % 5 AS nation_band,
           COUNT(*) AS n_cust, MIN(c_custkey) AS min_key
    FROM customer
    GROUP BY ALL
    """,
    "aggregate",
)
def groupby_all_agg(spark, sf_dir):
    """GROUP BY ALL (Spark 3.4+/DuckDB): grouping keys inferred from the
    non-aggregate select list — including the computed nation_band."""
    register_views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey % 5 AS nation_band,
               COUNT(*) AS n_cust, MIN(c_custkey) AS min_key
        FROM customer
        GROUP BY ALL
        """
    )


@register(
    "lateral_alias_chain",
    """
    SELECT doc_id, n_chars,
           n_chars // 100 AS size_band,
           size_band * 100 AS band_floor,
           band_floor + 99 AS band_ceil
    FROM documents
    WHERE n_chars >= 100
    """,
    "projection",
)
def lateral_alias_chain(spark, sf_dir):
    """Lateral column aliases (Spark 3.4+): later select items reference
    earlier aliases in the SAME select list — a chain of three dependent
    computed columns (DuckDB resolves identically)."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT doc_id, n_chars,
               CAST(n_chars / 100 AS INT) AS size_band,
               size_band * 100 AS band_floor,
               band_floor + 99 AS band_ceil
        FROM documents
        WHERE n_chars >= 100
        """
    )


@register(
    "unpivot_sql",
    """
    SELECT l_orderkey, l_linenumber, measure, CAST(v AS DOUBLE) AS v
    FROM (SELECT l_orderkey, l_linenumber,
                 CAST(l_quantity AS DOUBLE) AS qty,
                 CAST(l_extendedprice AS DOUBLE) AS price,
                 CAST(l_discount AS DOUBLE) AS disc,
                 CAST(l_tax AS DOUBLE) AS tax
          FROM lineitem WHERE l_orderkey < 100)
    UNPIVOT (v FOR measure IN (qty, price, disc, tax))
    """,
    "setop",
)
def unpivot_sql(spark, sf_dir):
    """The dedicated UNPIVOT clause (Spark 3.4+ SQL) — the declarative twin
    of the stack() generator already covered by stack_unpivot; measure
    columns pre-cast to a common type so both engines unify identically."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, measure, CAST(v AS DOUBLE) AS v
        FROM (SELECT l_orderkey, l_linenumber,
                     CAST(l_quantity AS DOUBLE) AS qty,
                     CAST(l_extendedprice AS DOUBLE) AS price,
                     CAST(l_discount AS DOUBLE) AS disc,
                     CAST(l_tax AS DOUBLE) AS tax
              FROM lineitem WHERE l_orderkey < 100)
        UNPIVOT (v FOR measure IN (qty, price, disc, tax))
        """
    )


@register("source_xml_roundtrip", _ROUNDTRIP_ORACLE, "scan", "source-format")
def source_xml_roundtrip(spark, sf_dir):
    """XML source (built into Spark 4): write documents as row-tagged XML,
    read back with an explicit schema, aggregate per source against the
    parquet-derived oracle. XML entity escaping (&, <, >, quotes) must
    round-trip the corpus text byte-exactly for the md5 column to match —
    the parser fidelity check the other formats get, for the markup case.
    Spec limits (probed in tests/test_roundtrip_adversarial.py): control
    chars are illegal in XML 1.0 — the writer raises rather than corrupt;
    whitespace-only element text is trimmed by the parser; CR/CRLF and all
    valid unicode survive."""
    docs = load(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "source", "n_chars", "text"
    )
    path = _roundtrip_dir(spark, sf_dir, "xml")
    (
        docs.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .save(path)
    )
    back = (
        spark.read.schema("doc_id bigint, source string, n_chars int, text string")
        .format("xml")
        .option("rowTag", "doc")
        .load(path)
    )
    return _roundtrip_agg(back)


@register(
    "source_python_datasource",
    """
    WITH g AS (SELECT unnest(generate_series(0, 9999)) AS doc_id)
    SELECT 'src' || CAST(doc_id % 10 AS VARCHAR) AS source,
           COUNT(*) AS n_docs,
           CAST(SUM((doc_id * 37) % 991) AS BIGINT) AS sum_chars,
           MIN(md5(CAST(doc_id AS VARCHAR))) AS min_md5
    FROM g
    WHERE doc_id >= 2500 AND doc_id < 7500
    GROUP BY 1
    """,
    "scan",
    "source-format",
)
def source_python_datasource(spark, sf_dir):
    """Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``):
    read the deterministic ``synthetic_docs`` format — the API a pipeline
    uses to mount a non-file corpus service as a first-class
    ``spark.read`` source — through a doc_id range filter, then
    aggregate. The read is partition-parallel (8 declared InputPartitions;
    asserted in test_scale_plans); the filter is applied post-scan because
    Python-source pushdown is unsafe on Spark 4.1 (scan-cache leak — see
    sources/synthetic.py). Every row is a closed-form function of doc_id,
    so the DuckDB generate_series oracle reproduces the dataset exactly
    and any range-bookkeeping bug (skipped/double-read boundary rows)
    breaks the value hash. sf-independent by design: the source IS the
    generator."""
    from ..sources.synthetic import register_synthetic_source

    register_synthetic_source(spark)
    df = spark.read.format("synthetic_docs").option("rows", "10000").load()
    return (
        df.where((F.col("doc_id") >= 2500) & (F.col("doc_id") < 7500))
        .groupBy(
            F.concat(F.lit("src"), (F.col("doc_id") % 10).cast("string")).alias(
                "source"
            )
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("doc_id") * 37) % 991).cast("bigint").alias("sum_chars"),
            F.min(F.md5(F.col("doc_id").cast("string"))).alias("min_md5"),
        )
    )


@register(
    "scd2_customer_merge",
    """
    WITH dim AS (
        SELECT c_custkey, c_mktsegment AS segment FROM customer),
    upd AS (
        SELECT c_custkey, 'SEG_' || CAST(c_custkey % 3 AS VARCHAR) AS segment
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey % 11 = 0 AND c_custkey % 7 != 0
        UNION ALL
        SELECT (SELECT MAX(c_custkey) FROM customer) + 1 + c_custkey, 'NEW'
        FROM customer WHERE c_custkey % 13 = 0),
    joined AS (
        SELECT COALESCE(d.c_custkey, u.c_custkey) AS c_custkey,
               d.segment AS old_seg, u.segment AS new_seg
        FROM dim d FULL OUTER JOIN upd u ON d.c_custkey = u.c_custkey)
    SELECT c_custkey, old_seg AS segment, DATE '2024-01-01' AS valid_from,
           DATE '2024-06-01' AS valid_to, FALSE AS is_current
    FROM joined WHERE old_seg IS NOT NULL AND new_seg IS NOT NULL
                  AND old_seg != new_seg
    UNION ALL
    SELECT c_custkey, new_seg, DATE '2024-06-01', CAST(NULL AS DATE), TRUE
    FROM joined WHERE new_seg IS NOT NULL
                  AND (old_seg IS NULL OR old_seg != new_seg)
    UNION ALL
    SELECT c_custkey, old_seg, DATE '2024-01-01', CAST(NULL AS DATE), TRUE
    FROM joined WHERE old_seg IS NOT NULL
                  AND (new_seg IS NULL OR old_seg = new_seg)
    """,
    "pipeline",
)
def scd2_customer_merge(spark, sf_dir):
    """SCD2 (slowly-changing-dimension type 2) merge — the warehouse
    operation behind every versioned dimension table, expressed with plain
    DataFrame ops (no table-format MERGE INTO needed): one full-outer join
    of the current dimension against the update batch classifies every key
    as changed / unchanged / no-op-update / insert, then a three-way union
    emits closed old versions (valid_to = the merge date), new current
    versions, and untouched rows. Insert keys are offset past
    MAX(c_custkey) (scalar aggregate, broadcast), never a fixed literal a
    bigger table would collide with. No-op updates (same attribute value)
    deliberately produce NO new version — the mistake that silently
    doubles dimension tables. The update batch is synthesized
    deterministically from the customer table (%7 changed, %11 no-op,
    %13 inserts) so the oracle is exact.

    At 100 TB: one key-partitioned join + row-local projections; the
    three-way union reuses the joined result (Spark caches nothing here —
    each branch re-reads the shuffled join output, which AQE plans once)."""
    c = load(spark, sf_dir, "customer")["customer"]
    dim = c.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    upd = (
        c.where(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            F.concat(F.lit("SEG_"), (F.col("c_custkey") % 3).cast("string")).alias(
                "segment"
            ),
        )
        .union(
            c.where((F.col("c_custkey") % 11 == 0) & (F.col("c_custkey") % 7 != 0))
            .select("c_custkey", F.col("c_mktsegment").alias("segment"))
        )
        .union(
            # insert keys offset past MAX(c_custkey): a fixed literal
            # offset would collide with real keys once the table outgrows
            # it (at TPC-H SF >= ~67 for a 10M offset) and silently break
            # the SCD2 semantics at exactly the scale this demonstrates
            c.where(F.col("c_custkey") % 13 == 0)
            .crossJoin(F.broadcast(c.agg(F.max("c_custkey").alias("maxk"))))
            .select(
                (F.col("maxk") + 1 + F.col("c_custkey")).alias("c_custkey"),
                F.lit("NEW").alias("segment"),
            )
        )
    )
    j = (
        dim.alias("d")
        .join(upd.alias("u"), F.col("d.c_custkey") == F.col("u.c_custkey"), "full_outer")
        .select(
            F.coalesce(F.col("d.c_custkey"), F.col("u.c_custkey")).alias("c_custkey"),
            F.col("d.segment").alias("old_seg"),
            F.col("u.segment").alias("new_seg"),
        )
    )
    d0 = F.lit("2024-01-01").cast("date")
    d1 = F.lit("2024-06-01").cast("date")
    null_d = F.lit(None).cast("date")
    changed = F.col("old_seg").isNotNull() & F.col("new_seg").isNotNull() & (
        F.col("old_seg") != F.col("new_seg")
    )
    closed = j.where(changed).select(
        "c_custkey",
        F.col("old_seg").alias("segment"),
        d0.alias("valid_from"),
        d1.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.where(
        F.col("new_seg").isNotNull()
        & (F.col("old_seg").isNull() | (F.col("old_seg") != F.col("new_seg")))
    ).select(
        "c_custkey",
        F.col("new_seg").alias("segment"),
        d1.alias("valid_from"),
        null_d.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    untouched = j.where(
        F.col("old_seg").isNotNull()
        & (F.col("new_seg").isNull() | (F.col("old_seg") == F.col("new_seg")))
    ).select(
        "c_custkey",
        F.col("old_seg").alias("segment"),
        d0.alias("valid_from"),
        null_d.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.union(opened).union(untouched)


@register(
    "sql_scripting_battery",
    """
    SELECT CAST(year(MAX(o_orderdate)) - year(MIN(o_orderdate)) + 1 AS INT)
               AS n_years,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    """,
    "misc",
)
def sql_scripting_battery(spark, sf_dir):
    """Spark 4.1 SQL scripting (SQL/PSM control flow: BEGIN/DECLARE/WHILE/
    SET): a data-driven loop accumulates per-year revenue into a session
    variable, one aggregate query per iteration — the procedural-SQL
    surface migrating warehouse users expect. The oracle is the closed
    form (one aggregate over all years), so the script's loop arithmetic
    is what's under test. Cents are BIGINT (ROUND(price*100) of
    2-decimal-valued doubles is unambiguous), accumulation is exact.

    Scale: each iteration is an independent full aggregate with map-side
    partials; the script itself is driver-side control flow, same class
    as the BPE/pagerank driver loops. Feature-flag conf is set once,
    idempotently (parser feature, not a tuning knob).
    """
    spark.conf.set("spark.sql.scripting.enabled", "true")
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        BEGIN
          DECLARE yr INT DEFAULT 0;
          DECLARE last_yr INT DEFAULT 0;
          DECLARE total BIGINT DEFAULT 0;
          DECLARE ny INT DEFAULT 0;
          SET yr = (SELECT year(MIN(o_orderdate)) FROM orders);
          SET last_yr = (SELECT year(MAX(o_orderdate)) FROM orders);
          WHILE yr <= last_yr DO
            SET total = total + (
                SELECT COALESCE(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                                     AS BIGINT), 0)
                FROM orders WHERE year(o_orderdate) = yr);
            SET ny = ny + 1;
            SET yr = yr + 1;
          END WHILE;
          SELECT ny AS n_years, total AS total_cents;
        END
        """
    )


@register(
    "pipeline_observe_metrics",
    rf"""
    WITH c AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(text), '\s+'),
                               t -> t != '')) AS n_words,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
               length(text) AS n_chars
        FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE n_words >= 16
                 AND CAST(n_alpha AS DOUBLE) / n_chars >= 0.6) AS BIGINT)
               AS n_kept,
           CAST(SUM(CAST(FLOOR(1e6 * CAST(n_alpha AS DOUBLE) / n_chars)
                         AS BIGINT)) AS BIGINT) AS alpha_ratio_sum_q6
    FROM c
    """,
    "misc",
    "pipeline",
)
def pipeline_observe_metrics(spark, sf_dir):
    """Spark Observation API (df.observe): pipeline health metrics
    collected as a side effect of ONE pass over the data — the
    Spark-native way a production curation job reports its gate counts
    without a second scan. The observed values are rebuilt into a 1-row
    DataFrame so the driver contract (and the SQL oracle computing the
    same stats declaratively) can verify them bit-exactly: counts are
    BIGINT, the ratio sum is floor-quantized to 1e-6 per row before the
    exact integer sum (no float accumulation order anywhere).

    The builder triggers the action itself (observation.get blocks on
    it) — bounded driver-side scalars, same class as the BPE argmax and
    pagerank's count()."""
    from pyspark.sql import Observation

    d = load(spark, sf_dir, "documents")["documents"]
    c = d.select(
        "doc_id",
        F.size(F.expr(r"filter(split(lower(text), '\\s+'), t -> t != '')")).alias(
            "n_words"
        ),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("n_alpha"),
        F.length("text").alias("n_chars"),
    )
    alpha_ratio = F.col("n_alpha").cast("double") / F.col("n_chars")
    keep = (F.col("n_words") >= 16) & (alpha_ratio >= 0.6)
    obs = Observation("gate")
    observed = c.observe(
        obs,
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.floor(F.lit(1e6) * alpha_ratio).cast("bigint"))
        .cast("bigint")
        .alias("alpha_ratio_sum_q6"),
    )
    observed.count()  # the single pass; obs.get blocks until it completes
    m = obs.get
    return spark.createDataFrame(
        [(m["n_docs"], m["n_kept"], m["alpha_ratio_sum_q6"])],
        "n_docs bigint, n_kept bigint, alpha_ratio_sum_q6 bigint",
    )


@register(
    "sink_python_datasource_roundtrip",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM documents
    GROUP BY source
    """,
    "scan",
    "source-format",
)
def sink_python_datasource_roundtrip(spark, sf_dir):
    """Python DataSource WRITE path (Spark 4 DataSourceWriter, the sink
    twin of source_python_datasource): documents are written through the
    ``jsonl_sink`` format — each executor partition stages its own
    JSON-lines part file, the driver's commit() seals with _SUCCESS (the
    standard two-phase sink contract) — then read back with the native
    JSON reader and aggregated. The oracle computes the same aggregate
    from the parquet source directly, so a dropped/duplicated partition
    or a lossy serialization breaks the value hash. The scratch dir is
    cleared per invocation (bench runs the builder twice per session)."""
    import os
    import shutil

    from ..sources.synthetic import register_jsonl_sink

    register_jsonl_sink(spark)
    path = scratch_path(
        spark, f"jsonl_sink_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    d = load(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "source", "n_chars"
    )
    d.write.format("jsonl_sink").option("path", path).mode("append").save()
    back = spark.read.json(path)
    return back.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )


# ---------------------------------------------------------------------------
# Round 10 — binaryFile source: the ingestion front door for multimodal /
# raw-blob corpora (images, audio, crawl WARCs). Spark's binaryFile format
# reads whole files as (path, modificationTime, length, content) rows; the
# multimodal operators then decode the binary column. This query stages the
# documents table as per-bucket blob files and proves the scan returns the
# exact bytes (md5) and lengths.
# ---------------------------------------------------------------------------

_BINFILE_BUCKETS = 64


@register(
    "source_binaryfile_stats",
    f"""
    SELECT CAST(doc_id % {_BINFILE_BUCKETS} AS INT) AS bucket,
           CAST(SUM(octet_length(encode(text))) + COUNT(*) AS BIGINT) AS n_bytes,
           md5(string_agg(text, chr(10) ORDER BY doc_id) || chr(10)) AS content_md5
    FROM documents GROUP BY doc_id % {_BINFILE_BUCKETS}
    """,
    "sources",
)
def source_binaryfile_stats(spark, sf_dir):
    """Spark binaryFile source round-trip: documents are staged as
    {_BINFILE_BUCKETS} blob files (each bucket's texts newline-joined in
    doc_id order), read back whole-file via
    ``spark.read.format("binaryFile")``, and fingerprinted — bucket id
    from partition discovery over the ``bucket=NN`` layout, byte length
    from the source's metadata column, md5 over the raw ``content``
    bytes. The oracle recomputes all three from the parquet table, so a
    single corrupted/truncated/reordered byte fails the match.

    Staging is fully distributed: the per-bucket payloads are written
    with ``df.write.partitionBy("bucket").text(...)`` (one row per
    bucket, so one file per partition directory; the text writer's
    trailing newline is accounted for in the oracle — n_bytes counts
    COUNT(*) newlines: COUNT(*)-1 separators + 1 trailing). No driver
    collect anywhere in the fixture path, so even the staging survives
    a 100 TB corpus. The oracle's octet_length(encode(text)) is the
    UTF-8 byte length — byte-true for non-ASCII text, matching the
    binaryFile metadata length of the UTF-8-encoded payload (a bare
    LENGTH(text) counts characters and only coincidentally agrees on
    ASCII corpora)."""
    docs = load(spark, sf_dir, "documents")["documents"]
    payloads = docs.groupBy(
        (F.col("doc_id") % _BINFILE_BUCKETS).cast("int").alias("bucket")
    ).agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(doc_id, text))),"
            " x -> x.text), '\\n')"
        ).alias("value")
    )
    path = _roundtrip_dir(spark, sf_dir, "binfiles")
    payloads.write.partitionBy("bucket").mode("overwrite").text(path)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(path)
    )
    return back.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


@register(
    "sql_pipe_syntax_battery",
    """
    SELECT l_returnflag,
           CAST(qty_bucket AS INT) AS qty_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(price_cents) AS BIGINT) AS rev_cents
    FROM (SELECT l_returnflag,
                 CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
                 CAST(l_quantity AS BIGINT) // 10 AS qty_bucket
          FROM lineitem WHERE l_quantity > 5)
    GROUP BY l_returnflag, qty_bucket
    HAVING COUNT(*) >= 5
    """,
    "sql4",
)
def sql_pipe_syntax_battery(spark, sf_dir):
    """Spark 4.0 SQL pipe syntax (|>): the linear FROM-first query form —
    scan |> WHERE |> EXTEND (computed columns) |> AGGREGATE .. GROUP BY
    |> WHERE-over-aggregates (pipe HAVING) |> ORDER BY |> SELECT — the
    operator-at-a-time SQL dialect Spark 4 ships for pipeline-style
    authoring. Compiles to the SAME logical plan as the ANSI form (the
    oracle), so pushdown/pruning/partial-agg all apply unchanged; this
    registers the surface so lineage extraction is proven over
    pipe-parsed plans too.

    Cents are pinned with FLOOR(x*100 + 0.5) (bare CAST truncates in
    Spark, rounds in DuckDB)."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity > 5
        |> EXTEND CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
                  CAST(l_quantity AS BIGINT) DIV 10 AS qty_bucket
        |> AGGREGATE COUNT(*) AS n_items, SUM(price_cents) AS rev_cents
           GROUP BY l_returnflag, qty_bucket
        |> WHERE n_items >= 5
        |> ORDER BY l_returnflag, qty_bucket
        |> SELECT l_returnflag, CAST(qty_bucket AS INT) AS qty_bucket,
                  CAST(n_items AS BIGINT) AS n_items,
                  CAST(rev_cents AS BIGINT) AS rev_cents
        """
    )


@register(
    "scd2_point_in_time_join",
    """
    WITH dimv AS (
        SELECT c_custkey, 'A_' || CAST(c_custkey % 3 AS VARCHAR) AS segment,
               DATE '1900-01-01' AS valid_from,
               DATE '1996-06-01' + CAST(c_custkey % 731 AS INT) AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, 'B_' || CAST(c_custkey % 5 AS VARCHAR) AS segment,
               DATE '1996-06-01' + CAST(c_custkey % 731 AS INT) AS valid_from,
               CAST(NULL AS DATE) AS valid_to
        FROM customer),
    pit AS (
        SELECT d.segment,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders o JOIN dimv d
          ON o.o_custkey = d.c_custkey
         AND CAST(o.o_orderdate AS DATE) >= d.valid_from
         AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < d.valid_to))
    SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM pit GROUP BY segment
    """,
    "pipeline",
)
def scd2_point_in_time_join(spark, sf_dir):
    """Point-in-time (AS OF) join against a versioned SCD2 dimension: each
    order is attributed to the dimension version VALID AT ITS ORDER DATE
    — the temporal-correctness query every versioned warehouse needs (a
    plain join to the current version silently rewrites history). The
    two-version dimension is synthesized deterministically (per-customer
    boundary date spread across the order-date span), so every order
    matches exactly one version and the oracle is exact.

    Scale posture: this is an EQUI-join on the customer key with a small
    per-key version fanout (dimension history, typically a handful of
    rows per key) + a residual validity-range filter — NOT a range join;
    the revenue rollup is segment-sized. Half-open intervals
    [valid_from, valid_to) make boundary dates unambiguous."""
    c = load(spark, sf_dir, "customer")["customer"]
    o = load(spark, sf_dir, "orders")["orders"]
    boundary = F.expr("date_add(DATE '1996-06-01', CAST(c_custkey % 731 AS INT))")
    v1 = c.select(
        "c_custkey",
        F.concat(F.lit("A_"), (F.col("c_custkey") % 3).cast("string")).alias("segment"),
        F.lit("1900-01-01").cast("date").alias("valid_from"),
        boundary.alias("valid_to"),
    )
    v2 = c.select(
        "c_custkey",
        F.concat(F.lit("B_"), (F.col("c_custkey") % 5).cast("string")).alias("segment"),
        boundary.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    dimv = v1.union(v2)
    od = F.col("o_orderdate").cast("date")
    pit = o.join(
        dimv,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (od >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (od < F.col("valid_to"))),
    )
    return pit.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Round 11 — incremental materialized-view maintenance (delta merge)
# ---------------------------------------------------------------------------

_IMV_CUTOFF = "DATE '2000-01-01'"


@register(
    "incremental_join_agg_refresh",
    f"""
    SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month,
           l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    """,
    "pipeline",
)
def incremental_join_agg_refresh(spark, sf_dir):
    """Incremental refresh of a join-aggregate materialized view: monthly
    revenue by return flag over lineitem JOIN orders. The refreshed state
    is computed the way an incremental MV engine computes it — the BASE
    aggregate (orders strictly before {_IMV_CUTOFF}) is algebraically
    MERGED with the DELTA aggregate (orders at/after the cutoff) by
    re-aggregating the union of partial states: SUM/COUNT are
    commutative monoids, so merge(base, delta) == full recompute. The
    oracle IS the full recompute, so the gate proves the incremental
    identity bit-exactly (floor-quantized cents; one double never
    appears).

    Scale posture: in production the base aggregate is a STORED table
    (month x flag grain — tiny) and only the delta partition is scanned
    and joined, so refresh cost is O(|delta|), not O(|history|): the
    point of incremental maintenance. Both branches here shuffle once on
    the group key at partial-aggregate size; the final merge re-shuffles
    only the (months x flags) grain. The delta join broadcasts the delta
    orders when small (AQE decides).

    Reference analogue: the lineage engine tracks exactly these MV
    refresh chains (hypertable rollup incremental, timeseries.py) —
    this is the join-aggregate generalization."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    o = load(spark, sf_dir, "orders")["orders"]
    month = F.date_trunc("month", F.col("o_orderdate").cast("date")).cast("date")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")

    def partial(orders_part):
        return (
            li.join(orders_part, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(month.alias("month"), "l_returnflag")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_items"),
                F.sum(cents).cast("bigint").alias("revenue_cents"),
            )
        )

    cut = F.expr(f"CAST({_IMV_CUTOFF} AS DATE)")
    # Route NULL order dates into the delta branch (coalesce to the far
    # future) so a NULL row lands in exactly ONE partial aggregate — a
    # bare `< / >=` split drops NULLs from both branches while the
    # full-recompute oracle keeps them under a NULL month. TPC-H dates
    # are non-null, so results are unchanged; the identity no longer
    # depends on that.
    routed = F.coalesce(
        F.col("o_orderdate").cast("date"), F.expr("CAST('9999-12-31' AS DATE)")
    )
    base = partial(o.where(routed < cut))
    delta = partial(o.where(routed >= cut))
    return (
        base.unionByName(delta)
        .groupBy("month", "l_returnflag")
        .agg(
            F.sum("n_items").cast("bigint").alias("n_items"),
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
    )


@register(
    "orders_abc_pareto",
    """
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS grand FROM rev),
    ranked AS (
        SELECT l_partkey, rev_cents,
               CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_cents
        FROM rev)
    SELECT l_partkey, rev_cents,
           (CAST(cum_cents AS DOUBLE) / grand) AS cum_share,
           CASE WHEN cum_cents * 100 <= grand * 80 THEN 'A'
                WHEN cum_cents * 100 <= grand * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked, tot
    """,
    "pipeline",
)
def orders_abc_pareto(spark, sf_dir):
    """ABC / Pareto classification of parts by revenue: rank parts by
    revenue, accumulate the share, and label A (first 80% of revenue),
    B (next 15%), C (tail) — the inventory-policy segmentation every
    warehouse runs, and structurally the same cumulative-share report a
    data-curation pipeline runs over domain token mass.

    Exactness: revenue is floor-quantized cents; the running total and
    the class boundaries are pure BIGINT comparisons (cum * 100 <=
    grand * 80 — never a float threshold); the reported cum_share is
    one exact double division for display. The running-sum order is
    total (revenue DESC, partkey).

    Scale posture: one corpus shuffle to part grain; the Pareto window
    runs over the part-grain frame. A GLOBAL unpartitioned running sum
    is a single-reducer sort at extreme dimension cardinalities — at
    that point the standard refinement is the two-phase prefix sum
    (per-range partial totals broadcast as offsets, exactly
    pack_sequences_running's shape); part grain here is dimension-sized
    and the plan keeps everything after the first rollup at that
    grain. The 1-row grand total broadcasts."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
        )
        .cast("bigint")
        .alias("rev_cents")
    )
    tot = rev.agg(F.sum("rev_cents").cast("bigint").alias("grand"))
    w = Window.orderBy(F.col("rev_cents").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = rev.withColumn(
        "cum_cents", F.sum("rev_cents").over(w).cast("bigint")
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "rev_cents",
        (F.col("cum_cents").cast("double") / F.col("grand")).alias("cum_share"),
        F.when(
            F.col("cum_cents") * 100 <= F.col("grand") * 80, F.lit("A")
        )
        .when(F.col("cum_cents") * 100 <= F.col("grand") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
