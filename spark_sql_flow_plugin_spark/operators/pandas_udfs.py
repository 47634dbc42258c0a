"""Pandas-UDF surface: grouped-map ``applyInPandas`` (Catalyst
FlatMapGroupsInPandas — reference rule SQLFlow.scala:451-456), vectorized
scalar pandas UDFs, and ``mapInPandas``.

Pandas UDFs are the sanctioned slow path: Arrow-batched, so a 100 TB run
pays one (de)serialization per batch, not per row. Logic inside stays
vectorized (numpy/pandas ops only, no Python row loops).
"""

from __future__ import annotations

from collections.abc import Iterator  # noqa: F401 (re-exported for hints)
from typing import Tuple  # noqa: F401, UP035 — pandas_udf resolves string hints

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import register
from ..sources import load, register_views


@register(
    "pandas_grouped_topn",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rnk FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INT) AS rnk
        FROM lineitem) t
    WHERE rnk <= 5
    """,
    "pandas-udf",
)
def pandas_grouped_topn(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]

    def top5(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True],
        ).head(5)
        out = out.assign(rnk=range(1, len(out) + 1))
        return out[["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rnk"]]

    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(
            top5,
            "l_returnflag string, l_orderkey bigint, l_linenumber int, "
            "l_extendedprice double, rnk int",
        )
    )


@register(
    "pandas_scalar_band",
    """
    SELECT band, COUNT(*) AS cnt FROM (
        SELECT CASE WHEN o_totalprice < 2500 THEN 'low'
                    WHEN o_totalprice < 7500 THEN 'mid'
                    ELSE 'high' END AS band
        FROM orders) t
    GROUP BY band
    """,
    "pandas-udf",
)
def pandas_scalar_band(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]

    @pandas_udf("string")
    def band(price: pd.Series) -> pd.Series:
        return pd.cut(
            price,
            bins=[float("-inf"), 2500.0, 7500.0, float("inf")],
            labels=["low", "mid", "high"],
            right=False,
        ).astype(str)

    return o.select(band("o_totalprice").alias("band")).groupBy("band").agg(
        F.count("*").alias("cnt")
    )


@register(
    "cogroup_user_enrich",
    """
    SELECT COALESCE(e.user_id, c.c_custkey) AS user_id,
           COALESCE(e.n_events, 0) AS n_events,
           e.max_value AS max_value,
           c.c_mktsegment AS segment,
           c.c_acctbal AS acctbal
    FROM (SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
          FROM events GROUP BY user_id) e
    FULL OUTER JOIN customer c ON e.user_id = c.c_custkey
    """,
    "pandas-udf",
)
def cogroup_user_enrich(spark, sf_dir):
    """Grouped cogroup enrichment (Catalyst FlatMapCoGroupsInPandas —
    reference rule SQLFlow.scala:452-456): per-user event stats joined with
    the customer dimension inside one Arrow-batched function, full-outer
    over the key space (a key present on either side produces a row).

    Scale (r14): the cogroup key is a BUCKET of the user key, not the
    user key itself — `applyInPandas` over a cogroup invokes the Python
    function once per key, and per-USER invocation costs ~1 ms of pandas
    frame construction regardless of group size (measured 38 s at sf0.1
    for ~25k users; 256 buckets bring it to ~2 s). Within a bucket the
    per-user aggregate + full-outer merge is one vectorized pandas
    groupby/merge, so output rows are IDENTICAL to the per-user form —
    the oracle text did not move. At 100 TB this is the only shape that
    survives: Python invocation count tracks bucket count (bounded),
    not key cardinality. Aggregates are order-independent (count/max)
    so the result is bit-stable across partitionings; NULL columns are
    sanitized to object/None so Arrow never smuggles a NaN into a
    missing slot.
    """
    ev = load(spark, sf_dir, "events")["events"]
    cu = load(spark, sf_dir, "customer")["customer"]
    n_buckets = 256

    def enrich(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left):
            # pandas groupby defaults dropna=True, which would SILENTLY
            # drop NULL-keyed events while the SQL oracle's GROUP BY
            # keeps a NULL group; the fixture has no NULL user_id today,
            # so fail loudly if a data regeneration introduces one
            # instead of changing semantics (r14 ADVICE).
            if not left["user_id"].notna().all():
                raise ValueError(
                    "cogroup_user_enrich: NULL user_id in events — the "
                    "pandas groupby path would diverge from the SQL "
                    "NULL-group semantics"
                )
            agg = left.groupby("user_id", sort=False)["value"].agg(
                ["size", "max"]
            )
            agg.columns = ["n_events", "max_value"]
            agg = agg.reset_index()
        else:
            agg = pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "n_events": pd.Series(dtype="int64"),
                 "max_value": pd.Series(dtype="float64")}
            )
        dim = right.rename(
            columns={
                "c_custkey": "user_id",
                "c_mktsegment": "segment",
                "c_acctbal": "acctbal",
            }
        )
        m = agg.merge(dim, on="user_id", how="outer")
        out = pd.DataFrame(
            {
                "user_id": m["user_id"].astype("int64"),
                "n_events": m["n_events"].fillna(0).astype("int64"),
                "max_value": m["max_value"].astype(object).where(
                    m["max_value"].notna(), None
                ),
                "segment": m["segment"].astype(object).where(
                    m["segment"].notna(), None
                ),
                "acctbal": m["acctbal"].astype(object).where(
                    m["acctbal"].notna(), None
                ),
            }
        )
        return out

    evb = ev.select("user_id", "value").withColumn(
        "b", F.pmod(F.col("user_id"), F.lit(n_buckets))
    )
    cub = cu.select("c_custkey", "c_mktsegment", "c_acctbal").withColumn(
        "b", F.pmod(F.col("c_custkey"), F.lit(n_buckets))
    )
    return (
        evb.groupBy("b")
        .cogroup(cub.groupBy("b"))
        .applyInPandas(
            enrich,
            "user_id bigint, n_events bigint, max_value double, "
            "segment string, acctbal double",
        )
    )


@register(
    "mapinpandas_enrich",
    """
    SELECT doc_id, n_chars, n_chars * 2 AS double_chars FROM documents WHERE n_chars > 200
    """,
    "pandas-udf",
)
def mapinpandas_enrich(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[pdf["n_chars"] > 200][["doc_id", "n_chars"]].copy()
            out["double_chars"] = out["n_chars"] * 2
            yield out

    return d.select("doc_id", "n_chars").mapInPandas(
        enrich, "doc_id bigint, n_chars bigint, double_chars bigint"
    )


@register(
    "mapinarrow_charstats",
    """
    SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
           substr(text, 1, 1) AS first_char
    FROM documents
    """,
    "pandas-udf",
)
def mapinarrow_charstats(spark, sf_dir):
    """mapInArrow (Catalyst PythonMapInArrow): the zero-copy sibling of
    mapInPandas — batches arrive as pyarrow RecordBatches and the kernels
    below run in Arrow's C++ compute layer, skipping the pandas
    conversion entirely. The cheapest Python-adjacent path for byte/string
    munging at scale."""
    d = load(spark, sf_dir, "documents")["documents"].select("doc_id", "text")

    def stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int32()),
                    pc.utf8_slice_codeunits(text, 0, 1),
                ],
                ["doc_id", "n_chars", "first_char"],
            )

    return d.mapInArrow(stats, "doc_id bigint, n_chars int, first_char string")


@register(
    "pandas_scalar_iter_norm",
    """
    WITH stats AS (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS mu
        FROM orders)
    SELECT o_orderkey, ROUND(o_totalprice / mu, 6) AS price_ratio
    FROM orders, stats
    """,
    "pandas-udf",
)
def pandas_scalar_iter_norm(spark, sf_dir):
    """SCALAR_ITER pandas UDF — the variant for expensive per-worker setup
    (model weights, tokenizers): the iterator form runs initialization ONCE
    per executor task, then streams Arrow batches through it; a plain
    scalar UDF would redo the setup per batch. Here the 'model' is the
    corpus mean price, broadcast as a column so the UDF stays a pure
    function of its inputs (state loads in the generator prologue)."""
    o = load(spark, sf_dir, "orders")["orders"]
    mu = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("mu")
    )

    @pandas_udf("double")
    def ratio(
        it: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # one-time per-task setup would go here (load weights, compile regex)
        for price, mean in it:
            yield price / mean

    # round OUTSIDE the UDF: pandas Series.round is half-to-even while
    # DuckDB's ROUND(double) is half-away-from-zero; Spark's F.round uses
    # HALF_UP on the double's shortest decimal repr, matching the oracle.
    return o.crossJoin(F.broadcast(mu)).select(
        "o_orderkey",
        F.round(ratio("o_totalprice", "mu"), 6).alias("price_ratio"),
    )


@register(
    "pandas_grouped_agg_wmean",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS wmean_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "pandas-udf",
)
def pandas_grouped_agg_wmean(spark, sf_dir):
    """GROUPED_AGG pandas UDF (quantity-weighted mean price per return
    flag) — the Arrow-vectorized custom aggregate that also works as a
    window function. Sums run over exact decimals (via float64 on integer-
    scaled values) so the result matches the SQL oracle bit-for-bit:
    l_extendedprice carries 2 decimal digits and l_quantity is
    integer-valued, so scaling price by 100 makes every product an exact
    int64 and the quotient a single deterministic division. Scale factors
    are the MINIMUM that preserves exactness: an earlier 10^4-per-operand
    version overflowed int64 at sf0.1 group sizes (2.5e18 > 2^63) and
    pandas wraps silently — caught only by the full-matrix run at sf0.1,
    which is why the matrix runs at every scale factor. Current headroom:
    price*100 * qty <= ~5e8 per row, int64 holds ~1.8e10 such rows per
    group."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]

    @pandas_udf("double")
    def wmean(price: pd.Series, qty: pd.Series) -> float:
        # scale to exact integers to kill summation-order nondeterminism,
        # then one double division (price: 2 decimals; qty: integer-valued)
        num = (price * 100).round().astype("int64") * qty.round().astype("int64")
        den = qty.round().astype("int64")
        return float(num.sum() / 100) / float(den.sum())

    return li.groupBy("l_returnflag").agg(
        wmean("l_extendedprice", "l_quantity").alias("wmean_price")
    )


_SEG_LEN = 16
# ASCII-explicit tokenizer contract shared with the DuckDB oracle: 26-char
# lowercase translate + the literal RE2 \s class (see the UDTF docstring).
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)
_RE2_WS = r"[\t\n\f\r ]+"


@register(
    "sql_python_udtf_segments",
    rf"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(
                   translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                   'abcdefghijklmnopqrstuvwxyz'),
                   '[\t\n\f\r ]+'), x -> x != '') AS toks
        FROM documents),
    s AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, CAST(CEIL(CAST(len(toks) AS DOUBLE)
                                                   / {_SEG_LEN}) AS BIGINT))) AS i
        FROM t WHERE len(toks) > 0)
    SELECT doc_id,
           CAST(i - 1 AS INT) AS seg_idx,
           CAST(LEAST({_SEG_LEN}, len(toks) - (i - 1) * {_SEG_LEN}) AS INT) AS n_tokens,
           md5(array_to_string(toks[(i - 1) * {_SEG_LEN} + 1 : (i - 1) * {_SEG_LEN} + {_SEG_LEN}], ' ')) AS seg_md5
    FROM s
    """,
    "pandas",
    "text",
)
def sql_python_udtf_segments(spark, sf_dir):
    """Spark 4 Python UDTF surface: a table-valued function consumed via
    LATERAL join — the variable-output-row shape scalar/grouped pandas
    UDFs can't express. The UDTF segments each document into fixed
    16-word windows (the chunking primitive, here as a UDTF so the
    registry covers the API; docs_chunk_tokens is the builtin-HOF twin
    that stays JVM-side — prefer it in the hot path, this demonstrates
    the escape hatch for logic that genuinely needs Python).

    Determinism: both sides use an explicit ASCII contract — lowercase is
    a 26-char translate (not str.lower()/SQL lower(), which diverge on
    chars like U+0130 between Python full casing and utf8proc simple
    casing) and the tokenizer splits on the literal class [\\t\\n\\f\\r ]
    (RE2's \\s; Python's str.split() additionally splits on \\x0b/\\xa0/
    Unicode spaces). hashlib md5 equals SQL md5 — the UDTF's output is
    byte-identical to the pure-SQL oracle on ANY input, not just ASCII.
    """
    import hashlib
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="seg_idx: int, n_tokens: int, seg_md5: string")
    class Segmenter:
        def eval(self, text: str):
            toks = [
                t
                for t in re.split(_RE2_WS, (text or "").translate(_ASCII_LOWER))
                if t
            ]
            for i in range(0, len(toks), _SEG_LEN):
                seg = toks[i : i + _SEG_LEN]
                yield (
                    i // _SEG_LEN,
                    len(seg),
                    hashlib.md5(" ".join(seg).encode()).hexdigest(),
                )

    spark.udtf.register("segmenter_udtf", Segmenter)
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT d.doc_id, s.seg_idx, s.n_tokens, s.seg_md5
        FROM documents d, LATERAL segmenter_udtf(d.text) s
        """
    )
