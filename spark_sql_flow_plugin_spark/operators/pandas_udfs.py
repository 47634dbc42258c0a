"""Pandas-UDF surface: grouped-map ``applyInPandas`` (Catalyst
FlatMapGroupsInPandas — reference rule SQLFlow.scala:451-456), vectorized
scalar pandas UDFs, and ``mapInPandas``.

Pandas UDFs are the sanctioned slow path: Arrow-batched, so a 100 TB run
pays one (de)serialization per batch, not per row. Logic inside stays
vectorized (numpy/pandas ops only, no Python row loops).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import register
from ..sources import load


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
