"""Link-graph centrality for corpus curation (NEW — LLM-pipeline surface).

Web-scale training-data pipelines rank crawled pages by link-graph
centrality before/alongside content quality filters (e.g. Common Crawl's
harmonic-centrality rankings; PageRank, Page et al. 1999). This module runs
PageRank over a deterministic synthetic hyperlink graph derived from the
``documents`` table: each doc links to 3 md5-derived targets
(``H32(doc_id:k) % N``), self-loops removed, multiplicity kept.

Cross-engine exactness: the entire iteration is BIGINT fixed-point
(scale 1e9). Per-edge contribution is ``rank DIV out_deg`` (integer
division), the damping step is ``base + (85 * sum) DIV 100`` — every
operation is order-independent exact integer arithmetic, so Spark and
DuckDB agree bit-for-bit with no float folds anywhere.

Scale posture: each of the K=5 unrolled iterations is one shuffle of the
edge list on ``src`` (join against current ranks) plus one aggregation
shuffle on ``dst`` — the textbook distributed PageRank shape. At 100 TB the
edge table would be bucketed by ``src`` (sources/bucketing.py) so the join
side of every iteration is shuffle-free, and ranks (one BIGINT per node)
are the only data moved per round. The unrolled-CTE form keeps the whole
thing one declarative plan for Catalyst/AQE; a driver loop with
localCheckpoint every ~10 rounds is the variant for large K.
"""

from __future__ import annotations

from ..registry import register
from ..sources import register_views

_SCALE = 1_000_000_000
_DAMP_NUM, _DAMP_DEN = 85, 100  # d = 0.85
_K = 5
_FANOUT = 3


def _edges_sql(dialect: str) -> str:
    """Edge CTEs: md5-derived 3-regular-ish digraph over documents."""
    if dialect == "spark":
        h32 = (
            "cast(conv(substr(md5(concat(cast(doc_id as string), ':', "
            "cast(k as string))), 1, 8), 16, 10) as bigint)"
        )
        vals = f"(VALUES {', '.join(f'({i})' for i in range(1, _FANOUT + 1))} AS t(k))"
        div = "DIV"
    else:
        h32 = (
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
            "CAST(k AS VARCHAR)), 1, 8))::BIGINT"
        )
        vals = f"(VALUES {', '.join(f'({i})' for i in range(1, _FANOUT + 1))}) t(k)"
        div = "//"
    return f"""
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    nodes AS (SELECT doc_id FROM documents),
    edges0 AS (
        SELECT doc_id AS src, {h32} % (SELECT n_docs FROM n) AS dst
        FROM documents CROSS JOIN {vals}),
    edges1 AS (SELECT src, dst FROM edges0 WHERE src <> dst),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg
            FROM edges1 GROUP BY src),
    edges AS (SELECT e.src, e.dst, d.out_deg
              FROM edges1 e JOIN deg d ON e.src = d.src),
    r0 AS (SELECT doc_id,
                  CAST({_SCALE} {div} (SELECT n_docs FROM n) AS BIGINT) AS rank_fp
           FROM nodes)"""


def _iter_sql(i: int, dialect: str) -> str:
    div = "DIV" if dialect == "spark" else "//"
    base = (
        f"CAST(({_DAMP_DEN - _DAMP_NUM} * ({_SCALE} {div} (SELECT n_docs FROM n)))"
        f" {div} {_DAMP_DEN} AS BIGINT)"
    )
    return f"""
    s{i} AS (
        SELECT e.dst AS doc_id,
               CAST(SUM(r.rank_fp {div} e.out_deg) AS BIGINT) AS contrib
        FROM edges e JOIN r{i - 1} r ON e.src = r.doc_id
        GROUP BY e.dst),
    r{i} AS (
        SELECT nd.doc_id,
               {base} + CAST(({_DAMP_NUM} * COALESCE(s.contrib, 0))
                             {div} {_DAMP_DEN} AS BIGINT) AS rank_fp
        FROM nodes nd LEFT JOIN s{i} s ON nd.doc_id = s.doc_id)"""


def _pagerank_sql(dialect: str) -> str:
    ctes = _edges_sql(dialect) + "".join(
        "," + _iter_sql(i, dialect) for i in range(1, _K + 1)
    )
    return f"""
    WITH {ctes}
    SELECT r.doc_id, r.rank_fp, CAST(COALESCE(d.out_deg, 0) AS INT) AS out_deg
    FROM r{_K} r LEFT JOIN deg d ON r.doc_id = d.src
    """


@register(
    "graph_pagerank_centrality",
    _pagerank_sql("duckdb"),
    "graph",
    "curation",
    "bench",
)
def graph_pagerank_centrality(spark, sf_dir):
    """DataFrame-loop PageRank (the oracle runs the unrolled-CTE SQL form
    of the identical fixed-point arithmetic).

    Why not spark.sql(_pagerank_sql("spark"))? CTE inlining re-derives the
    edge list in every iteration (5 extra scans + degree aggregations) and
    plans the ``(SELECT n_docs FROM n)`` scalars as 1-row
    BroadcastNestedLoopJoins — 60 exchanges, 11 NLJs at K=5. Here the edge
    list is built once, cached, and re-joined; N is one driver-side count()
    (a bounded scalar, same class as BPE's per-round argmax), so each
    iteration moves exactly one BIGINT per node plus the cached edges:
    2 shuffles per round, zero nested-loop joins.
    """
    from pyspark.sql import functions as F

    from ..caching import scope_caches
    from ..sources import load

    docs = load(spark, sf_dir, "documents")["documents"].select("doc_id")
    n_docs = docs.count()
    init = _SCALE // n_docs
    base = ((_DAMP_DEN - _DAMP_NUM) * init) // _DAMP_DEN

    h32 = (
        "cast(conv(substr(md5(concat(cast(src as string), ':', "
        "cast(k as string))), 1, 8), 16, 10) as bigint)"
    )
    edges1 = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(F.array(*[F.lit(i) for i in range(1, _FANOUT + 1)])).alias("k"),
        )
        .select("src", F.expr(f"{h32} % {n_docs}").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    deg = edges1.groupBy("src").agg(F.count("*").cast("bigint").alias("out_deg"))
    edges = (
        edges1.join(deg, "src")
        .repartition(spark.sparkContext.defaultParallelism, "src")
        .persist()
    )

    ranks = docs.select("doc_id", F.lit(init).cast("bigint").alias("rank_fp"))
    for _ in range(_K):
        contrib = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .select("dst", F.expr("rank_fp DIV out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("contrib"))
        )
        ranks = (
            docs.join(contrib, docs.doc_id == contrib.dst, "left")
            .select(
                "doc_id",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(
                        f"CAST(({_DAMP_NUM} * COALESCE(contrib, 0L))"
                        f" DIV {_DAMP_DEN} AS BIGINT)"
                    )
                ).alias("rank_fp"),
            )
        )
    out = (
        ranks.join(deg.withColumnRenamed("src", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            "rank_fp",
            F.coalesce(F.col("out_deg"), F.lit(0)).cast("int").alias("out_deg"),
        )
    )
    return scope_caches(out, edges)


# ---------------------------------------------------------------------------
# Round 11 — triangle counting / clustering on the co-purchase graph
# ---------------------------------------------------------------------------

_TRI_SQL = """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS i, b.l_partkey AS j
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    tri AS (
        SELECT e1.i AS a, e1.j AS b, e2.j AS c
        FROM pairs e1
        JOIN pairs e2 ON e2.i = e1.j
        JOIN pairs e3 ON e3.i = e1.i AND e3.j = e2.j),
    verts AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b AS node FROM tri
        UNION ALL SELECT c AS node FROM tri)
    SELECT CAST(node AS BIGINT) AS node,
           CAST(COUNT(*) AS BIGINT) AS n_tri
    FROM verts GROUP BY node
"""


@register(
    "graph_triangle_count",
    _TRI_SQL,
    "graph",
)
def graph_triangle_count(spark, sf_dir):
    """Per-node triangle participation counts on the co-purchase graph
    (parts bought together in one order) — the standard graph-quality /
    community-density signal (clustering coefficient's numerator), used
    in curation to spot template-generated link farms vs organically
    dense neighborhoods.

    Graph construction: per-order part pairs with ``i < j`` ordering
    (each undirected edge stored once, orientation by key). Per-order
    fanout is bounded (a TPC-H order has <= 7 lineitems), so edge
    generation is order-local with no skew. Triangle enumeration is the
    textbook two-join shape: wedges = edges joined on the middle vertex,
    closed by an equi-join back to the edge set — equi-joins only, never
    a cartesian. The i<j<k orientation counts each triangle exactly
    once.

    100 TB posture: co-purchase degree is bounded by order size x
    orders-per-part, so wedge counts scale linearly with data. For
    power-law graphs the classic refinement is DEGREE ordering (orient
    edges low-degree -> high-degree before the wedge join, Schank &
    Wagner 2005) — one extra degree-aggregation + broadcast join away;
    key ordering suffices for this bounded-degree graph and keeps the
    oracle identical.

    Both engines run the identical SQL text (equi-joins, DISTINCT,
    UNION ALL, integer counts — no dialect split needed)."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_TRI_SQL)
