"""Catalog-mode lineage: one graph over every registered view
(reference ``catalogToSQLFlow``, SQLFlow.scala:61-189).

For each temp/permanent view in the session catalog:
- emit a ViewNode with the view's output columns;
- extract the view plan's lineage (expanded or contracted);
- **temp-view substitution**: any subplan semantically equal to *another*
  registered view collapses to that view's node (shared pipeline segments
  become view references — reference SQLFlow.scala:94-171). Detection uses
  Catalyst's own ``plan.semanticHash()`` via a lockstep walk of the JVM and
  JSON trees (both are the optimized plan, so pre-order aligns).
- cached subtrees are flagged (lightblue in DOT) via the session
  cacheManager (reference SQLFlow.scala:191-196).

Deviation from the reference: substitution happens on *optimized* plans
(the reference doctors analyzed plans, then re-optimizes). Self-consistent,
and avoids re-running the optimizer per view.
"""

from __future__ import annotations

from .catalyst import PlanNode, optimized_plan_tree
from .graph import GraphEdge, GraphNode, NodeType
from .lineage import LineageExtractor, jvm_leaf_ident, jvm_leaf_stats
from . import contracted as contracted_mod


def _jvm_preorder(jplan):
    yield jplan
    children = jplan.children()
    for i in range(children.size()):
        yield from _jvm_preorder(children.apply(i))


def _is_cached(spark, jplan) -> bool:
    try:
        cm = spark._jsparkSession.sharedState().cacheManager()
        return cm.lookupCachedData(jplan).isDefined()
    except Exception:
        return False


def _substitute_views(
    spark, view_name: str, plan: PlanNode, jplan, hash_to_view: dict[int, str]
) -> PlanNode:
    """Lockstep JSON/JVM walk replacing subtrees that semantically equal
    another view with a synthetic TempViewNode leaf; also marks cached
    subtrees (``_cached`` in raw)."""

    def rec(p: PlanNode, jp) -> PlanNode:
        try:
            h = jp.semanticHash()
        except Exception:
            h = None
        other = hash_to_view.get(h)
        if other and other != view_name:
            out = p.output()
            return PlanNode(
                "TempViewNode", {"viewName": other, "_output": out, "num-children": 0}, []
            )
        if _is_cached(spark, jp):
            p.raw["_cached"] = True
        if not p.children:
            ident = jvm_leaf_ident(jp)
            if ident:
                p.raw["_ident"] = ident
            stats = jvm_leaf_stats(jp)
            if stats:
                p.raw["_stats"] = stats
        if p.cls == "Generate":
            try:
                seq = jp.unrequiredChildIndex()
                p.raw["_unrequired"] = [seq.apply(i) for i in range(seq.size())]
            except Exception:
                pass
        jkids = jp.children()
        p.children = [rec(c, jkids.apply(i)) for i, c in enumerate(p.children)]
        return p

    return rec(plan, jplan)


def _list_view_names(spark) -> list[str]:
    """Every temp view + every database's permanent views (reference
    SQLFlow.scala:61-84 enumerates catalog.listDatabases × listTables and
    keeps entries with a viewText, plus getTempViewNames)."""
    names: list[str] = []
    seen: set[str] = set()

    def add(t) -> None:
        name = (
            t.name
            if t.isTemporary or not t.namespace
            else ".".join([*t.namespace, t.name])
        )
        if name not in seen:
            seen.add(name)
            names.append(name)

    try:
        dbs = [d.name for d in spark.catalog.listDatabases()]
    except Exception:
        dbs = []
    for db in dbs:
        try:
            tables = spark.catalog.listTables(db)
        except Exception:
            continue
        for t in tables:
            if t.tableType in ("TEMPORARY", "VIEW") or t.isTemporary:
                add(t)
    for t in spark.catalog.listTables():  # current-db + temp views safety net
        if t.tableType in ("TEMPORARY", "VIEW") or t.isTemporary:
            add(t)
    return names


def _view_df(spark, name: str):
    """DataFrame for a view: direct resolution, falling back to re-parsing
    the stored ``viewText`` (reference SQLFlow.scala:66-74 — a permanent
    view whose plan can't be loaded directly is re-analyzed from its SQL
    text)."""
    try:
        return spark.table(name)
    except Exception:
        pass
    jss = spark._jsparkSession.sessionState()
    ident = jss.sqlParser().parseTableIdentifier(name)
    meta = jss.catalog().getTableMetadata(ident)
    view_text = meta.viewText()
    if not view_text.isDefined():
        raise ValueError(f"{name} has no viewText")
    return spark.sql(view_text.get())


def catalog_lineage(
    spark, contracted: bool = False
) -> tuple[list[GraphNode], list[GraphEdge]]:
    views = _list_view_names(spark)
    dfs = {}
    hash_to_view: dict[int, str] = {}
    for v in views:
        try:
            df = _view_df(spark, v)
            jplan = df._jdf.queryExecution().optimizedPlan()
            dfs[v] = (df, jplan)
            hash_to_view.setdefault(jplan.semanticHash(), v)
        except Exception:
            continue

    nodes: dict[str, GraphNode] = {}
    edges: list[GraphEdge] = []
    for v, (df, jplan) in dfs.items():
        plan = optimized_plan_tree(df)
        plan = _substitute_views(spark, v, plan, jplan, hash_to_view)

        view_node = GraphNode(
            v,
            v,
            [f.name for f in df.schema.fields],
            df.schema.simpleString(),
            NodeType.VIEW,
            is_cached=_is_cached(spark, jplan),
        )

        if contracted:
            sub_nodes, sub_edges, col_sources = _contracted_view(df, plan, v)
        else:
            sub_nodes, sub_edges, col_sources = _expanded_view(df, plan)

        for n in sub_nodes:
            nodes.setdefault(n.unique_id, n)
        edges.extend(sub_edges)
        nodes[view_node.unique_id] = view_node
        for i, sources in enumerate(col_sources):
            for src_uid, src_idx in sources:
                edges.append(GraphEdge(src_uid, src_idx, v, i))
    return list(nodes.values()), edges


class _CatalogExtractor(LineageExtractor):
    """Adds TempViewNode identity + cached flag to the expanded extractor."""

    def _node_type(self, plan: PlanNode) -> NodeType:
        if plan.cls == "TempViewNode":
            return NodeType.VIEW
        return super()._node_type(plan)

    def _identify(self, plan: PlanNode):
        if plan.cls == "TempViewNode":
            name = plan.raw["viewName"]
            return name, name
        return super()._identify(plan)

    def _make_node(self, plan: PlanNode) -> GraphNode:
        node = super()._make_node(plan)
        if plan.raw.get("_cached"):
            node.is_cached = True
        return node


def _expanded_view(df, plan: PlanNode):
    """(nodes, edges, per-output-ordinal source list) — each view output
    column has exactly one source: the plan root's same ordinal."""
    ex = _CatalogExtractor([])
    root = ex.traverse(plan)
    col_sources = [[(root.unique_id, i)] for i in range(len(root.attribute_names))]
    return list(ex.nodes.values()), ex.edges, col_sources


def _contracted_view(df, plan: PlanNode, view_name: str):
    """Leaf nodes only; view output columns trace to source table columns
    through the forward exprId closure, with the same whole-node fallback
    and subquery traversal as query-level contraction."""
    ex = _CatalogExtractor([])
    out_map = {eid: i for i, (_, eid) in enumerate(plan.output())}
    nodes: dict[str, GraphNode] = {}
    edges: list[GraphEdge] = []
    contracted_mod._contract_plan(plan, out_map, ex, nodes, edges, view_name, set())
    return list(nodes.values()), edges, []
