"""Expanded-mode column-level lineage extraction.

Python re-expression of the reference's per-operator edge rules
(SQLFlow.scala:357-479 ``collectEdgesInPlan`` + :574-603
``traversePlanRecursively`` + :49-59 ``planToSQLFlow``):

| operator | rule |
|---|---|
| Aggregate/Project        | output ordinal i ← refs of i-th named expr |
| Generate                 | child passthrough by position; generator outputs ← generator refs |
| Expand                   | output ordinal i ← refs of every projection's i-th expr |
| Union                    | positional from every child |
| Join (semi/anti/exist)   | left passthrough; right cond attrs → compared left cols |
| Join (other)             | left++right positional |
| FlatMapGroupsInPandas…   | positional passthrough |
| default (Filter/Sort/…)  | identity: output attr that IS an input attr |
| no edges derived         | whole-node fallback from every input column |
| subquery expressions     | subquery plan traversed; its root columns → outer node |

Node identity follows SQLFlow.scala:202-220: catalog tables keep their
qualified name, joins become ``Join_<type>_<7hex>``, every other operator
``<nodeName>_<7hex>``.
"""

from __future__ import annotations

import hashlib
import uuid

from .catalyst import ExprNode, PlanNode, optimized_plan_tree, parse_plan_list
from .graph import GraphEdge, GraphNode, NodeType

#: Catalyst BinaryComparison subclasses (SubqueryPredicate matches any,
#: SQLFlow.scala:481-493; shared with the contracted-mode join rule)
_BINARY_COMPARISONS = {
    "EqualTo",
    "EqualNullSafe",
    "LessThan",
    "LessThanOrEqual",
    "GreaterThan",
    "GreaterThanOrEqual",
}

#: subquery expression node classes (mirrors catalyst.subquery_plans)
_SUBQUERY_EXPR_CLASSES = ("ScalarSubquery", "Exists", "ListQuery", "LateralSubquery")

_PASSTHROUGH_PANDAS = {
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "FlatMapGroupsInArrow",
}

_TABLE_CLASSES = {
    "LogicalRelation",
    "LocalRelation",
    "InMemoryRelation",
    "HiveTableRelation",
    # createDataFrame over local rows serializes as an RDD-backed leaf
    "LogicalRDD",
    "ExternalRDD",
    # unstarted streaming sources are leaf scans too (reference has no
    # streaming support — NEW surface, classified like their batch twins)
    "StreamingRelation",
    "StreamingRelationV2",
    "StreamingExecutionRelation",
    # a memory-sink streaming result read back via spark.table(name) —
    # the downstream half of a streaming pipeline is a table scan too
    "MemoryPlan",
    # DSv2 scans, incl. Spark 4 custom Python DataSources (sources.synthetic)
    "DataSourceV2Relation",
    "DataSourceV2ScanRelation",
}
_VIEW_CLASSES = {"View", "TempViewNode"}


def _rand_id() -> str:
    return uuid.uuid4().hex[:7]


def semantic_hash(df=None, jplan=None, fallback: str | None = None) -> str:
    """7-hex-char SHA-256 of the canonicalized plan (SQLFlow.scala:938-944);
    dedups semantically-equal plans across queries."""
    try:
        p = jplan if jplan is not None else df._jdf.queryExecution().optimizedPlan()
        canon = p.canonicalized().toString()
    except Exception:
        canon = fallback or uuid.uuid4().hex
    return hashlib.sha256(canon.encode()).hexdigest()[:7]


def jvm_leaf_ident(leaf) -> str:
    """Identity of one JVM scan leaf: catalog table → qualified name;
    path-based relation → file path; else empty."""
    ct = _jvm_catalog_table(leaf)
    if ct is not None:
        try:
            return ct.qualifiedName()
        except Exception:
            pass
    try:
        paths = leaf.relation().location().rootPaths()
        if paths.size() > 0:
            return paths.apply(0).toString()
    except Exception:
        pass
    return ""


def jvm_leaf_stats(leaf) -> dict[str, str]:
    """sizeInBytes / rowCount / createTime node props from
    ``LeafNode.computeStats()`` + the catalog-table metadata (reference
    SQLFlow.scala:288-314, setPlanPropsIn)."""
    props: dict[str, str] = {}
    try:
        stats = leaf.stats()
        props["sizeInBytes"] = str(stats.sizeInBytes())  # py4j converts BigInt → int
        rc = stats.rowCount()
        if rc.isDefined():
            props["rowCount"] = str(rc.get())
    except Exception:
        pass
    ct = _jvm_catalog_table(leaf)
    if ct is not None:
        try:
            from datetime import datetime, timezone

            millis = ct.createTime()
            props["createTime"] = (
                datetime.fromtimestamp(millis / 1000.0, tz=timezone.utc)
                .isoformat(timespec="milliseconds")
                .replace("+00:00", "Z")
            )
        except Exception:
            pass
    return props


def _jvm_catalog_table(leaf):
    """CatalogTable of a scan leaf: LogicalRelation exposes
    ``catalogTable(): Option``, HiveTableRelation ``tableMeta()``."""
    try:
        ct = leaf.catalogTable()
        if ct.isDefined():
            return ct.get()
    except Exception:
        pass
    try:
        return leaf.tableMeta()
    except Exception:
        return None


def _leaf_idents(df) -> list[str]:
    """Scan-leaf identities in pre-order (matches the JSON tree's leaf
    order); empty string → caller falls back to nodeName+id."""
    try:
        jleaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        return [jvm_leaf_ident(jleaves.apply(i)) for i in range(jleaves.size())]
    except Exception:
        return []


def _strip_expr_ids(obj):
    """Canonicalize a raw JSON plan dict for semantic hashing: drop exprId /
    jvmId / qualifier / metadata so two runs of the same query hash alike
    (approximates Catalyst's canonicalized-plan hash, SQLFlow.scala:938-944)."""
    if isinstance(obj, dict):
        return {
            k: _strip_expr_ids(v)
            for k, v in obj.items()
            if k not in ("exprId", "jvmId", "qualifier", "metadata")
        }
    if isinstance(obj, list):
        return [_strip_expr_ids(v) for v in obj]
    return obj


def plan_semantic_hash(plan: PlanNode) -> str:
    import json

    payload = json.dumps(
        [_strip_expr_ids(p.raw) for p in plan.walk()], sort_keys=True, default=str
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:7]


class LineageExtractor:
    """Bottom-up walk of one optimized plan → (nodes, edges)."""

    def __init__(self, leaf_idents: list[str] | None = None):
        self.nodes: dict[str, GraphNode] = {}
        self.edges: list[GraphEdge] = []
        self._leaf_idents = list(leaf_idents or [])
        self._leaf_cursor = 0
        self._cached_ids: set[str] = set()

    # -- node identity (SQLFlow.scala:202-220, 323-333) ----------------------

    def _node_type(self, plan: PlanNode) -> NodeType:
        if plan.cls in _TABLE_CLASSES:
            return NodeType.TABLE
        if plan.cls in _VIEW_CLASSES:
            return NodeType.VIEW
        if plan.cls in ("Range", "OneRowRelation"):
            # OneRowRelation backs VALUES-less scalar sources and SQL
            # table-function bodies (SELECT explode(...) with no FROM) —
            # a leaf by construction, classified like Range so contraction
            # keeps it instead of leaking a PlanNode into the backbone.
            return NodeType.LEAF_PLAN
        if plan.cls == "UnionLoopRef":
            # recursive CTE (Spark 4): the loop's self-reference is a leaf
            # by construction (it scans the previous iteration, not a
            # table) — classified like Range so contraction keeps it.
            # Reference parity n/a: Spark 3.2 had no recursive CTE.
            return NodeType.LEAF_PLAN
        return NodeType.PLAN

    def _identify(self, plan: PlanNode) -> tuple[str, str]:
        """(unique_id, ident) for a plan node."""
        if plan.is_leaf:
            ident = plan.raw.get("_ident", "")
            if not ident and self._leaf_cursor < len(self._leaf_idents):
                ident = self._leaf_idents[self._leaf_cursor]
            self._leaf_cursor += 1
            if ident:
                return ident, ident
            return f"{plan.node_name()}_{_rand_id()}", plan.node_name()
        if plan.cls == "Join":
            name = f"Join_{plan.join_type}"
            return f"{name}_{_rand_id()}", name
        name = plan.node_name()
        return f"{name}_{_rand_id()}", name

    def _make_node(self, plan: PlanNode) -> GraphNode:
        uid, ident = self._identify(plan)
        attrs = [name for name, _ in plan.output()]
        schema = ", ".join(attrs)
        node = GraphNode(uid, ident, attrs, schema, self._node_type(plan))
        if node.tpe in (NodeType.PLAN, NodeType.LEAF_PLAN):
            node.props["semanticHash"] = plan_semantic_hash(plan)
        if plan.raw.get("_stats"):
            node.props.update(plan.raw["_stats"])
        self.nodes[uid] = node
        return node

    # -- edge rules -----------------------------------------------------------

    def _collect_edges(
        self, plan: PlanNode, node: GraphNode, child_nodes: list[GraphNode]
    ) -> None:
        # exprId → (child uid, ordinal) over all children
        ref_map: dict[int, tuple[str, int]] = {}
        child_outputs = [c.output() for c in plan.children]
        for child_node, out in zip(child_nodes, child_outputs):
            for idx, (_, eid) in enumerate(out):
                ref_map.setdefault(eid, (child_node.unique_id, idx))

        edges: list[GraphEdge] = []

        def add(eid: int, to_idx: int | None):
            src = ref_map.get(eid)
            if src:
                edges.append(GraphEdge(src[0], src[1], node.unique_id, to_idx))

        cls = plan.cls
        if cls in ("Aggregate", "Project"):
            fieldname = "aggregateExpressions" if cls == "Aggregate" else "projectList"
            for i, e in enumerate(plan.exprs(fieldname)):
                for _, eid in e.references():
                    add(eid, i)
        elif cls == "Generate":
            out = plan.output()
            gen_exprs = plan.exprs("generator")
            gen_out_n = len(plan.exprs("generatorOutput"))
            n_pass = len(out) - gen_out_n
            # pass-through child columns by position
            for i, (_, eid) in enumerate(out[:n_pass]):
                add(eid, i)
            # every generator output column ← the generator's referenced attrs
            gen_refs = [eid for g in gen_exprs for _, eid in g.references()]
            for i in range(n_pass, len(out)):
                for eid in gen_refs:
                    add(eid, i)
        elif cls == "Expand":
            # projections is Seq[Seq[Expression]]: JSON list (rows) of lists
            # (exprs) of flat expr-node lists — parse each inner tree directly
            from .catalyst import parse_expr_list

            seen: set[tuple[int, int]] = set()
            for proj_row in plan.raw.get("projections") or []:
                for i, flat in enumerate(proj_row):
                    if not isinstance(flat, list) or not flat:
                        continue
                    for _, eid in parse_expr_list(flat).references():
                        if (eid, i) not in seen:
                            seen.add((eid, i))
                            add(eid, i)
        elif cls == "Union":
            out_n = len(plan.output())
            for child_node, child_out in zip(child_nodes, child_outputs):
                for i in range(min(out_n, len(child_out))):
                    edges.append(
                        GraphEdge(child_node.unique_id, i, node.unique_id, i)
                    )
        elif cls == "Join" and plan.join_type in ("LeftSemi", "LeftAnti", "ExistenceJoin"):
            left_out = child_outputs[0]
            left_ids = {eid for _, eid in left_out}
            for i, (_, eid) in enumerate(plan.output()):
                add(eid, i)
            # right-side condition attrs feed the left columns they compare to
            for cond in plan.exprs("condition"):
                refs = cond.references()
                right_refs = [eid for _, eid in refs if eid not in left_ids]
                left_refs = [
                    i
                    for i, (_, eid) in enumerate(left_out)
                    if eid in {e for _, e in refs}
                ]
                for eid in right_refs:
                    for li in left_refs:
                        add(eid, li)
        elif cls == "Join":
            for i, (_, eid) in enumerate(plan.output()):
                add(eid, i)
        elif cls in ("BatchEvalPythonUDTF", "ArrowEvalPythonUDTF"):
            # LATERAL Python UDTF: requiredChildOutput columns pass through
            # by identity; every UDTF result column derives from the UDTF
            # call's argument references
            req = plan.exprs("requiredChildOutput")
            res = plan.exprs("resultAttrs")
            for i, a in enumerate(req):
                if a.expr_id is not None:
                    add(a.expr_id, i)
            refs = [
                eid
                for e in plan.exprs("udtf")
                for _, eid in e.references()
            ]
            for j in range(len(res)):
                for eid in refs:
                    add(eid, len(req) + j)
        elif cls in _PASSTHROUGH_PANDAS or cls in ("MapInPandas", "MapInArrow", "PythonMapInArrow"):
            child_out = child_outputs[0] if child_outputs else []
            for i in range(min(len(plan.output()), len(child_out))):
                edges.append(GraphEdge(child_nodes[0].unique_id, i, node.unique_id, i))
        else:  # default identity rule (Filter, Sort, Limit, Window, ...)
            for i, (_, eid) in enumerate(plan.output()):
                add(eid, i)

        if not edges:  # whole-node fallback (SQLFlow.scala:466-478)
            for child_node, child_out in zip(child_nodes, child_outputs):
                for i in range(len(child_out)):
                    edges.append(GraphEdge(child_node.unique_id, i, node.unique_id, None))

        self.edges.extend(edges)

    def _collect_subquery_edges(self, plan: PlanNode, node: GraphNode) -> None:
        """Traverse subquery expression plans; wire their root columns into
        the outer node (SQLFlow.scala:481-562, SubqueryPredicate +
        collectEdgesInExprs analogs):

        - Filter whose condition compares a subquery against outer
          attributes: edges target the compared attributes' ordinals in the
          Filter's output (column-level, not whole-node);
        - Project/Aggregate with a subquery inside a named expression: edges
          target that expression's output ordinal;
        - anything else: whole-node edges (``to_idx=None``).

        Prefers the annotate_plan-cached subquery trees in ``_subplans``
        (they carry leaf identities); the cache is consumed in the same
        field-then-walk order annotate_plan built it in."""
        cached = plan.raw.get("_subplans")
        cursor = 0
        out_map = {eid: i for i, (_, eid) in enumerate(plan.output())}

        def emit(parsed_sp: PlanNode, targets: list[int] | None) -> None:
            nonlocal cursor
            sp = parsed_sp
            if cached is not None and cursor < len(cached):
                sp = cached[cursor]
            cursor += 1
            sub_root = self.traverse(sp)
            for i in range(len(sub_root.attribute_names)):
                for t in targets or [None]:
                    self.edges.append(
                        GraphEdge(sub_root.unique_id, i, node.unique_id, t)
                    )

        def has_subquery(e) -> bool:
            return any(n.cls in _SUBQUERY_EXPR_CLASSES for n in e.walk())

        def walk(n, targets: list[int] | None) -> None:
            if n.cls in _BINARY_COMPARISONS and len(n.children) == 2:
                # comparison against a subquery: the subquery's columns feed
                # the outer attributes on the other side of the comparison
                flags = [has_subquery(c) for c in n.children]
                for i, c in enumerate(n.children):
                    if flags[i] and not flags[1 - i]:
                        other_refs = [
                            out_map[eid]
                            for _, eid in n.children[1 - i].references()
                            if eid in out_map
                        ]
                        walk(c, other_refs or None)
                    else:
                        walk(c, targets)
                return
            if n.cls in _SUBQUERY_EXPR_CLASSES:
                raw_plan = n.raw.get("plan")
                if isinstance(raw_plan, list) and raw_plan:
                    emit(parse_plan_list(raw_plan), targets)
            for c in n.children:
                walk(c, targets)

        for fieldname in ("condition", "projectList", "aggregateExpressions"):
            exprs = plan.exprs(fieldname)
            if fieldname == "condition":
                for e in exprs:
                    walk(e, None)
            else:
                # named expressions: every subquery inside expression j
                # feeds output column j (collectEdgesInExprs, :504-517)
                for j, e in enumerate(exprs):
                    target = [j] if j < len(plan.output()) else None
                    walk(e, target if has_subquery(e) else None)

    # -- traversal -------------------------------------------------------------

    def traverse(self, plan: PlanNode) -> GraphNode:
        child_nodes = [self.traverse(c) for c in plan.children]
        node = self._make_node(plan)
        if plan.children:
            self._collect_edges(plan, node, child_nodes)
        self._collect_subquery_edges(plan, node)
        return node


def _extract_from_tree(
    plan: PlanNode,
    leaf_idents: list[str],
    qname: str,
    explicit_name: bool,
    props: dict[str, str] | None = None,
) -> tuple[list[GraphNode], list[GraphEdge]]:
    ex = LineageExtractor(leaf_idents)
    root = ex.traverse(plan)
    qnode = GraphNode(
        qname if explicit_name else f"{qname}_{_rand_id()}",
        qname,
        list(root.attribute_names),
        root.schema_ddl,
        NodeType.QUERY,
        props=dict(props or {}),
    )
    ex.nodes[qnode.unique_id] = qnode
    for i in range(len(root.attribute_names)):
        ex.edges.append(GraphEdge(root.unique_id, i, qnode.unique_id, i))
    return list(ex.nodes.values()), ex.edges


def annotate_plan(plan: PlanNode, jplan) -> None:
    """Lockstep JVM/JSON walk attaching what ``toJSON`` can't express:

    - leaves: ``_ident`` (catalog/table/path identity) + ``_stats``;
    - Generate: ``_unrequired`` (``unrequiredChildIndex`` serializes as
      JSON null, but it decides which child columns survive the operator).

    Both trees are the same optimized plan, so pre-order aligns. Subquery
    expression plans aren't visited (they're expressions on the JVM side).
    """

    def rec(p: PlanNode, jp) -> None:
        if p.is_leaf:
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
        # subquery expression plans: annotate + cache so the edge collector
        # reuses the annotated trees (leaf identity inside subqueries)
        subs = []
        for f in ("condition", "projectList", "aggregateExpressions"):
            for e in p.exprs(f):
                subs.extend(e.subquery_plans())
        if subs:
            try:
                jsubs = jp.subqueries()
                for i, sp in enumerate(subs):
                    if i < jsubs.size():
                        rec(sp, jsubs.apply(i))
                p.raw["_subplans"] = subs
            except Exception:
                pass
        try:
            jkids = jp.children()
            for i, c in enumerate(p.children):
                rec(c, jkids.apply(i))
        except Exception:
            pass

    try:
        rec(plan, jplan)
    except Exception:
        pass


#: backwards-compatible alias (leaf-only annotation grew into a full pass)
annotate_leaves = annotate_plan


def extract_lineage(
    df, flow_name: str | None = None
) -> tuple[list[GraphNode], list[GraphEdge]]:
    """planToSQLFlow equivalent: optimized plan → (plan nodes + query sink
    node, column edges). The root's columns wire 1:1 into the query node.

    Streaming DataFrames use the *analyzed* plan (Spark refuses to optimize
    an un-started streaming query), so their lineage is available before
    ``writeStream.start()``."""
    if df.isStreaming:
        from .catalyst import analyzed_plan_tree

        jplan = df._jdf.queryExecution().analyzed()
        plan = analyzed_plan_tree(df)
    else:
        jplan = df._jdf.queryExecution().optimizedPlan()
        plan = optimized_plan_tree(df)
    annotate_leaves(plan, jplan)
    qname = flow_name or f"query_{semantic_hash(jplan=jplan)}"
    return _extract_from_tree(plan, [], qname, flow_name is not None)


def extract_lineage_from_jplan(
    jplan, flow_name: str | None = None, props: dict[str, str] | None = None
) -> tuple[list[GraphNode], list[GraphEdge]]:
    """Listener-mode entry: extract from a JVM optimized-plan handle
    (a QueryExecution's optimizedPlan) instead of a DataFrame."""
    from .catalyst import parse_plan_json

    plan = parse_plan_json(jplan.toJSON())
    annotate_leaves(plan, jplan)
    qname = flow_name or f"query_{semantic_hash(jplan=jplan)}"
    return _extract_from_tree(plan, [], qname, flow_name is not None, props)
