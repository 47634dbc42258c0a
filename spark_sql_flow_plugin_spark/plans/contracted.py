"""Contracted-mode lineage: only table/view/query nodes survive; every
intermediate operator is collapsed by transitively closing an
``exprId → {exprId}`` reference map (reference SQLContractedFlow,
SQLFlow.scala:606-837, closure at :801-830 with depth cap 128).
"""

from __future__ import annotations

from .catalyst import PlanNode, parse_expr_list
from .graph import GraphEdge, GraphNode, NodeType
from .lineage import LineageExtractor, _rand_id, annotate_leaves, semantic_hash
from .catalyst import optimized_plan_tree

_MAX_DEPTH = 128


def _collect_ref_map(plan: PlanNode, ref_map: dict[int, set[int]]) -> None:
    """Populate eid → referenced-eids for operators that *create* attributes;
    identity operators need no entries (their outputs are input exprIds)."""
    cls = plan.cls
    if cls in ("Project", "Aggregate"):
        fieldname = "projectList" if cls == "Project" else "aggregateExpressions"
        for e in plan.exprs(fieldname):
            eid = e.expr_id
            if eid is None:
                continue
            refs = {r for _, r in e.references() if r != eid}
            if refs:
                ref_map.setdefault(eid, set()).update(refs)
    elif cls == "Window":
        for e in plan.exprs("windowExpressions"):
            eid = e.expr_id
            if eid is None:
                continue
            refs = {r for _, r in e.references() if r != eid}
            if refs:
                ref_map.setdefault(eid, set()).update(refs)
    elif cls == "Generate":
        gen_refs = {r for g in plan.exprs("generator") for _, r in g.references()}
        for a in plan.exprs("generatorOutput"):
            if a.expr_id is not None and gen_refs:
                ref_map.setdefault(a.expr_id, set()).update(gen_refs)
    elif cls == "Expand":
        out = plan.output()
        for proj_row in plan.raw.get("projections") or []:
            for i, flat in enumerate(proj_row):
                if i >= len(out) or not isinstance(flat, list) or not flat:
                    continue
                eid = out[i][1]
                refs = {r for _, r in parse_expr_list(flat).references() if r != eid}
                if refs:
                    ref_map.setdefault(eid, set()).update(refs)
    elif cls == "Union":
        out = plan.output()
        for child in plan.children:
            for i, (_, ceid) in enumerate(child.output()):
                if i < len(out) and ceid != out[i][1]:
                    ref_map.setdefault(out[i][1], set()).add(ceid)
    elif cls == "Join":
        # equi-join condition attrs link mutually (reference JoinWithCondition
        # analog, SQLFlow.scala:638-657): a table whose key filters another
        # table's rows is upstream of it in contracted view
        for cond in plan.exprs("condition"):
            for node in cond.walk():
                if node.cls == "EqualTo" and len(node.children) == 2:
                    l_refs = [e for _, e in node.children[0].references()]
                    r_refs = [e for _, e in node.children[1].references()]
                    for a in l_refs:
                        for b in r_refs:
                            ref_map.setdefault(a, set()).add(b)
                            ref_map.setdefault(b, set()).add(a)
    for c in plan.children:
        _collect_ref_map(c, ref_map)


def _resolve(
    eid: int, ref_map: dict[int, set[int]], leaf_cols: dict[int, tuple[str, int]]
) -> set[tuple[str, int]]:
    """Transitive closure with cycle guard: eid → {(leaf uid, ordinal)}."""
    out: set[tuple[str, int]] = set()
    seen: set[int] = set()
    stack = [(eid, 0)]
    while stack:
        cur, depth = stack.pop()
        if cur in seen or depth > _MAX_DEPTH:
            continue
        seen.add(cur)
        if cur in leaf_cols:
            out.add(leaf_cols[cur])
        for nxt in ref_map.get(cur, ()):
            stack.append((nxt, depth + 1))
    return out


def extract_contracted_lineage(
    df, flow_name: str | None = None
) -> tuple[list[GraphNode], list[GraphEdge]]:
    """Leaf tables + query node only, with direct column edges."""
    if df.isStreaming:
        from .catalyst import analyzed_plan_tree

        jplan = df._jdf.queryExecution().analyzed()
        plan = analyzed_plan_tree(df)
    else:
        jplan = df._jdf.queryExecution().optimizedPlan()
        plan = optimized_plan_tree(df)
    annotate_leaves(plan, jplan)
    return contracted_from_tree(plan, flow_name, jplan=jplan)


def contracted_from_tree(
    plan: PlanNode, flow_name: str | None = None, jplan=None
) -> tuple[list[GraphNode], list[GraphEdge]]:
    """Contract an (already annotated) plan tree — shared by the DataFrame
    path and the listener's JVM-plan path."""
    # leaf nodes (reuse expanded-mode identity rules on a leaf-only walk)
    ex = LineageExtractor([])
    leaf_nodes: list[GraphNode] = []
    leaf_cols: dict[int, tuple[str, int]] = {}
    for p in plan.walk():
        if p.is_leaf:
            node = ex._make_node(p)
            leaf_nodes.append(node)
            for i, (_, eid) in enumerate(p.output()):
                leaf_cols.setdefault(eid, (node.unique_id, i))

    ref_map: dict[int, set[int]] = {}
    _collect_ref_map(plan, ref_map)

    qname = flow_name or f"query_{semantic_hash(jplan=jplan)}"
    out = plan.output()
    qnode = GraphNode(
        f"{qname}_{_rand_id()}" if flow_name is None else qname,
        qname,
        [n for n, _ in out],
        ", ".join(n for n, _ in out),
        NodeType.QUERY,
    )
    edges: list[GraphEdge] = []
    seen_edges: set[tuple[str, int, int]] = set()
    for i, (_, eid) in enumerate(out):
        for leaf_uid, leaf_idx in _resolve(eid, ref_map, leaf_cols):
            key = (leaf_uid, leaf_idx, i)
            if key not in seen_edges:
                seen_edges.add(key)
                edges.append(GraphEdge(leaf_uid, leaf_idx, qnode.unique_id, i))
    return leaf_nodes + [qnode], edges
