"""Neo4j (Aura) sink — reference sink/Neo4jAuraSink.scala:94-254.

Graph mapping:
- nodes get labels Table/View/Plan/LeafPlan/Query (from NodeType);
- uniqueness: ``uid`` for Table/View/Query nodes, ``semanticHash`` for plan
  nodes (plans that appear in many queries merge into one graph node);
- edges are ``[:transformInto]`` relationships whose ``dstNodeIds`` property
  accumulates every downstream Query/View reachable within depth 128
  (reference :176-198), so "which queries read this column" is a property
  lookup instead of a traversal.

The Cypher generation below is pure and unit-testable; the network part is
gated behind the ``neo4j`` Python driver (reference bin/requirements.txt:4),
which is optional in this environment.
"""

from __future__ import annotations

from collections import deque

from ..plans.graph import GraphEdge, GraphNode, NodeType

_LABEL = {
    NodeType.TABLE: "Table",
    NodeType.VIEW: "View",
    NodeType.PLAN: "Plan",
    NodeType.LEAF_PLAN: "LeafPlan",
    NodeType.QUERY: "Query",
}

_MAX_BFS_DEPTH = 128

CONSTRAINTS = [
    "CREATE CONSTRAINT unique_table_uid IF NOT EXISTS FOR (n:Table) REQUIRE n.uid IS UNIQUE",
    "CREATE CONSTRAINT unique_view_uid IF NOT EXISTS FOR (n:View) REQUIRE n.uid IS UNIQUE",
    "CREATE CONSTRAINT unique_query_uid IF NOT EXISTS FOR (n:Query) REQUIRE n.uid IS UNIQUE",
    "CREATE CONSTRAINT unique_plan_hash IF NOT EXISTS FOR (n:Plan) REQUIRE n.semanticHash IS UNIQUE",
    "CREATE CONSTRAINT unique_leafplan_hash IF NOT EXISTS FOR (n:LeafPlan) REQUIRE n.semanticHash IS UNIQUE",
]


def _merge_key(n: GraphNode) -> tuple[str, str]:
    """(property, value) that uniquely identifies ``n`` in the graph: plan
    nodes merge on semanticHash (the same operator subtree appearing in many
    queries becomes ONE node — reference Neo4jAuraSink.scala:166-171); every
    other node type merges on uid."""
    if n.tpe in (NodeType.PLAN, NodeType.LEAF_PLAN):
        return "semanticHash", n.props.get("semanticHash", n.unique_id)
    return "uid", n.unique_id


def downstream_sink_ids(edges: list[GraphEdge], nodes: list[GraphNode]) -> dict[str, list[str]]:
    """For each node: the Query/View node ids reachable downstream (BFS,
    depth ≤ 128) — becomes the edges' ``dstNodeIds`` property."""
    by_id = {n.unique_id: n for n in nodes}
    adj: dict[str, set[str]] = {}
    for e in edges:
        adj.setdefault(e.from_id, set()).add(e.to_id)
    out: dict[str, list[str]] = {}
    for start in by_id:
        seen, sinks = {start}, set()
        q = deque([(start, 0)])
        while q:
            cur, d = q.popleft()
            if d >= _MAX_BFS_DEPTH:
                continue
            for nxt in adj.get(cur, ()):
                if nxt in seen:
                    continue
                seen.add(nxt)
                node = by_id.get(nxt)
                if node and node.tpe in (NodeType.QUERY, NodeType.VIEW):
                    sinks.add(nxt)
                q.append((nxt, d + 1))
        out[start] = sorted(sinks)
    return out


def node_merge_statements(nodes: list[GraphNode]) -> list[tuple[str, dict]]:
    """One MERGE per node. ``uid`` is always written as a regular property
    (even on plan nodes, whose merge key is semanticHash) and the node's
    ``props`` dict — listener durationMs/timestamp, leaf sizeInBytes/rowCount,
    query semanticHash — is appended with ``n += $props`` so every prop the
    reference's genProps emits (Neo4jAuraSink.scala:112-121) reaches the DB."""
    stmts = []
    for n in nodes:
        key, key_val = _merge_key(n)
        stmts.append(
            (
                f"MERGE (n:{_LABEL[n.tpe]} {{{key}: $key}}) "
                "SET n.name = $name, n.uid = $uid, n.attributes = $attrs, "
                "n.schemaDDL = $ddl, n.cached = $cached, n += $props",
                {
                    "key": key_val,
                    "uid": n.unique_id,
                    "name": n.ident,
                    "attrs": list(n.attribute_names),
                    "ddl": n.schema_ddl,
                    "cached": n.is_cached,
                    "props": {k: str(v) for k, v in n.props.items()},
                },
            )
        )
    return stmts


def edge_merge_statements(
    nodes: list[GraphNode], edges: list[GraphEdge]
) -> list[tuple[str, dict]]:
    by_id = {n.unique_id: n for n in nodes}
    dst_ids = downstream_sink_ids(edges, nodes)
    stmts = []
    seen: set[tuple[str, str]] = set()
    for e in edges:
        pair = (e.from_id, e.to_id)
        if pair in seen:
            continue
        seen.add(pair)
        src, dst = by_id.get(e.from_id), by_id.get(e.to_id)
        if src is None or dst is None:
            continue
        # Match each endpoint by ITS merge key: plan nodes were MERGEd on
        # semanticHash, so matching them by uid would find nothing and the
        # edge would silently vanish (reference Neo4jAuraSink.scala:160-171
        # picks the predicate per node type the same way). dstNodeIds
        # accumulates across appends — a plan node shared by many queries
        # (merged by semanticHash) must keep EVERY downstream query id, so
        # ON MATCH concatenates and dedups instead of overwriting.
        (src_key, src_val), (dst_key, dst_val) = _merge_key(src), _merge_key(dst)
        stmts.append(
            (
                f"MATCH (a:{_LABEL[src.tpe]} {{{src_key}: $from_key}}), "
                f"(b:{_LABEL[dst.tpe]} {{{dst_key}: $to_key}}) "
                "MERGE (a)-[r:transformInto]->(b) "
                "ON CREATE SET r.dstNodeIds = $dst_ids "
                "ON MATCH SET r.dstNodeIds = reduce(acc = [], x IN r.dstNodeIds + $dst_ids | "
                "CASE WHEN x IN acc THEN acc ELSE acc + x END)",
                {
                    "from_key": src_val,
                    "to_key": dst_val,
                    "dst_ids": dst_ids.get(e.from_id, []),
                },
            )
        )
    return stmts


#: exception class names the bolt driver raises for failures that are safe
#: to retry after the transaction rolled back (neo4j.exceptions hierarchy)
_TRANSIENT = ("TransientError", "ServiceUnavailable", "SessionExpired")


def _is_transient(exc: Exception) -> bool:
    if exc.__class__.__name__ in _TRANSIENT:
        return True
    retryable = getattr(exc, "is_retryable", None)
    return bool(retryable()) if callable(retryable) else False


class Neo4jAuraSink:
    """Batch ``write`` requires an empty database unless ``overwrite``;
    streaming ``append`` merges into the existing graph (reference
    :220-253).

    Failure semantics mirror the reference's ``withTx``
    (Neo4jAuraSink.scala:55-69): each statement batch runs in ONE explicit
    transaction — a failure anywhere rolls the whole batch back (no
    half-written graph) and surfaces as RuntimeError. Transient bolt
    errors (leader switch, session expiry) retry the rolled-back batch up
    to ``MAX_TX_ATTEMPTS`` times; client errors (constraint violation,
    bad Cypher) never retry. Because every statement is a MERGE, a
    retried or re-appended batch is idempotent.
    """

    MAX_TX_ATTEMPTS = 3

    def __init__(self, uri: str, user: str, password: str):
        self.uri, self.user, self.password = uri, user, password

    def _driver(self):
        try:
            import neo4j
        except ImportError as exc:
            raise NotImplementedError(
                "Neo4j export needs the `neo4j` Python driver on the cluster "
                "image; Cypher generation (node_merge_statements / "
                "edge_merge_statements) works without it."
            ) from exc
        return neo4j.GraphDatabase.driver(self.uri, auth=(self.user, self.password))

    def _run_tx(self, session, stmts) -> None:
        """Run ``stmts`` in one transaction; rollback + bounded retry."""
        attempt = 0
        while True:
            attempt += 1
            tx = session.begin_transaction()
            try:
                for cypher, params in stmts:
                    tx.run(cypher, **params)
                tx.commit()
                return
            except Exception as exc:
                try:
                    tx.rollback()
                except Exception:
                    pass  # rollback after a dead connection is best-effort
                if _is_transient(exc) and attempt < self.MAX_TX_ATTEMPTS:
                    continue
                raise RuntimeError(
                    f"Failed to execute tx because: {exc}"
                ) from exc
            finally:
                try:
                    tx.close()
                except Exception:
                    pass

    def _merge_graph(self, session, nodes, edges) -> None:
        # constraints in their own tx (DDL), then all nodes before any
        # edge in ONE atomic data tx: an edge MATCH against a
        # not-yet-merged endpoint would silently no-op
        self._run_tx(session, [(stmt, {}) for stmt in CONSTRAINTS])
        self._run_tx(
            session,
            list(node_merge_statements(nodes))
            + list(edge_merge_statements(nodes, edges)),
        )

    def write(self, nodes, edges, options: dict | None = None) -> None:
        options = options or {}
        with self._driver() as driver, driver.session() as session:
            n = session.run("MATCH (n) RETURN count(n) AS c").single()["c"]
            if n and not options.get("overwrite"):
                raise ValueError("target database is not empty; pass overwrite=True")
            if n:
                self._run_tx(session, [("MATCH (n) DETACH DELETE n", {})])
            self._merge_graph(session, nodes, edges)

    def append(self, nodes, edges, options: dict | None = None) -> None:
        with self._driver() as driver, driver.session() as session:
            self._merge_graph(session, nodes, edges)
