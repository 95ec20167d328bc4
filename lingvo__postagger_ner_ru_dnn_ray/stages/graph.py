"""Distributed graph operators over document near-duplicate graphs.

The C# reference has no graph stage; these are the canonical KG /
corpus-cleaning graph steps a web-scale training-data pipeline needs:

- ``connected_components`` — hash-min label propagation over an edge
  Dataset (2 bounded shuffles per iteration, labels O(touched nodes)).
- ``doc_dup_components`` — components of the MinHash-LSH candidate graph
  (RefinedWeb/SlimPajama-style cluster dedup: per-(band,bucket) STAR
  links, linear in bucket size — no C(m,2) pair explosion ever).
- ``doc_dedup_cc`` — the transitive-closure dedup keep-list (keep one doc
  per component), strictly stronger than per-bucket min-rep dedup.
- ``doc_dup_pagerank`` — integer-exact PageRank over the same graph
  (fixed iterations, no mid-pipeline materialization of the rank flow).

Scale notes: every shuffle below is a salted-partition groupby
(``_key_salt`` → ``_JOIN_SALTS`` bounded groups, vectorized pandas
interiors, O(partitions) Python dispatch). The edge set is materialized
ONCE (it is re-read every iteration — the standard synchronous-iteration
trade every distributed CC/PageRank makes, cf. GraphX/Pregel). Labels /
ranks are O(nodes-with-edges), not O(corpus).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .dataops import (
    _distinct_pairs,
    _docs,
    _key_salt,
    _mh_band_cte,
    _mh_to_bands,
)

_ROW_SCHEMA = pa.schema(
    [("k", pa.int64()), ("salt", pa.int64()), ("kind", pa.int8()), ("val", pa.int64())]
)

_EMPTY_EDGES = pd.DataFrame(
    {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
)


def _local_max_rows() -> int:
    """Small-graph local-finish threshold (directed edge rows). Below it,
    CC / PageRank skip the iterative shuffle loops and solve the whole
    graph inside ONE task over one coalesced block — the standard
    GraphX/GraphFrames "local aggregation" cutover. Rationale: a near-dup
    graph is usually orders of magnitude smaller than its corpus (sf0.1:
    5,000 docs → 2,203 candidate edges), and each distributed iteration
    costs 2 sort-shuffles of fixed scheduling overhead that dwarfs the
    actual work at that size (measured: ~20 s of loop overhead for a
    2,203-edge graph vs <0.1 s solved locally). 2M directed rows ≈ 64 MB
    Arrow + O(n) numpy state — well inside one worker's heap. Above the
    threshold the proven iterative path runs unchanged. Override with
    GRAFT_GRAPH_LOCAL_MAX_ROWS (0 forces the distributed path; tests pin
    both paths equal)."""
    import os

    return int(os.environ.get("GRAFT_GRAPH_LOCAL_MAX_ROWS", "2000000"))


def _bounded_parts(ds: ray.data.Dataset, target_bytes: int = 64 << 20) -> int:
    """Iteration width from DATA SIZE, not inherited block count: an
    iterative loop that re-sorts whatever block count the upstream stage
    happened to produce pays per-block scheduling overhead × iterations
    (measured: 185 s for a 2,203-edge CC at sf0.1 because the LSH stage
    emitted 64 near-empty blocks). One ~64 MB block per partition keeps a
    tiny graph in 1-2 blocks and a 10^9-edge graph at hundreds — the same
    knob either way."""
    nbytes = ds.size_bytes() or 0
    return int(nbytes // target_bytes) + 1


def _restamp(schema: pa.Schema):
    """Re-stamp pandas map_groups output as schema'd Arrow so unions see
    one block type (empty pandas blocks otherwise lose their schema and
    Ray's union/groupby rejects them)."""

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return schema.empty_table()
        return batch.select(schema.names).cast(schema)

    return fn


def lsh_star_edges(sf_dir: str) -> ray.data.Dataset:
    """Candidate near-dup edges as per-(band, bucket) STAR links: every
    doc in a duplicated LSH bucket links to the bucket's min doc_id.
    Linear in bucket size (a 10^5-doc duplicate cluster emits 10^5-1
    edges, not 5·10^9 pairs), preserves bucket connectivity exactly.
    Emits DISTINCT (doc_a, doc_b) with doc_a < doc_b."""

    def star_links(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group.duplicated(["band", "bucket"], keep=False)]
        if g.empty:
            return _EMPTY_EDGES.copy()
        u = g.drop_duplicates(["band", "bucket", "doc_id"])
        m = u.groupby(["band", "bucket"], sort=False)["doc_id"].transform("min")
        sel = (u["doc_id"] != m).to_numpy()
        return pd.DataFrame({
            "doc_a": pd.Series(m.to_numpy()[sel], dtype="int64"),
            "doc_b": pd.Series(u["doc_id"].to_numpy()[sel], dtype="int64"),
        })

    docs = _docs(sf_dir, ["doc_id", "text"])
    bands = docs.map_batches(_mh_to_bands, batch_format="pyarrow")
    edges = bands.groupby("salt").map_groups(star_links, batch_format="pandas")
    return _distinct_pairs(edges)


def _tag_labels(batch: pa.Table) -> pa.Table:
    if batch.num_columns == 0 or batch.num_rows == 0:
        return _ROW_SCHEMA.empty_table()
    k = np.asarray(batch.column("node"), dtype=np.int64)
    lab = np.asarray(batch.column("lab"), dtype=np.int64)
    n = len(k)
    return pa.Table.from_arrays(
        [pa.array(k), pa.array(_key_salt(k)), pa.array(np.zeros(n, dtype=np.int8)),
         pa.array(lab)],
        names=_ROW_SCHEMA.names,
    )


def _contract_edges(edges_d: ray.data.Dataset, passes: int = 3) -> ray.data.Dataset:
    """CC pre-contraction (hash-to-min flavored): per hash(src) partition,
    union-find the edges PRESENT in the partition and emit node→root
    stars (root = component-local min) in both directions. Every original
    edge (a,b) is unioned in whichever partition its directed copy lands,
    so global connectivity is preserved pass over pass while chains
    collapse toward their minima. Partition edge counts are block-bounded
    (the partition count comes from _bounded_parts upstream), so the
    in-partition union-find never sees more than a block of edges."""

    def contract(g: pd.DataFrame) -> pa.Table:
        e = g[g["kind"] == 1]
        if e.empty:
            return _ROW_SCHEMA.empty_table()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(e["k"].to_numpy(dtype=np.int64), e["val"].to_numpy(dtype=np.int64)):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                # min wins -> roots are monotone decreasing across passes
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        node = np.fromiter(parent.keys(), dtype=np.int64, count=len(parent))
        root = np.array([find(int(n)) for n in node], dtype=np.int64)
        sel = node != root
        node, root = node[sel], root[sel]
        src = np.concatenate([node, root])
        dst = np.concatenate([root, node])
        # a node whose partition edges are ALL self-loops (or an isolated
        # root) produces no union, so it appears in neither star side and
        # would vanish from the contracted edge set — keep it alive as an
        # identity edge so connected_components still labels it
        endpoints = np.union1d(
            e["k"].to_numpy(dtype=np.int64), e["val"].to_numpy(dtype=np.int64)
        )
        missing = endpoints if len(src) == 0 else np.setdiff1d(endpoints, src)
        if missing.size:
            src = np.concatenate([src, missing])
            dst = np.concatenate([dst, missing])
        return pa.Table.from_arrays(
            [pa.array(src), pa.array(_key_salt(src)),
             pa.array(np.ones(len(src), dtype=np.int8)), pa.array(dst)],
            names=_ROW_SCHEMA.names,
        )

    for _ in range(passes):
        edges_d = (
            edges_d.groupby("salt")
            .map_groups(contract, batch_format="pandas")
            .map_batches(_restamp(_ROW_SCHEMA), batch_format="pyarrow")
        )
    return edges_d


_CC_OUT = pa.schema([("node", pa.int64()), ("lab", pa.int64())])


def _cc_local_kernel(batch: pa.Table) -> pa.Table:
    """Whole-graph CC inside one task: vectorized hash-min + pointer
    doubling over dense node indices. np.unique sorts, so index order ==
    node-id order and the fixpoint parent index IS the component min.
    Monotone non-increasing integer vector → guaranteed fixpoint in
    O(log n) sweeps. Bit-identical labels to the distributed loop (both
    compute min reachable node id)."""
    if batch.num_columns == 0 or batch.num_rows == 0:
        return _CC_OUT.empty_table()
    src = np.asarray(batch.column("k"), dtype=np.int64)
    dst = np.asarray(batch.column("val"), dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[: len(src)], inv[len(src):]
    p = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = p.copy()
        np.minimum.at(m, di, p[si])  # hash-min across edges
        m = np.minimum(m, m[m])  # pointer doubling
        if np.array_equal(m, p):
            break
        p = m
    return pa.Table.from_arrays(
        [pa.array(nodes), pa.array(nodes[p])], names=_CC_OUT.names
    )


def connected_components(
    edges: ray.data.Dataset, max_iters: int = 64
) -> ray.data.Dataset:
    """(node, component) for every node appearing in ``edges``
    [(doc_a, doc_b) int64], where component = min node id reachable.

    Hash-min label propagation: each iteration attaches every node's
    current label to its out-edges (shuffle 1, co-partitioned on the
    source) and takes the min over each node's own label and incoming
    proposals (shuffle 2, co-partitioned on the destination), plus a
    pointer-doubling shortcut (lab(lab(v)) proposals via dynamic parent
    edges) that cuts long chains to O(log diameter) rounds. Monotone
    decreasing → converges; iteration
    stops when no label changed (a single scalar leaves the cluster per
    iteration). Labels are materialized per iteration — the synchronous
    barrier every distributed CC has — and are O(nodes-with-edges)."""

    def to_directed(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _ROW_SCHEMA.empty_table()
        a = np.asarray(batch.column("doc_a"), dtype=np.int64)
        b = np.asarray(batch.column("doc_b"), dtype=np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        n = len(src)
        return pa.Table.from_arrays(
            [pa.array(src), pa.array(_key_salt(src)),
             pa.array(np.ones(n, dtype=np.int8)), pa.array(dst)],
            names=_ROW_SCHEMA.names,
        )

    # directed both ways; re-read every iteration, so materialize once —
    # and coalesce to byte-sized blocks so each iteration's shuffles move
    # as many blocks as the DATA needs, not as many as upstream produced
    edges_d = edges.map_batches(to_directed, batch_format="pyarrow").materialize()
    # small-graph local finish: solve the whole graph in one task instead
    # of paying 2 sort-shuffles × iterations of fixed overhead on a graph
    # that fits in a block (the count is metadata — edges_d is
    # materialized). Same labels, pinned equal by test_graph.py.
    if 0 < edges_d.count() <= _local_max_rows():
        return edges_d.repartition(1).map_batches(
            _cc_local_kernel, batch_format="pyarrow", batch_size=None
        )
    edges_d = edges_d.repartition(_bounded_parts(edges_d)).materialize()
    # pre-contraction: each pass union-finds the edges inside each hash
    # partition and replaces them with node→root stars — same components,
    # sharply smaller diameter, so the convergence-checked loop below
    # finishes in a handful of rounds instead of O(diameter). Measured at
    # sf0.1: 21 loop rounds (~3 s of fixed shuffle overhead each) → 3.
    edges_d = _contract_edges(edges_d).materialize()

    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["k"].to_numpy(dtype=np.int64))
        return pd.DataFrame({
            "node": pd.Series(u, dtype="int64"),
            "lab": pd.Series(u, dtype="int64"),
            "changed": pd.Series(np.zeros(len(u), dtype=np.int64), dtype="int64"),
        })

    labels = (
        edges_d.groupby("salt")
        .map_groups(init_labels, batch_format="pandas")
        .materialize()
    )
    if labels.count() == 0:
        return labels.drop_columns(["changed"])

    def attach_src_label(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["kind"] == 0][["k", "val"]].rename(columns={"val": "lab"})
        e = g[g["kind"] == 1]
        if lab.empty or e.empty:
            return pd.DataFrame({
                "k": pd.Series([], dtype="int64"), "salt": pd.Series([], dtype="int64"),
                "kind": pd.Series([], dtype="int8"), "val": pd.Series([], dtype="int64"),
            })
        m = e[["k", "val"]].merge(lab, on="k", how="inner")
        dst = m["val"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "k": pd.Series(dst, dtype="int64"),
            "salt": pd.Series(_key_salt(dst), dtype="int64"),
            "kind": pd.Series(np.ones(len(m), dtype=np.int8), dtype="int8"),
            "val": pd.Series(m["lab"].to_numpy(dtype=np.int64), dtype="int64"),
        })

    def combine_min(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["kind"] == 0][["k", "val"]]
        props = g[g["kind"] == 1][["k", "val"]]
        if props.empty:
            out = own
            new = out["val"].to_numpy(dtype=np.int64)
            old = new
        else:
            pm = props.groupby("k", sort=False)["val"].min()
            out = own.copy()
            cand = out["k"].map(pm)
            old = out["val"].to_numpy(dtype=np.int64)
            new = np.minimum(old, cand.fillna(np.iinfo(np.int64).max).to_numpy(dtype=np.int64))
        return pd.DataFrame({
            "node": pd.Series(out["k"].to_numpy(dtype=np.int64), dtype="int64"),
            "lab": pd.Series(new, dtype="int64"),
            "changed": pd.Series((new < old).astype(np.int64), dtype="int64"),
        })

    def parent_edges(batch: pa.Table) -> pa.Table:
        # pointer-doubling shortcut: node v also asks its current label
        # p = lab(v) for p's label — expressed as a dynamic edge (p → v),
        # which the ordinary attach pass turns into a lab(lab(v)) proposal.
        # Turns O(diameter) rounds into O(log diameter) on long chains.
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _ROW_SCHEMA.empty_table()
        node = np.asarray(batch.column("node"), dtype=np.int64)
        lab = np.asarray(batch.column("lab"), dtype=np.int64)
        sel = lab != node  # self-parents would be no-op proposals
        node, lab = node[sel], lab[sel]
        return pa.Table.from_arrays(
            [pa.array(lab), pa.array(_key_salt(lab)),
             pa.array(np.ones(len(lab), dtype=np.int8)), pa.array(node)],
            names=_ROW_SCHEMA.names,
        )

    def tag_and_shortcut(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([_tag_labels(batch), parent_edges(batch)])

    # blocks grow ~3× per iteration through the unions (labels ∪ edges ∪
    # proposals); without a bound the block count — and with it the
    # materialize cost — explodes exponentially across iterations.
    # Repartitioning the labels back to a fixed byte-sized width each
    # round keeps every iteration O(E) work over a bounded block set.
    parts = _bounded_parts(edges_d)

    for _ in range(max_iters):
        tagged = labels.map_batches(_tag_labels, batch_format="pyarrow")
        proposals = (
            labels.map_batches(tag_and_shortcut, batch_format="pyarrow")
            .union(edges_d)
            .groupby("salt")
            .map_groups(attach_src_label, batch_format="pandas")
            .map_batches(_restamp(_ROW_SCHEMA), batch_format="pyarrow")
        )
        labels = (
            tagged.union(proposals)
            .groupby("salt")
            .map_groups(combine_min, batch_format="pandas")
            .repartition(parts)
            .materialize()
        )
        if labels.sum("changed") == 0:
            return labels.drop_columns(["changed"])
    raise RuntimeError(f"connected_components did not converge in {max_iters} iterations")


def _components_with_singletons(
    sf_dir: str, comp: ray.data.Dataset
) -> ray.data.Dataset:
    """Left-merge every doc with its component label (salted co-partition;
    docs absent from the edge set are their own component)."""

    def tag_docs(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column("doc_id"), dtype=np.int64)
        n = len(k)
        return pa.Table.from_arrays(
            [pa.array(k), pa.array(_key_salt(k)),
             pa.array(np.zeros(n, dtype=np.int8)), pa.array(k)],
            names=_ROW_SCHEMA.names,
        )

    def tag_comp(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _ROW_SCHEMA.empty_table()
        k = np.asarray(batch.column("node"), dtype=np.int64)
        lab = np.asarray(batch.column("lab"), dtype=np.int64)
        n = len(k)
        return pa.Table.from_arrays(
            [pa.array(k), pa.array(_key_salt(k)),
             pa.array(np.ones(n, dtype=np.int8)), pa.array(lab)],
            names=_ROW_SCHEMA.names,
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["kind"] == 0][["k"]]
        c = g[g["kind"] == 1][["k", "val"]]
        if d.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "component": pd.Series([], dtype="int64"),
            })
        m = d.merge(c, on="k", how="left")
        comp_v = m["val"].fillna(m["k"]).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "doc_id": pd.Series(m["k"].to_numpy(dtype=np.int64), dtype="int64"),
            "component": pd.Series(comp_v, dtype="int64"),
        })

    docs = _docs(sf_dir, ["doc_id"]).map_batches(tag_docs, batch_format="pyarrow")
    comp_t = comp.map_batches(tag_comp, batch_format="pyarrow")
    return docs.union(comp_t).groupby("salt").map_groups(merge, batch_format="pandas")


def doc_dup_components(sf_dir: str) -> ray.data.Dataset:
    """Connected components of the MinHash-LSH near-dup candidate graph
    over ALL documents: (doc_id, component) where component is the min
    doc_id transitively reachable through shared LSH buckets (singletons
    map to themselves). This is the RefinedWeb-style cluster-dedup
    grouping — candidate-level (no Jaccard verification), which is the
    standard web-scale practice and exactly SQL-reproducible."""
    return _components_with_singletons(sf_dir, connected_components(lsh_star_edges(sf_dir)))


def doc_dedup_cc(sf_dir: str) -> ray.data.Dataset:
    """Transitive-closure dedup keep-list: keep exactly one doc (the min
    id) per connected component of the near-dup candidate graph. Emits
    (doc_id). Stronger than per-bucket min-rep dedup: a chain a~b~c with
    a,c in different buckets still collapses to one kept doc."""
    import pyarrow.compute as pc

    comps = doc_dup_components(sf_dir)

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("doc_id"), batch.column("component"))
        return batch.filter(m).select(["doc_id"])

    return comps.map_batches(keep, batch_format="pyarrow")


def _cc_closure_cte() -> str:
    """Shared SQL suffix: LSH star edges → undirected closure → per-node
    min reachable label (DuckDB recursive CTE; UNION dedups the frontier
    so the recursion terminates)."""
    return """, bd AS (
  SELECT DISTINCT band, bucket, doc_id FROM band
), e0 AS (
  SELECT min(doc_id) OVER (PARTITION BY band, bucket) AS a, doc_id AS b FROM bd
), edges AS (
  SELECT DISTINCT a, b FROM e0 WHERE a <> b
), und AS (
  SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
), vtx AS (
  SELECT DISTINCT a AS node FROM und
), r AS (
  SELECT node, node AS lab FROM vtx
  UNION
  SELECT u.b AS node, r.lab FROM r JOIN und u ON u.a = r.node
), comp AS (
  SELECT node, min(lab) AS component FROM r GROUP BY node
)"""


def dup_components_oracle_sql() -> str:
    """DuckDB oracle for doc_dup_components: recompute the identical
    MinHash bands (bit-for-bit, _mh_band_cte), derive the same star
    edges, close transitively with a recursive CTE, and left-join back
    onto documents for singleton identity."""
    bands = _mh_band_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""{bands}{_cc_closure_cte()}
SELECT d.doc_id, coalesce(c.component, d.doc_id)::BIGINT AS component
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node"""


_PR_SCALE = 10**12  # rank unit: picorank; all arithmetic integer-exact
_PR_ITERS = 5
_PR_ROW = pa.schema(
    [("k", pa.int64()), ("salt", pa.int64()), ("kind", pa.int8()),
     ("val", pa.int64()), ("d", pa.int64())]
)


def pagerank(edges: ray.data.Dataset, iters: int = _PR_ITERS) -> ray.data.Dataset:
    """Integer-exact PageRank (damping 0.85, ``iters`` fixed iterations)
    over the undirected graph of ``edges`` [(doc_a, doc_b)]. Emits
    (node, rank_scaled) in 10^-12 rank units for every node with ≥1 edge.

    r0 = SCALE//N;  r' (v) = (15·(SCALE//N))//100 + (85·Σ_{u~v} r(u)//deg(u))//100

    Every op is floor division on positive ints, so DuckDB's ``//``
    reproduces it bit-for-bit. Execution shape: the edge set (with
    degrees attached in the same pass that computes them) is materialized
    ONCE; the rank flow is a single LAZY chain — per iteration one
    co-partitioned propose pass (rank rows ride through their own
    partition; proposals are re-keyed to the destination) and one apply
    pass — so the streaming executor pipelines all iterations with no
    mid-flow materialization and no driver data pull beyond the node
    count N (one scalar)."""

    def to_directed(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _PR_ROW.empty_table()
        a = np.asarray(batch.column("doc_a"), dtype=np.int64)
        b = np.asarray(batch.column("doc_b"), dtype=np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        n = len(src)
        return pa.Table.from_arrays(
            [pa.array(src), pa.array(_key_salt(src)),
             pa.array(np.ones(n, dtype=np.int8)), pa.array(dst),
             pa.array(np.zeros(n, dtype=np.int64))],
            names=_PR_ROW.names,
        )

    def attach_deg(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of one src share the salt partition → degree is exact
        e = g[g["kind"] == 1]
        if e.empty:
            return pd.DataFrame({n: pd.Series([], dtype=t) for n, t in zip(
                _PR_ROW.names, ["int64", "int64", "int8", "int64", "int64"])})
        d = e.groupby("k", sort=False)["val"].transform("size").to_numpy(dtype=np.int64)
        deg = e.groupby("k", sort=False)["val"].size()
        nodes = pd.DataFrame({
            "k": pd.Series(deg.index.to_numpy(dtype=np.int64), dtype="int64"),
            "salt": pd.Series(_key_salt(deg.index.to_numpy(dtype=np.int64)), dtype="int64"),
            "kind": pd.Series(np.zeros(len(deg), dtype=np.int8), dtype="int8"),
            "val": pd.Series(np.zeros(len(deg), dtype=np.int64), dtype="int64"),
            "d": pd.Series(deg.to_numpy(dtype=np.int64), dtype="int64"),
        })
        erows = pd.DataFrame({
            "k": pd.Series(e["k"].to_numpy(dtype=np.int64), dtype="int64"),
            "salt": pd.Series(e["salt"].to_numpy(dtype=np.int64), dtype="int64"),
            "kind": pd.Series(np.ones(len(e), dtype=np.int8), dtype="int8"),
            "val": pd.Series(e["val"].to_numpy(dtype=np.int64), dtype="int64"),
            "d": pd.Series(d, dtype="int64"),
        })
        return pd.concat([nodes, erows], ignore_index=True)

    edge_aug = (
        edges.map_batches(to_directed, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(attach_deg, batch_format="pandas")
        .map_batches(_restamp(_PR_ROW), batch_format="pyarrow")
        .materialize()
    )

    def count_nodes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.sum(pc.cast(pc.equal(batch.column("kind"), 0), pa.int64())).as_py() or 0
        return pa.Table.from_arrays([pa.array([n], pa.int64())], names=["n"])

    n_nodes = int(edge_aug.map_batches(count_nodes, batch_format="pyarrow").sum("n") or 0)
    if n_nodes == 0:
        return ray.data.from_arrow(pa.schema(
            [("node", pa.int64()), ("rank_scaled", pa.int64())]).empty_table())

    r0 = _PR_SCALE // n_nodes
    base = (15 * r0) // 100

    # small-graph local finish (same cutover as connected_components,
    # same unit: DIRECTED EDGE ROWS = total rows minus the node rows):
    # all ``iters`` rounds inside one task over one coalesced block, with
    # IDENTICAL integer arithmetic (int64 scatter-add, floor divisions) —
    # no per-iteration shuffles, and no block-bounding repartition either
    # (that pass exists for the distributed loop below). Pinned equal to
    # the distributed loop by test_graph.py.
    if edge_aug.count() - n_nodes <= _local_max_rows():

        def local_pr(batch: pa.Table) -> pa.Table:
            out = pa.schema([("node", pa.int64()), ("rank_scaled", pa.int64())])
            if batch.num_columns == 0 or batch.num_rows == 0:
                return out.empty_table()
            kind = np.asarray(batch.column("kind"), dtype=np.int8)
            k = np.asarray(batch.column("k"), dtype=np.int64)
            val = np.asarray(batch.column("val"), dtype=np.int64)
            d = np.asarray(batch.column("d"), dtype=np.int64)
            nmask = kind == 0
            order = np.argsort(k[nmask], kind="stable")
            nodes_s = k[nmask][order]
            src, dst, dsrc = k[~nmask], val[~nmask], d[~nmask]
            si = np.searchsorted(nodes_s, src)
            di = np.searchsorted(nodes_s, dst)
            r = np.full(len(nodes_s), r0, dtype=np.int64)
            for _ in range(iters):
                prop = r[si] // dsrc  # rank(u) // deg(u), exact int64
                acc = np.zeros(len(nodes_s), dtype=np.int64)
                np.add.at(acc, di, prop)  # Σ incoming proposals, 0 if none
                r = base + (85 * acc) // 100
            return pa.Table.from_arrays(
                [pa.array(nodes_s), pa.array(r)], names=out.names
            )

        return edge_aug.repartition(1).map_batches(
            local_pr, batch_format="pyarrow", batch_size=None
        )

    # distributed loop: coalesce to byte-sized blocks so each iteration's
    # shuffles move as many blocks as the DATA needs (see _bounded_parts)
    edge_aug = edge_aug.repartition(_bounded_parts(edge_aug)).materialize()

    def init_ranks(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch.column("kind"), 0))
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("k"), t.column("salt"), t.column("kind"),
             pa.array(np.full(n, r0, dtype=np.int64)), t.column("d")],
            names=_PR_ROW.names,
        )

    ranks = edge_aug.map_batches(init_ranks, batch_format="pyarrow")

    def only_edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch.column("kind"), 1))

    # the per-iteration union must carry edge rows ONLY — the node rows in
    # edge_aug are consumed by init_ranks and would otherwise duplicate
    # the kind-0 rank rows every pass
    edge_rows = edge_aug.map_batches(only_edges, batch_format="pyarrow")

    def propose(g: pd.DataFrame) -> pd.DataFrame:
        r = g[g["kind"] == 0]
        e = g[g["kind"] == 1]
        out = [r[["k", "salt", "kind", "val", "d"]]]
        if not (r.empty or e.empty):
            m = e[["k", "val"]].merge(
                r[["k", "val", "d"]].rename(columns={"val": "r", "d": "deg"}), on="k"
            )
            dst = m["val"].to_numpy(dtype=np.int64)
            prop = m["r"].to_numpy(dtype=np.int64) // m["deg"].to_numpy(dtype=np.int64)
            out.append(pd.DataFrame({
                "k": pd.Series(dst, dtype="int64"),
                "salt": pd.Series(_key_salt(dst), dtype="int64"),
                "kind": pd.Series(np.full(len(m), 2, dtype=np.int8), dtype="int8"),
                "val": pd.Series(prop, dtype="int64"),
                "d": pd.Series(np.zeros(len(m), dtype=np.int64), dtype="int64"),
            }))
        res = pd.concat(out, ignore_index=True)
        res["kind"] = res["kind"].astype("int8")
        return res

    def apply_rank(g: pd.DataFrame) -> pd.DataFrame:
        r = g[g["kind"] == 0]
        p = g[g["kind"] == 2]
        if r.empty:
            return pd.DataFrame({n: pd.Series([], dtype=t) for n, t in zip(
                _PR_ROW.names, ["int64", "int64", "int8", "int64", "int64"])})
        if p.empty:
            s = r["k"].map(lambda _: 0)
        else:
            s = r["k"].map(p.groupby("k", sort=False)["val"].sum()).fillna(0)
        new = base + (85 * s.to_numpy(dtype=np.int64)) // 100
        return pd.DataFrame({
            "k": pd.Series(r["k"].to_numpy(dtype=np.int64), dtype="int64"),
            "salt": pd.Series(r["salt"].to_numpy(dtype=np.int64), dtype="int64"),
            "kind": pd.Series(np.zeros(len(r), dtype=np.int8), dtype="int8"),
            "val": pd.Series(new, dtype="int64"),
            "d": pd.Series(r["d"].to_numpy(dtype=np.int64), dtype="int64"),
        })

    # bound the block count across the lazy iteration chain (each union
    # adds the edge blocks; without the repartition the final DAG sorts an
    # O(iters × E-blocks) block set)
    pr_parts = _bounded_parts(edge_aug)

    for _ in range(iters):
        proposed = (
            ranks.union(edge_rows)
            .groupby("salt")
            .map_groups(propose, batch_format="pandas")
            .map_batches(_restamp(_PR_ROW), batch_format="pyarrow")
        )
        ranks = (
            proposed.groupby("salt")
            .map_groups(apply_rank, batch_format="pandas")
            .map_batches(_restamp(_PR_ROW), batch_format="pyarrow")
            .repartition(pr_parts)
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("k"), batch.column("val")], names=["node", "rank_scaled"]
        )

    return ranks.map_batches(finalize, batch_format="pyarrow")


def doc_dup_pagerank(sf_dir: str) -> ray.data.Dataset:
    """PageRank over the MinHash-LSH near-dup candidate graph: which
    documents sit most centrally inside duplicate clusters (a centrality
    signal for choosing cluster representatives). (node, rank_scaled),
    nodes = docs with ≥1 candidate edge."""
    return pagerank(lsh_star_edges(sf_dir))


def dup_pagerank_oracle_sql(iters: int = _PR_ITERS) -> str:
    """DuckDB oracle for doc_dup_pagerank: identical bands → star edges →
    undirected degree → ``iters`` chained integer-exact iterations (all
    floor division on positives; sum() promotes to HUGEINT, final cast
    back to BIGINT)."""
    n_sql = "(SELECT count(*) FROM vtx)"
    body = f""", deg AS (
  SELECT a AS node, count(*) AS d FROM und GROUP BY a
), r0 AS (
  SELECT node, {_PR_SCALE} // {n_sql} AS r FROM vtx
)"""
    prev = "r0"
    for i in range(1, iters + 1):
        body += f""", r{i} AS (
  SELECT v.node,
         (15 * ({_PR_SCALE} // {n_sql})) // 100
         + (85 * coalesce(s.c, 0)) // 100 AS r
  FROM vtx v LEFT JOIN (
    SELECT u.b AS node, sum({prev}.r // deg.d) AS c
    FROM und u JOIN {prev} ON {prev}.node = u.a JOIN deg ON deg.node = u.a
    GROUP BY u.b
  ) s ON s.node = v.node
)"""
        prev = f"r{i}"
    edges_cte = """, bd AS (
  SELECT DISTINCT band, bucket, doc_id FROM band
), e0 AS (
  SELECT min(doc_id) OVER (PARTITION BY band, bucket) AS a, doc_id AS b FROM bd
), edges AS (
  SELECT DISTINCT a, b FROM e0 WHERE a <> b
), und AS (
  SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
), vtx AS (
  SELECT DISTINCT a AS node FROM und
)"""
    return f"""{_mh_band_cte()}{edges_cte}{body}
SELECT node, r::BIGINT AS rank_scaled FROM {prev}"""


def triangle_count(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Global triangle count over the undirected graph of ``edges``
    [(doc_a, doc_b), distinct, a<b] — the degree-ordered wedge-check
    algorithm (Suri–Vassilvitskii): orient every edge toward the higher
    (degree, id) endpoint, enumerate wedges only from each node's
    OUT-neighborhood (out-degree is O(√E) after orientation, so total
    wedge work is O(E^1.5) — no hub blowup), then co-partition wedges
    with the edge set and count closures. Emits one row (n_triangles).

    Shuffle shape: 3 salted exchanges (degree attach ×2 handled as one
    two-sided pass, wedge gen, closure check), each with vectorized
    pandas interiors and per-partition Python dispatch."""

    def directed_rows(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _ROW_SCHEMA.empty_table()
        a = np.asarray(batch.column("doc_a"), dtype=np.int64)
        b = np.asarray(batch.column("doc_b"), dtype=np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        n = len(src)
        return pa.Table.from_arrays(
            [pa.array(src), pa.array(_key_salt(src)),
             pa.array(np.ones(n, dtype=np.int8)), pa.array(dst)],
            names=_ROW_SCHEMA.names,
        )

    def attach_deg_orient(g: pd.DataFrame) -> pd.DataFrame:
        # all of a node's directed rows share its partition → exact degree;
        # emit (k=dst, val=src, own deg as d? ) — we need BOTH endpoint
        # degrees to orient, so pass 1 attaches deg(src) and re-keys by dst
        e = g[g["kind"] == 1]
        if e.empty:
            return pd.DataFrame({
                "k": pd.Series([], dtype="int64"), "salt": pd.Series([], dtype="int64"),
                "kind": pd.Series([], dtype="int8"), "val": pd.Series([], dtype="int64"),
                "deg_src": pd.Series([], dtype="int64"),
            })
        deg = e.groupby("k", sort=False)["val"].transform("size").to_numpy(dtype=np.int64)
        dst = e["val"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "k": pd.Series(dst, dtype="int64"),
            "salt": pd.Series(_key_salt(dst), dtype="int64"),
            "kind": pd.Series(np.ones(len(e), dtype=np.int8), dtype="int8"),
            "val": pd.Series(e["k"].to_numpy(dtype=np.int64), dtype="int64"),
            "deg_src": pd.Series(deg, dtype="int64"),
        })

    def orient_and_wedges(g: pd.DataFrame) -> pd.DataFrame:
        # rows: k = v, val = u, deg_src = deg(u); this partition holds ALL
        # of v's incident rows → deg(v) is local. Keep u→v iff
        # (deg(u), u) < (deg(v), v); group by u is NOT local here, so emit
        # oriented edges keyed by u for the wedge pass.
        if g.empty:
            return pd.DataFrame({
                "k": pd.Series([], dtype="int64"), "salt": pd.Series([], dtype="int64"),
                "kind": pd.Series([], dtype="int8"), "val": pd.Series([], dtype="int64"),
            })
        deg_v = g.groupby("k", sort=False)["val"].transform("size").to_numpy(dtype=np.int64)
        u = g["val"].to_numpy(dtype=np.int64)
        v = g["k"].to_numpy(dtype=np.int64)
        du = g["deg_src"].to_numpy(dtype=np.int64)
        keep = (du < deg_v) | ((du == deg_v) & (u < v))
        u, v = u[keep], v[keep]
        return pd.DataFrame({
            "k": pd.Series(u, dtype="int64"),
            "salt": pd.Series(_key_salt(u), dtype="int64"),
            "kind": pd.Series(np.ones(len(u), dtype=np.int8), dtype="int8"),
            "val": pd.Series(v, dtype="int64"),
        })

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # per u: all pairs of out-neighbors (out-deg is O(√E) post-orient)
        if g.empty:
            return pd.DataFrame({
                "k": pd.Series([], dtype="int64"), "salt": pd.Series([], dtype="int64"),
                "kind": pd.Series([], dtype="int8"), "val": pd.Series([], dtype="int64"),
            })
        xs, ys = [], []
        for _, nbrs in g.groupby("k", sort=False)["val"]:
            arr = np.unique(nbrs.to_numpy())
            if len(arr) < 2:
                continue
            ii, jj = np.triu_indices(len(arr), k=1)
            xs.append(arr[ii])
            ys.append(arr[jj])
        if not xs:
            return pd.DataFrame({
                "k": pd.Series([], dtype="int64"), "salt": pd.Series([], dtype="int64"),
                "kind": pd.Series([], dtype="int8"), "val": pd.Series([], dtype="int64"),
            })
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        key = (x << np.int64(32)) ^ y  # doc ids fit 32 bits (engine-wide)
        return pd.DataFrame({
            "k": pd.Series(x, dtype="int64"),
            "salt": pd.Series(_key_salt(key), dtype="int64"),
            "kind": pd.Series(np.ones(len(x), dtype=np.int8), dtype="int8"),
            "val": pd.Series(y, dtype="int64"),
        })

    def edge_rows(batch: pa.Table) -> pa.Table:
        # undirected edge set keyed by the same (min,max) pair hash
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _ROW_SCHEMA.empty_table()
        a = np.asarray(batch.column("doc_a"), dtype=np.int64)
        b = np.asarray(batch.column("doc_b"), dtype=np.int64)
        x = np.minimum(a, b)
        y = np.maximum(a, b)
        key = (x << np.int64(32)) ^ y
        return pa.Table.from_arrays(
            [pa.array(x), pa.array(_key_salt(key)),
             pa.array(np.zeros(len(x), dtype=np.int8)), pa.array(y)],
            names=_ROW_SCHEMA.names,
        )

    def closures(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 0]
        w = g[g["kind"] == 1]
        if e.empty or w.empty:
            return pd.DataFrame({"n": pd.Series([0], dtype="int64")})
        eset = set(zip(e["k"], e["val"]))
        n = sum((x, y) in eset for x, y in zip(w["k"], w["val"]))
        return pd.DataFrame({"n": pd.Series([n], dtype="int64")})

    from ray.data.aggregate import Sum

    oriented = (
        edges.map_batches(directed_rows, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(attach_deg_orient, batch_format="pandas")
        .groupby("salt")
        .map_groups(orient_and_wedges, batch_format="pandas")
        .groupby("salt")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(_restamp(_ROW_SCHEMA), batch_format="pyarrow")
    )
    etbl = edges.map_batches(edge_rows, batch_format="pyarrow")
    part = (
        etbl.union(oriented)
        .groupby("salt")
        .map_groups(closures, batch_format="pandas")
    )
    total = part.sum("n") or 0

    return ray.data.from_arrow(
        pa.Table.from_arrays([pa.array([int(total)], pa.int64())], names=["n_triangles"])
    )


def doc_dup_triangles(sf_dir: str) -> ray.data.Dataset:
    """Triangle count of the MinHash-LSH candidate graph — a cluster-
    cohesion signal (near-dup clusters that are cliques close many
    triangles; chains close none). One row (n_triangles)."""
    return triangle_count(lsh_star_edges(sf_dir))


def dup_triangles_oracle_sql() -> str:
    """DuckDB oracle: the same star edges, closed-wedge triple join with
    a < b < c canonical ordering."""
    return f"""{_mh_band_cte()}, bd AS (
  SELECT DISTINCT band, bucket, doc_id FROM band
), e0 AS (
  SELECT min(doc_id) OVER (PARTITION BY band, bucket) AS a, doc_id AS b FROM bd
), edges AS (
  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM e0 WHERE a <> b
)
SELECT count(*)::BIGINT AS n_triangles
FROM edges e1
JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b"""


def dedup_cc_oracle_sql() -> str:
    """DuckDB oracle for doc_dedup_cc (keep = min doc of each component,
    singletons kept)."""
    bands = _mh_band_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""{bands}{_cc_closure_cte()}
SELECT d.doc_id
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
WHERE coalesce(c.component, d.doc_id) = d.doc_id"""
