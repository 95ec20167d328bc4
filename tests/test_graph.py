"""Distributed graph operators (stages/graph.py): connected components,
transitive-closure dedup, integer-exact PageRank. Oracle equality is
covered by the parametrized test in test_dataops.py; these pin the graph
semantics themselves."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _cc_of(edges_tbl):
    import ray.data

    from lingvo__postagger_ner_ru_dnn_ray.stages.graph import connected_components

    ds = ray.data.from_arrow(edges_tbl)
    df = connected_components(ds).to_pandas()
    return dict(zip(df["node"].astype(int), df["lab"].astype(int)))


def test_cc_chain_and_islands(ray_session, monkeypatch):
    # 1-2-3 chain plus 5-6 island: min label propagates transitively —
    # pin the DISTRIBUTED loop's semantics (the local path is pinned
    # equal by test_local_finish_equals_distributed)
    monkeypatch.setenv("GRAFT_GRAPH_LOCAL_MAX_ROWS", "0")
    got = _cc_of(pa.table({"doc_a": [1, 2, 5], "doc_b": [2, 3, 6]}))
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_cc_long_chain_converges(ray_session, monkeypatch):
    # a 40-hop path exercises multi-iteration propagation (diameter ≈ 40)
    # — force the DISTRIBUTED loop (the local finish would short-circuit)
    monkeypatch.setenv("GRAFT_GRAPH_LOCAL_MAX_ROWS", "0")
    n = 41
    got = _cc_of(pa.table({"doc_a": list(range(n - 1)), "doc_b": list(range(1, n))}))
    assert got == {i: 0 for i in range(n)}


def test_cc_self_loop_only_node_survives(ray_session, monkeypatch):
    # a node whose ONLY edges are self-loops must still get a component
    # label (regression: _contract_edges dropped such nodes — no union
    # fires, so the node appeared in neither star side). Force the
    # distributed path: _contract_edges is the code under regression.
    monkeypatch.setenv("GRAFT_GRAPH_LOCAL_MAX_ROWS", "0")
    got = _cc_of(pa.table({"doc_a": [1, 5, 7, 7], "doc_b": [2, 5, 7, 8]}))
    assert got == {1: 1, 2: 1, 5: 5, 7: 7, 8: 7}


def test_cc_empty_edges(ray_session):
    import ray.data

    from lingvo__postagger_ner_ru_dnn_ray.stages.graph import connected_components

    empty = pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    assert connected_components(ray.data.from_arrow(empty)).count() == 0


def test_dedup_cc_stronger_than_minrep(ray_session):
    # transitive closure: every kept doc is its component min, every
    # dropped doc's component representative IS kept, and keep-list size
    # == number of components
    from lingvo__postagger_ner_ru_dnn_ray.stages.graph import (
        doc_dedup_cc,
        doc_dup_components,
    )

    comps = doc_dup_components(SF).to_pandas()
    keep = set(doc_dedup_cc(SF).to_pandas()["doc_id"].astype(int))
    by_comp = comps.groupby("component")["doc_id"].min()
    assert keep == set(by_comp.astype(int))
    assert len(keep) == comps["component"].nunique()
    # components are ids of members (min member): component value must be
    # a doc in its own group
    grp = comps.groupby("component")["doc_id"].agg(set)
    assert all(c in members for c, members in grp.items())


def test_local_finish_equals_distributed(ray_session, monkeypatch):
    # the small-graph local finish (GRAFT_GRAPH_LOCAL_MAX_ROWS cutover)
    # must produce bit-identical results to the iterative distributed
    # path for BOTH operators, on an adversarial mix: long chain + hub
    # star + self-loops + islands + duplicate edges
    import ray.data

    from lingvo__postagger_ner_ru_dnn_ray.stages.graph import (
        connected_components,
        pagerank,
    )

    rng = np.random.RandomState(7)
    chain_a = np.arange(100, 140)
    edges = pa.table({
        "doc_a": np.concatenate([
            chain_a, np.zeros(30, dtype=np.int64), [500, 600, 600],
            rng.randint(0, 80, 60),
        ]).astype(np.int64),
        "doc_b": np.concatenate([
            chain_a + 1, np.arange(1, 31), [500, 601, 601],
            rng.randint(0, 80, 60),
        ]).astype(np.int64),
    })

    def run(mode_rows: str):
        monkeypatch.setenv("GRAFT_GRAPH_LOCAL_MAX_ROWS", mode_rows)
        cc = (
            connected_components(ray.data.from_arrow(edges))
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        pr = (
            pagerank(ray.data.from_arrow(edges))
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        return cc, pr

    cc_local, pr_local = run("2000000")
    cc_dist, pr_dist = run("0")
    pd.testing.assert_frame_equal(cc_local, cc_dist)
    pd.testing.assert_frame_equal(pr_local, pr_dist)


def test_pagerank_mass_and_symmetry(ray_session, monkeypatch):
    import ray.data

    from lingvo__postagger_ner_ru_dnn_ray.stages.graph import _PR_SCALE, pagerank

    # pin the DISTRIBUTED loop's arithmetic (local path pinned equal by
    # test_local_finish_equals_distributed)
    monkeypatch.setenv("GRAFT_GRAPH_LOCAL_MAX_ROWS", "0")
    # two symmetric nodes must get identical ranks; triangle is uniform
    tri = pa.table({"doc_a": [1, 2, 3], "doc_b": [2, 3, 1]})
    df = pagerank(ray.data.from_arrow(tri)).to_pandas()
    assert df["rank_scaled"].nunique() == 1
    # total mass stays within rounding of SCALE (floor-division losses only)
    total = int(df["rank_scaled"].sum())
    assert 0 < _PR_SCALE - total < 1000


def test_pagerank_star_center_dominates(ray_session, monkeypatch):
    import ray.data

    from lingvo__postagger_ner_ru_dnn_ray.stages.graph import pagerank

    monkeypatch.setenv("GRAFT_GRAPH_LOCAL_MAX_ROWS", "0")
    star = pa.table({"doc_a": [0, 0, 0, 0], "doc_b": [1, 2, 3, 4]})
    df = pagerank(ray.data.from_arrow(star)).to_pandas().set_index("node")
    leaves = df.loc[[1, 2, 3, 4], "rank_scaled"]
    assert df.loc[0, "rank_scaled"] > leaves.max()
    assert leaves.nunique() == 1


def test_triangle_count_shapes(ray_session):
    import ray.data

    from lingvo__postagger_ner_ru_dnn_ray.stages.graph import triangle_count

    def n_tri(a, b):
        t = pa.table({"doc_a": a, "doc_b": b})
        return int(triangle_count(ray.data.from_arrow(t)).to_pandas()["n_triangles"][0])

    assert n_tri([1, 2, 1], [2, 3, 3]) == 1  # 3-cycle
    assert n_tri([1, 2, 3, 4], [2, 3, 4, 1]) == 0  # 4-cycle, no chord
    # K4 has 4 triangles
    assert n_tri([1, 1, 1, 2, 2, 3], [2, 3, 4, 3, 4, 4]) == 4
    # hub star has none
    assert n_tri([0, 0, 0], [1, 2, 3]) == 0


def test_cc_giant_cluster_linear(ray_session, monkeypatch):
    # a 5k-node duplicate cluster (one hub linked to all) completes fast:
    # star edges keep CC linear where pair emission would be C(m,2).
    # Force the DISTRIBUTED loop — this test pins ITS scaling shape.
    monkeypatch.setenv("GRAFT_GRAPH_LOCAL_MAX_ROWS", "0")
    import ray.data

    from lingvo__postagger_ner_ru_dnn_ray.stages.graph import connected_components

    m = 5000
    tbl = pa.table({
        "doc_a": np.zeros(m - 1, dtype=np.int64),
        "doc_b": np.arange(1, m, dtype=np.int64),
    })
    df = connected_components(ray.data.from_arrow(tbl)).to_pandas()
    assert len(df) == m
    assert (df["lab"] == 0).all()
