"""PageRank pinned against a dense numpy reference on planted graphs
(dangling node, source-only node, multi-edge fan-in)."""

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(pairs):
    import ray.data as rd

    t = pa.table(
        {
            "src": pa.array([a for a, _ in pairs], pa.string()),
            "dst": pa.array([b for _, b in pairs], pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(3)


def _numpy_pagerank(pairs, damping=0.85, n_iters=5):
    nodes = sorted({n for e in pairs for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for a, _ in pairs:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        inflow = np.zeros(n)
        for a, b in pairs:
            inflow[idx[b]] += r[idx[a]] / out_deg[idx[a]]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * (inflow + dangling / n)
    return dict(zip(nodes, r))


@pytest.mark.usefixtures("ray_session")
class TestPageRank:
    PAIRS = [
        ("A", "B"), ("A", "C"), ("B", "C"), ("C", "D"), ("E", "A"),
        ("E", "C"), ("D2", "C"),
    ]

    def test_matches_dense_reference(self):
        from entity_extractor_ray.stages.graph import pagerank

        got = pagerank(_edges_ds(self.PAIRS), n_iters=5).to_pandas()
        want = _numpy_pagerank(self.PAIRS, n_iters=5)
        assert set(got["node"]) == set(want)
        for _, row in got.iterrows():
            assert abs(row["rank"] - want[row["node"]]) < 1e-8, row["node"]

    def test_ranks_sum_to_one(self):
        from entity_extractor_ray.stages.graph import pagerank

        got = pagerank(_edges_ds(self.PAIRS), n_iters=3).to_pandas()
        assert abs(got["rank"].sum() - 1.0) < 1e-8

    def test_dangling_node_keeps_rank_flowing(self):
        # D receives from C but has no out-edges: its rank must leak back
        # into the graph, not accumulate — compare against the reference
        from entity_extractor_ray.stages.graph import pagerank

        pairs = [("A", "D"), ("B", "D"), ("D2", "A"), ("D2", "B")]
        got = pagerank(_edges_ds(pairs), n_iters=10).to_pandas()
        want = _numpy_pagerank(pairs, n_iters=10)
        for _, row in got.iterrows():
            assert abs(row["rank"] - want[row["node"]]) < 1e-8
