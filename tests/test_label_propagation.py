"""Label propagation pinned against a serial synchronous-LPA reference
(min tiebreak) on planted graphs: two cliques with one bridge must resolve
to two communities; a path graph exercises tie cascades."""

from collections import Counter

import pyarrow as pa
import pytest


def _pairs_ds(pairs):
    import ray.data as rd

    t = pa.table(
        {
            "mat_a": pa.array([a for a, _ in pairs], pa.string()),
            "mat_b": pa.array([b for _, b in pairs], pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(3)


def _serial_lpa(pairs, n_iters):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {v: v for v in adj}
    for _ in range(n_iters):
        new = {}
        for v, nbrs in adj.items():
            counts = Counter(labels[u] for u in nbrs)
            top = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == top)
        labels = new
    return labels


def _clique(prefix, n):
    nodes = [f"{prefix}{i}" for i in range(n)]
    return [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]


@pytest.mark.usefixtures("ray_session")
class TestLabelPropagation:
    def test_matches_serial_reference(self):
        from entity_extractor_ray.stages.graph import label_propagation

        pairs = _clique("a", 4) + _clique("b", 5) + [("a0", "b0")]
        for iters in (1, 3, 5):
            got = {
                r["node"]: r["label"]
                for r in label_propagation(_pairs_ds(pairs), n_iters=iters).take_all()
            }
            assert got == _serial_lpa(pairs, iters), iters

    def test_two_cliques_form_two_communities(self):
        from entity_extractor_ray.stages.graph import label_propagation

        pairs = _clique("a", 5) + _clique("b", 5) + [("a0", "b0")]
        got = {
            r["node"]: r["label"]
            for r in label_propagation(_pairs_ds(pairs), n_iters=5).take_all()
        }
        a_labels = {got[f"a{i}"] for i in range(5)}
        b_labels = {got[f"b{i}"] for i in range(5)}
        assert len(a_labels) == 1 and len(b_labels) == 1
        assert a_labels != b_labels

    def test_path_graph_matches_reference(self):
        from entity_extractor_ray.stages.graph import label_propagation

        pairs = [(f"n{i}", f"n{i+1}") for i in range(8)]
        got = {
            r["node"]: r["label"]
            for r in label_propagation(_pairs_ds(pairs), n_iters=4).take_all()
        }
        assert got == _serial_lpa(pairs, 4)


def _serial_bfs(pairs, seeds, max_depth):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    depth = {s: 0 for s in seeds}
    frontier = list(seeds)
    for d in range(1, max_depth + 1):
        nxt = []
        for v in frontier:
            for u in adj.get(v, []):
                if u not in depth:
                    depth[u] = d
                    nxt.append(u)
        frontier = nxt
    return depth


@pytest.mark.usefixtures("ray_session")
class TestBfs:
    def test_matches_serial_bfs(self):
        from entity_extractor_ray.stages.graph import bfs_depths

        pairs = (
            [(f"n{i}", f"n{i+1}") for i in range(6)]  # path
            + [("n2", "x0"), ("x0", "x1")]            # branch
            + [("iso0", "iso1")]                      # unreachable island
        )
        both = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        ds = _pairs_ds(both)
        got = {
            r["node"]: r["depth"]
            for r in bfs_depths(
                ds, seeds=["n0"], max_depth=3, src_col="mat_a", dst_col="mat_b"
            ).take_all()
        }
        assert got == _serial_bfs(pairs, ["n0"], 3)

    def test_multi_source_min_depth(self):
        from entity_extractor_ray.stages.graph import bfs_depths

        pairs = [(f"n{i}", f"n{i+1}") for i in range(6)]
        both = pairs + [(b, a) for a, b in pairs]
        got = {
            r["node"]: r["depth"]
            for r in bfs_depths(
                _pairs_ds(both), seeds=["n0", "n6"], max_depth=4,
                src_col="mat_a", dst_col="mat_b",
            ).take_all()
        }
        assert got == _serial_bfs(pairs, ["n0", "n6"], 4)
