"""Triangle counting: brute-force equality on planted and random graphs."""

import itertools

import numpy as np
import pandas as pd
import pytest


def _brute_triangles(pairs):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    n = 0
    for x, y, z in itertools.combinations(nodes, 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            n += 1
    return n


def _count(pairs, n_buckets=4):
    import ray.data as rd

    from entity_extractor_ray.stages.graph import triangle_count

    df = pd.DataFrame(pairs, columns=["mat_a", "mat_b"])
    out = triangle_count(rd.from_pandas(df).repartition(3),
                         n_buckets=n_buckets).to_pandas()
    return int(out["n_triangles"].iloc[0])


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_planted():
    # K4 has 4 triangles; a pendant edge adds none; duplicate and reversed
    # edges must not double-count; self-loops are ignored
    k4 = [(f"n{i}", f"n{j}") for i in range(4) for j in range(i + 1, 4)]
    pairs = k4 + [("n3", "n9"), ("n1", "n0"), ("n2", "n2"), ("n0", "n1")]
    assert _count(pairs) == 4


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_random_vs_brute():
    rng = np.random.default_rng(3)
    nodes = [f"v{i:02d}" for i in range(30)]
    pairs = []
    for i in range(len(nodes)):
        for j in range(i + 1, len(nodes)):
            if rng.random() < 0.25:
                pairs.append((nodes[i], nodes[j]))
    assert _count(pairs, n_buckets=8) == _brute_triangles(pairs)


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_int_ids():
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4)]
    assert _count(pairs) == 1
