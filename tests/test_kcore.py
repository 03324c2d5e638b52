"""k_core pinned against a serial Batagelj–Zaveršnik peel on random graphs
(exact node-set AND in-core-degree equality), plus structure cases."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from entity_extractor_ray.stages.graph import k_core


def serial_kcore(pairs: list[tuple[str, str]], k: int) -> dict[str, int]:
    # undirected simple graph peel
    adj: dict[str, set] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(ns) for n, ns in adj.items()}


def run_engine(pairs, k):
    ds = rd.from_pandas(pd.DataFrame(pairs, columns=["mat_a", "mat_b"]))
    out = k_core(ds, k=k, n_buckets=4).to_pandas()
    if out.empty:  # Ray's to_pandas drops the schema of an empty Dataset
        return {}
    return dict(zip(out["node"], out["core_deg"]))


@pytest.mark.parametrize("seed,k", [(0, 2), (1, 2), (2, 3), (3, 3)])
def test_random_graphs(ray_session, seed, k):
    rng = np.random.default_rng(seed)
    n = 60
    m = 150
    pairs = [
        (f"n{int(a)}", f"n{int(b)}")
        for a, b in rng.integers(0, n, size=(m, 2))
        if a != b
    ]
    assert run_engine(pairs, k) == serial_kcore(pairs, k)


def test_triangle_plus_tail(ray_session):
    # triangle is a 2-core; the tail peels away (in two rounds: d, then c)
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    got = run_engine(pairs, 2)
    assert got == {"a": 2, "b": 2, "c": 2}


def test_duplicate_and_self_edges_ignored(ray_session):
    pairs = [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("a", "c")]
    got = run_engine(pairs, 2)
    assert got == {"a": 2, "b": 2, "c": 2}


def test_empty_core(ray_session):
    # a path has no 2-core
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    assert run_engine(pairs, 2) == {}
