"""random_walks vs a serial simulator with the identical hash — exact
corpus equality on planted graphs, incl. dead ends and multi-rep walks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _edges_ds(pairs, nparts=3):
    import ray.data as rd

    t = pa.table(
        {
            "src": pa.array([a for a, _ in pairs], pa.string()),
            "dst": pa.array([b for _, b in pairs], pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(nparts)


def _serial(pairs, walks_per_node, walk_len, seed):
    from entity_extractor_ray.stages.sketches import hash63

    adj = {}
    for a, b in set(pairs):
        adj.setdefault(a, set()).add(b)
    adj = {a: np.sort(np.array(sorted(bs), dtype=object)) for a, bs in adj.items()}
    visits = set()
    for start in adj:
        for rep in range(walks_per_node):
            cur = start
            visits.add((start, rep, 0, start))
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if nbrs is None:
                    break
                # int() BEFORE the modulo: numpy uint64 % python-int
                # promotes to float64 and corrupts 63-bit hashes
                idx = int(hash63([f"{seed}|{start}|{rep}|{t}"])[0]) % len(nbrs)
                cur = nbrs[idx]
                visits.add((start, rep, t, cur))
    return visits


@pytest.mark.usefixtures("ray_session")
def test_random_walks_match_serial_simulator():
    from entity_extractor_ray.stages.graph import random_walks

    # diamond + a dead-end sink + a duplicate edge (must dedupe)
    pairs = [
        ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"),
        ("d", "sink"), ("a", "b"),  # duplicate
        ("x", "sink"),              # walk from x dies at step 2
    ]
    out = random_walks(_edges_ds(pairs), walks_per_node=3, walk_len=5,
                       seed=17, n_buckets=4).to_pandas()
    got = set(
        (r.start, int(r.rep), int(r.step), r.node) for r in out.itertuples()
    )
    assert got == _serial(pairs, 3, 5, 17)
    # no duplicate visit rows
    assert len(out) == len(got)


@pytest.mark.usefixtures("ray_session")
def test_random_walks_partition_invariance_and_coverage():
    from entity_extractor_ray.stages.graph import random_walks

    rng = np.random.RandomState(6)
    nodes = [f"n{i}" for i in range(20)]
    pairs = [
        (nodes[rng.randint(20)], nodes[rng.randint(20)]) for _ in range(60)
    ]
    ref = None
    for nparts in (1, 5):
        out = random_walks(_edges_ds(pairs, nparts), walks_per_node=2,
                           walk_len=3, seed=5, n_buckets=3).to_pandas()
        cur = sorted(
            (r.start, int(r.rep), int(r.step), r.node) for r in out.itertuples()
        )
        if ref is None:
            ref = cur
        assert cur == ref
    # every node with out-edges starts walks_per_node walks at step 0
    srcs = {a for a, _ in pairs}
    step0 = {(r[0], r[1]) for r in ref if r[2] == 0}
    assert step0 == {(s, r) for s in srcs for r in range(2)}
