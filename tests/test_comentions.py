"""material_comentions vs a brute-force co-occurrence on planted edges."""

from itertools import combinations

import pandas as pd
import pyarrow as pa
import pytest


def _edges_table(rows):
    src, dst = zip(*rows)
    n = len(rows)
    return pa.table(
        {
            "src": pa.array(list(src), pa.string()),
            "dst": pa.array(list(dst), pa.string()),
            "pred": pa.array(["CONTAINS"] * n, pa.string()),
            "weight": pa.nulls(n, pa.string()),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_comentions_match_bruteforce():
    import ray.data as rd

    from entity_extractor_ray.stages.graph import material_comentions

    rows = [
        ("m1", "c1"), ("m2", "c1"), ("m3", "c1"),       # triangle via c1
        ("m1", "c2"), ("m2", "c2"),                      # m1-m2 share 2 chems
        ("m4", "c3"),                                    # lone material
        ("m1", "c1"),                                    # duplicate edge row
    ]
    out = (
        material_comentions(rd.from_arrow(_edges_table(rows)), n_buckets=4)
        .to_pandas()
        .sort_values(["mat_a", "mat_b"])
        .reset_index(drop=True)
    )

    # brute force
    by_chem: dict = {}
    for m, c in rows:
        by_chem.setdefault(c, set()).add(m)
    expect: dict = {}
    for mats in by_chem.values():
        for a, b in combinations(sorted(mats), 2):
            expect[(a, b)] = expect.get((a, b), 0) + 1
    got = {(r.mat_a, r.mat_b): r.n_shared for r in out.itertuples()}
    assert got == expect
    assert got[("m1", "m2")] == 2  # shares c1 AND c2


@pytest.mark.usefixtures("ray_session")
def test_comentions_hot_chemical_cap(caplog):
    import logging

    import ray.data as rd

    from entity_extractor_ray.stages.graph import material_comentions

    rows = [(f"m{i}", "hot") for i in range(10)] + [("m0", "c9"), ("m1", "c9")]
    with caplog.at_level(logging.WARNING, logger="entity_extractor_ray.graph"):
        out = material_comentions(
            rd.from_arrow(_edges_table(rows)), n_buckets=2, pair_cap=5
        ).to_pandas()
    # hot chemical contributes C(5,2)=10 pairs instead of C(10,2)=45;
    # the c9 pair still appears
    pairs = set(zip(out["mat_a"], out["mat_b"]))
    assert ("m0", "m1") in pairs
    assert 10 <= len(out) <= 11  # 10 capped-hot pairs, m0-m1 may merge rows
