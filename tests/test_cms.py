"""Count-Min sketch pins: never undercounts, exact in the collision-free
regime, bounded overcount under forced collisions, and mergeable across
batch splits (the property that makes it an engine aggregate)."""

import re
from collections import Counter

import pytest
import ray.data as rd

from entity_extractor_ray.stages.sketches import cms_token_estimates

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the cat sat on the mat the end",
    "pack my box with five dozen liquor jugs",
    "the dog and the fox and the cat",
    "",
]


def _exact():
    c = Counter()
    for t in DOCS:
        c.update(re.findall(r"[a-z0-9]+", t.lower()))
    return c


def _ds(n_blocks=1):
    items = [{"doc_id": i, "text": t} for i, t in enumerate(DOCS)]
    return rd.from_items(items, override_num_blocks=n_blocks)


@pytest.mark.usefixtures("ray_session")
def test_cms_exact_when_wide():
    exact = _exact()
    probes = sorted(exact) + ["missingword"]
    got = {
        r["token"]: r["est_count"]
        for r in cms_token_estimates(_ds(), probes, width=65536, depth=4).to_pylist()
    }
    # 28 distinct tokens into 65536 columns x 4 independent rows: the min
    # over rows is exact unless a token collides in EVERY row
    assert got == {**{t: exact[t] for t in exact}, "missingword": 0}


@pytest.mark.usefixtures("ray_session")
def test_cms_never_undercounts_under_collisions():
    exact = _exact()
    n_total = sum(exact.values())
    probes = sorted(exact)
    got = {
        r["token"]: r["est_count"]
        for r in cms_token_estimates(_ds(), probes, width=4, depth=2).to_pylist()
    }
    for t in probes:
        assert exact[t] <= got[t] <= n_total


@pytest.mark.usefixtures("ray_session")
def test_cms_mergeable_across_batch_splits():
    probes = sorted(_exact())
    one = cms_token_estimates(_ds(1), probes, width=64, depth=3).to_pylist()
    many = cms_token_estimates(_ds(5), probes, width=64, depth=3).to_pylist()
    assert one == many
