"""A violated unique_right assertion must fail LOUDLY on BOTH join paths —
never silently multiply rows (review finding: the bucket fallback used to
lack the backstop the docstring promised)."""

import pandas as pd
import pytest
import ray.data as rd

from entity_extractor_ray.stages.shuffle import bucket_hash_join, lookup_join


def _dup_right():
    return rd.from_pandas(pd.DataFrame({"k": [1, 1, 2], "v": [10, 11, 20]}))


def _left():
    return rd.from_pandas(pd.DataFrame({"k": [1, 2, 3]}))


def test_bucket_path_raises_merge_error(ray_session):
    with pytest.raises(Exception, match="m:1|many_to_one|not unique|MergeError"):
        bucket_hash_join(
            _left(), _dup_right(), "k", n_buckets=2, unique_right=True
        ).take_all()


def test_broadcast_path_raises_on_duplicate_index(ray_session):
    # under the broadcast gates the duplicate-keyed pd.Index fails at probe
    with pytest.raises(Exception):
        lookup_join(_left(), _dup_right(), key="k", unique_right=True).take_all()


def test_true_assertion_joins_correctly(ray_session):
    right = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    out = (
        lookup_join(_left(), right, key="k", unique_right=True)
        .to_pandas()
        .sort_values("k")
    )
    assert out["k"].tolist() == [1, 2]
    assert out["v"].tolist() == [10, 20]


def test_bucket_path_true_assertion(ray_session):
    right = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    out = (
        bucket_hash_join(_left(), right, "k", n_buckets=2, unique_right=True)
        .to_pandas()
        .sort_values("k")
    )
    assert out["k"].tolist() == [1, 2]
    assert out["v"].tolist() == [10, 20]
