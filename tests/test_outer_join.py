"""Full-outer bucket join: planted unmatched-both-sides semantics."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_bucket_hash_join_outer():
    import ray.data as rd

    from entity_extractor_ray.stages.shuffle import bucket_hash_join

    left = pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
    right = pd.DataFrame({"rk": [2, 3, 4, 4], "b": ["x", "y", "z", "w"]})
    out = (
        bucket_hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", right_key="rk", how="outer", n_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "b"], na_position="last")
        .reset_index(drop=True)
    )
    # 1 left-only, 2+3 matched, 4 right-only (twice: right multiplicity kept)
    assert list(out["k"]) == [1, 2, 3, 4, 4]
    assert out["a"].tolist()[:3] == [10, 20, 30]
    assert out["a"].isna().tolist() == [False, False, False, True, True]
    assert out["b"].fillna("-").tolist() == ["-", "x", "y", "w", "z"]
    # int column stays integral (nullable) through the null-padding
    assert str(out["a"].dtype) in ("Int64", "float64", "object") or out["a"].notna().all()


@pytest.mark.usefixtures("ray_session")
def test_bucket_hash_join_outer_empty_side():
    import ray.data as rd

    from entity_extractor_ray.stages.shuffle import bucket_hash_join

    left = pd.DataFrame({"k": [1, 2], "a": [10, 20]})
    right = pd.DataFrame({"rk": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="object")})
    out = bucket_hash_join(
        rd.from_pandas(left), rd.from_pandas(right),
        key="k", right_key="rk", how="outer", n_buckets=2,
    ).to_pandas()
    assert sorted(out["k"]) == [1, 2]
    assert out["b"].isna().all()
