"""Bloom-filter join pruning: no false negatives ever, measured FPR near
the design point, and lookup_join's bucket fallback produces identical
results with the pruning stage in the plan."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from entity_extractor_ray.stages.shuffle import (
    bloom_contains,
    build_bloom,
    lookup_join,
)


class TestBloomKernel:
    def test_no_false_negatives_ints(self):
        keys = np.arange(0, 50000, 3, dtype=np.int64)
        bits, m, k = build_bloom(keys)
        assert bloom_contains(bits, m, k, keys).all()

    def test_no_false_negatives_strings(self):
        keys = np.array([f"key-{i:06d}" for i in range(20000)], dtype=object)
        bits, m, k = build_bloom(keys)
        assert bloom_contains(bits, m, k, keys).all()

    def test_false_positive_rate_near_design(self):
        members = np.arange(100000, dtype=np.int64)
        bits, m, k = build_bloom(members)
        probes = np.arange(1_000_000, 1_100_000, dtype=np.int64)  # disjoint
        fpr = bloom_contains(bits, m, k, probes).mean()
        assert fpr < 0.03  # design ~1% at 10 bits/key, 7 hashes

    def test_empty_filter_rejects(self):
        bits, m, k = build_bloom(np.array([], dtype=np.int64))
        assert not bloom_contains(bits, m, k, np.arange(100)).any()


@pytest.mark.usefixtures("ray_session")
class TestBloomJoinEquivalence:
    def _sides(self):
        import ray.data as rd

        rng = np.random.RandomState(7)
        left = pd.DataFrame(
            {
                "k": rng.randint(0, 10000, size=20000).astype(np.int64),
                "lv": np.arange(20000, dtype=np.int64),
            }
        )
        # selective right: only 3% of left keys can match
        right = pd.DataFrame(
            {
                "k": np.arange(0, 300, dtype=np.int64),
                "rv": np.arange(300, dtype=np.int64) * 10,
            }
        )
        return rd.from_pandas(left).repartition(4), rd.from_pandas(right)

    def _canon(self, ds):
        return (
            ds.to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )

    def test_inner_identical_with_forced_bucket_path(self):
        import entity_extractor_ray.stages.shuffle as sh

        left, right = self._sides()
        want = self._canon(lookup_join(left, right, key="k"))
        left2, right2 = self._sides()
        # force the bucket fallback (and thus the bloom prefilter) by
        # shrinking the broadcast row gate below the right side's size
        got = self._canon(
            lookup_join(left2, right2, key="k", broadcast_limit=10)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_semi_identical_with_forced_bucket_path(self):
        from entity_extractor_ray.stages.shuffle import bucket_hash_join

        left, right = self._sides()
        want = self._canon(
            bucket_hash_join(left, right, key="k", how="semi", n_buckets=4)
        )
        left2, right2 = self._sides()
        got = self._canon(
            lookup_join(left2, right2, key="k", how="semi", broadcast_limit=10)
        )
        # lookup_join(semi) falls back to the bucket join; bloom pruning
        # must not change the surviving row set
        pd.testing.assert_frame_equal(
            got[["k", "lv"]], want[["k", "lv"]]
        )
