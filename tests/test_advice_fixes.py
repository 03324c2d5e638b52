"""Round-2 regression tests for the round-1 ADVICE findings:

  * bucket_hash_join widen_left/widen_right schema alignment + inner/left
    correctness (shuffle.py);
  * lookup_join falls back to the bucket join when right-side keys are
    non-unique instead of dying at probe time (shuffle.py);
  * checkpoint fingerprints include the INPUT data identity, so a changed
    input invalidates stale stage outputs (state/checkpoint.py + kg_build);
  * textstats SQL oracles are null-safe (COALESCE parity with Python);
  * union-find chain granularity divergence is pinned (test_linking_chains
    covers the adversarial chain separately).
"""

import os

import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl)


@pytest.mark.usefixtures("ray_session")
class TestBucketHashJoin:
    def _sides(self):
        left = pa.table({"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]})
        right = pa.table({"k": [2, 3, 3, 9], "rv": [20, 30, 31, 90]})
        return _ds(left), _ds(right)

    def test_inner_with_duplicate_right_keys(self):
        from entity_extractor_ray.stages.shuffle import bucket_hash_join

        left, right = self._sides()
        out = bucket_hash_join(left, right, key="k", n_buckets=4).to_pandas()
        got = sorted(map(tuple, out[["k", "lv", "rv"]].itertuples(index=False)))
        assert got == [(2, "b", 20), (3, "c", 30), (3, "c", 31)]

    def test_left_join_nulls_on_miss(self):
        from entity_extractor_ray.stages.shuffle import bucket_hash_join

        left, right = self._sides()
        out = bucket_hash_join(left, right, key="k", how="left", n_buckets=4).to_pandas()
        assert len(out) == 5  # 1,4 miss; 2 hits once; 3 hits twice
        misses = out[out["rv"].isna()]["k"].tolist()
        assert sorted(misses) == [1, 4]

    def test_union_sides_share_one_schema(self):
        # widen_right must emit columns in widen_left's order: assert the
        # join result schema is (left cols..., right cols...) exactly
        from entity_extractor_ray.stages.shuffle import bucket_hash_join

        left, right = self._sides()
        out = bucket_hash_join(left, right, key="k", n_buckets=4)
        assert out.schema().names == ["k", "lv", "rv"]


@pytest.mark.usefixtures("ray_session")
class TestLookupJoinDuplicates:
    def test_duplicate_right_keys_fall_back_to_bucket_join(self):
        from entity_extractor_ray.stages.shuffle import lookup_join

        left = _ds(pa.table({"k": [1, 2, 3], "lv": ["a", "b", "c"]}))
        right = _ds(pa.table({"k": [2, 2, 3], "rv": [20, 21, 30]}))
        out = lookup_join(left, right, key="k").to_pandas()
        got = sorted(map(tuple, out[["k", "lv", "rv"]].itertuples(index=False)))
        assert got == [(2, "b", 20), (2, "b", 21), (3, "c", 30)]

    def test_unique_right_keys_still_broadcast(self):
        from entity_extractor_ray.stages.shuffle import lookup_join

        left = _ds(pa.table({"k": [1, 2, 3], "lv": ["a", "b", "c"]}))
        right = _ds(pa.table({"k": [2, 3], "rv": [20, 30]}))
        out = lookup_join(left, right, key="k", how="left").to_pandas()
        assert len(out) == 3
        assert out.set_index("k")["rv"].to_dict()[2] == 20


@pytest.mark.usefixtures("ray_session")
class TestInputFingerprint:
    def test_changed_input_invalidates_checkpoint(self, tmp_path):
        import pyarrow.parquet as pq

        from entity_extractor_ray.state.checkpoint import input_fingerprint

        src = tmp_path / "in"
        src.mkdir()
        pq.write_table(pa.table({"x": [1, 2]}), str(src / "a.parquet"))
        fp1 = input_fingerprint(str(src))
        # same content, unchanged -> stable
        assert input_fingerprint(str(src)) == fp1
        # rewrite the file (size or mtime change) -> different fingerprint
        pq.write_table(pa.table({"x": [1, 2, 3]}), str(src / "a.parquet"))
        assert input_fingerprint(str(src)) != fp1

    def test_kg_build_rerun_detects_new_input(self, tmp_path):
        """build_kg with the same out_dir but a regenerated corpus must
        rebuild, not serve stale outputs."""
        from entity_extractor_ray.pipelines.kg_build import build_kg
        from entity_extractor_ray.sources.transcripts import TurnCorpusSpec, write_turns

        corpus = str(tmp_path / "turns")
        out_dir = str(tmp_path / "kg")
        write_turns(corpus, TurnCorpusSpec(n_convs=8, seed=1), num_files=1)
        r1 = build_kg(corpus, out_dir=out_dir, n_buckets=4, num_join_partitions=4)
        names1 = {r["name"] for r in r1.nodes.take_all()}
        # regenerate with a different seed: different entities
        write_turns(corpus, TurnCorpusSpec(n_convs=8, seed=2), num_files=1)
        r2 = build_kg(corpus, out_dir=out_dir, n_buckets=4, num_join_partitions=4)
        names2 = {r["name"] for r in r2.nodes.take_all()}
        assert names1 and names1 != names2  # stale outputs NOT served


@pytest.mark.usefixtures("ray_session")
class TestNullSafeTextstatsOracles:
    def test_sql_matches_python_on_null_text(self):
        import duckdb

        from entity_extractor_ray.stages import textstats as ts

        docs = pd.DataFrame({"doc_id": [1, 2], "text": ["the cat and dog", None]})
        con = duckdb.connect()
        con.register("documents", docs)

        py = ts.token_counts(docs.copy()).sort_values("doc_id").reset_index(drop=True)
        sql = con.execute(ts.token_counts_sql()).df().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(py, sql, check_dtype=False)

        py_q = ts.quality_features(docs.copy()).sort_values("doc_id").reset_index(drop=True)
        sql_q = con.execute(ts.quality_features_sql()).df().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(py_q, sql_q, check_dtype=False)

        py_l = ts.lang_id(docs.copy()).sort_values("doc_id").reset_index(drop=True)
        sql_l = con.execute(ts.lang_id_sql()).df().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(py_l, sql_l, check_dtype=False)

        py_f = ts.exact_fingerprints(docs.copy()).sort_values("doc_id").reset_index(drop=True)
        sql_f = con.execute(ts.exact_fingerprints_sql()).df().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(py_f, sql_f, check_dtype=False)
