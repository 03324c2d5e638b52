"""CheckpointManager semantics: commit-last manifests, fingerprint
invalidation, atomicity of the rename."""

import json
import os

import pytest


@pytest.mark.usefixtures("ray_session")
class TestCheckpointManager:
    def _mk(self, tmp_path, fp="v1"):
        from entity_extractor_ray.state.checkpoint import CheckpointManager

        return CheckpointManager(str(tmp_path / "ck"), params_fingerprint=fp)

    def _build(self):
        import ray.data as rd

        return rd.range(100)

    def test_run_then_skip(self, tmp_path):
        ck = self._mk(tmp_path)
        ck.run("s1", self._build)
        assert ck.is_done("s1")
        calls = []

        def build_again():
            calls.append(1)
            return self._build()

        ds = ck.run("s1", build_again)
        assert not calls  # skipped
        assert ds.count() == 100
        assert ck.stage_metrics[-1]["skipped"]

    def test_fingerprint_invalidation(self, tmp_path):
        ck1 = self._mk(tmp_path, "v1")
        ck1.run("s1", self._build)
        ck2 = self._mk(tmp_path, "v2")  # params changed -> stale checkpoint
        assert not ck2.is_done("s1")
        calls = []

        def build_again():
            calls.append(1)
            return self._build()

        ck2.run("s1", build_again)
        assert calls  # rebuilt

    def test_no_manifest_means_not_done(self, tmp_path):
        ck = self._mk(tmp_path)
        ck.run("s1", self._build)
        os.remove(os.path.join(ck.stage_dir("s1"), "_SUCCESS"))
        assert not ck.is_done("s1")

    def test_manifest_rowcount_matches_files(self, tmp_path):
        ck = self._mk(tmp_path)
        ck.run("s1", self._build)
        with open(os.path.join(ck.stage_dir("s1"), "_SUCCESS")) as fh:
            m = json.load(fh)
        assert m["rows"] == 100
        assert m["files"]
