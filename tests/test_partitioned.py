"""Hive-style partitioned layout: write/read/prune/resume/compact."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from entity_extractor_ray.sources.partitioned import (
    compact_dir,
    read_partition,
    write_partitioned_by,
)


def _docs(n=300):
    rng = np.random.RandomState(2)
    return pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "lang": pa.array(list(rng.choice(["en", "de", "fr"], n)), pa.string()),
            "n_chars": pa.array(list(rng.randint(10, 500, n)), pa.int64()),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestPartitionedLayout:
    def test_roundtrip_and_prune(self, tmp_path):
        t = _docs()
        out = str(tmp_path / "p")
        vals = write_partitioned_by(rd.from_arrow(t), "lang", out)
        assert vals == ["de", "en", "fr"]
        # layout: one dir per value, each committed
        for v in vals:
            assert os.path.exists(os.path.join(out, f"lang={v}", "_SUCCESS"))
        got = read_partition(out, "lang", "en").to_pandas()
        want = t.to_pandas().query("lang == 'en'")
        assert sorted(got["doc_id"]) == sorted(want["doc_id"])
        assert (got["lang"] == "en").all()

    def test_resume_skips_committed_partitions(self, tmp_path):
        t = _docs()
        out = str(tmp_path / "p")
        write_partitioned_by(rd.from_arrow(t), "lang", out)
        # poison one committed partition's data; a re-run must NOT repair
        # it (proof the partition was skipped), while an uncommitted one
        # (manifest removed) is rebuilt
        en = sorted(glob.glob(os.path.join(out, "lang=en", "*.parquet")))
        for f in en:
            os.remove(f)
        marker = pa.table({"doc_id": pa.array([-1], pa.int64()),
                           "lang": pa.array(["en"], pa.string()),
                           "n_chars": pa.array([0], pa.int64())})
        pq.write_table(marker, os.path.join(out, "lang=en", "poison.parquet"))
        os.remove(os.path.join(out, "lang=de", "_SUCCESS"))
        write_partitioned_by(rd.from_arrow(t), "lang", out)
        got_en = read_partition(out, "lang", "en").to_pandas()
        assert list(got_en["doc_id"]) == [-1]  # skipped, poison intact
        got_de = read_partition(out, "lang", "de").to_pandas()
        want_de = _docs().to_pandas().query("lang == 'de'")
        assert sorted(got_de["doc_id"]) == sorted(want_de["doc_id"])  # rebuilt

    def test_uncommitted_read_refuses(self, tmp_path):
        t = _docs()
        out = str(tmp_path / "p")
        write_partitioned_by(rd.from_arrow(t), "lang", out)
        os.remove(os.path.join(out, "lang=fr", "_SUCCESS"))
        with pytest.raises(FileNotFoundError, match="_SUCCESS"):
            read_partition(out, "lang", "fr")

    def test_compact_dir(self, tmp_path):
        src = str(tmp_path / "small")
        os.makedirs(src)
        t = _docs(1000)
        # 20 tiny files
        for i in range(20):
            pq.write_table(t.slice(i * 50, 50), os.path.join(src, f"f{i:02d}.parquet"))
        out = str(tmp_path / "compact")
        n_out = compact_dir(src, out, target_rows=500)
        assert n_out <= 3  # 1000 rows / 500 -> 2 target files (+slack)
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        got = pq.read_table(sorted(glob.glob(os.path.join(out, "*.parquet")))[0])
        back = rd.read_parquet(out).to_pandas()
        assert sorted(back["doc_id"]) == list(range(1000))
