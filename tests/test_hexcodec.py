"""The stable-id exchange codec (arrowutil.hex_to_bin / bin_to_hex).

Round-5 scaling work packs id columns to 16-byte binary across the edges /
rollup / status-fold exchanges; these tests pin the codec's exact roundtrip
(including chunked and sliced inputs — buffer-offset arithmetic is where a
vectorized codec silently corrupts) and its loud failure on anything that is
not a pure stable-id column.
"""

import pyarrow as pa
import pytest

from entity_extractor_ray.functions.arrowutil import (
    bin_to_hex,
    hex_to_bin,
    try_hex_to_bin,
)
from entity_extractor_ray.functions.textnorm import stable_id, stable_id_bytes


def _ids(n):
    return [stable_id("T", str(i)) for i in range(n)]


class TestHexCodec:
    def test_roundtrip(self):
        ids = _ids(500)
        b = hex_to_bin(pa.array(ids))
        assert b.type == pa.binary()
        assert b.to_pylist() == [bytes.fromhex(x) for x in ids]
        assert bin_to_hex(b).to_pylist() == ids

    def test_chunked_and_sliced(self):
        ids = _ids(300)
        chunked = pa.chunked_array([pa.array(ids[:100]), pa.array(ids[100:])])
        assert bin_to_hex(hex_to_bin(chunked)).to_pylist() == ids
        sliced = pa.array(ids).slice(37, 111)
        assert bin_to_hex(hex_to_bin(sliced)).to_pylist() == ids[37:148]
        bsliced = hex_to_bin(pa.array(ids)).slice(5, 20)
        assert bin_to_hex(bsliced).to_pylist() == ids[5:25]

    def test_empty(self):
        assert len(hex_to_bin(pa.array([], pa.string()))) == 0
        assert len(bin_to_hex(pa.array([], pa.binary()))) == 0

    def test_rejects_non_stable_ids(self):
        with pytest.raises(ValueError):
            hex_to_bin(pa.array(["abc"]))
        with pytest.raises(ValueError):
            hex_to_bin(pa.array([_ids(1)[0], None]))
        with pytest.raises(ValueError):
            bin_to_hex(pa.array([b"\x00" * 15], pa.binary()))

    def test_try_fallback(self):
        assert try_hex_to_bin(pa.array(["hot-entity", "ent0001"])) is None
        # 32 chars but not hex
        assert try_hex_to_bin(pa.array(["z" * 32])) is None
        assert try_hex_to_bin(pa.array(_ids(3))) is not None

    def test_stable_id_bytes_is_stable_id(self):
        assert stable_id_bytes("A", None, "b").hex() == stable_id("A", None, "b")
