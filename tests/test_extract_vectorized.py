"""Vectorized extraction equivalence: the corpus-join MentionDetector must
emit EXACTLY the per-row finditer mentions (including spans), and
RecordExtractor must keep every chemical of a multi-chemical turn."""

import re

import pyarrow as pa
import pytest


def _turns(texts):
    return pa.table(
        {
            "conv_id": pa.array([f"c{i:03d}" for i in range(len(texts))], pa.string()),
            "turn_idx": pa.array(list(range(len(texts))), pa.int32()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _reference_mentions(texts):
    from entity_extractor_ray.stages.extract import MentionDetector

    out = set()
    for i, text in enumerate(texts):
        if not text:
            continue
        for label, pat in MentionDetector.LABEL_PATTERNS:
            for m in re.compile(pat).finditer(text):
                out.add((f"c{i:03d}", i, m.group(1), label, m.start(1), m.end(1)))
    return out


ADVERSARIAL = [
    'We are reviewing material "Steel X" supplied by "Acme Corp".',
    "",
    None,
    'It contains ingredient "PFOA" with CAS 335-67-1 at 1.5% tagged PFAS (source OECD).',
    # row ends with a literal prefix: the separator must not fabricate a match
    "trailing prefix supplied by ",
    'then a quoted "thing" follows here',
    'two mentions: supplied by "A" and supplied by "B" in one turn',
    "CAS 50-00-0 and CAS 7732-18-5 twice at 2.0% tagged NO_PFAS",
    '"unbalanced quote start',
    'unbalanced quote end"',
]


class TestMentionDetectorVectorized:
    def test_equivalent_to_per_row_finditer(self):
        from entity_extractor_ray.stages.extract import MentionDetector

        det = MentionDetector()
        got = det(_turns(ADVERSARIAL))
        got_set = {
            (r["conv_id"], r["turn_idx"], r["mention"], r["label"], r["span_start"], r["span_end"])
            for r in got.to_pylist()
        }
        assert got_set == _reference_mentions(ADVERSARIAL)

    def test_spans_slice_back_to_mentions(self):
        from entity_extractor_ray.stages.extract import MentionDetector

        texts = [t for t in ADVERSARIAL if t]
        got = MentionDetector()(_turns(texts)).to_pylist()
        assert got
        for r in got:
            assert texts[r["turn_idx"]][r["span_start"] : r["span_end"]] == r["mention"]


class TestMultiChemicalTurn:
    def test_all_chemicals_of_a_turn_extracted(self):
        from entity_extractor_ray.stages.extract import RecordExtractor

        two = (
            'It contains ingredient "PFOA" with CAS 335-67-1 at 1.5% tagged PFAS (source OECD). '
            'It contains ingredient "Water" at 90.0% tagged NO_PFAS (source VAI).'
        )
        one = 'It contains ingredient "PFOS" with CAS 1763-23-1 at 0.5% tagged PFAS (source VAI).'
        from entity_extractor_ray.stages.extract import unpack_extraction

        out = unpack_extraction(RecordExtractor()(_turns([two, one])))
        chems = [r for r in out.to_pylist() if r["kind"] == "CHEMICAL"]
        names = sorted(c["name"] for c in chems)
        assert names == ["PFOA", "PFOS", "Water"]
        pfoa = next(c for c in chems if c["name"] == "PFOA")
        assert pfoa["cas"] == "335-67-1" and pfoa["tag"] == "PFAS"
        water = next(c for c in chems if c["name"] == "Water")
        assert water["cas"] is None and water["source"] == "VAI"

    def test_oracle_also_keeps_all_chemicals(self):
        from entity_extractor_ray import oracle as orc

        t = pa.table(
            {
                "conv_id": pa.array(["c0"] * 2, pa.string()),
                "turn_idx": pa.array([0, 1], pa.int32()),
                "text": pa.array(
                    [
                        'We are reviewing material "M" supplied by "V".',
                        'It contains ingredient "A" at 1.0% tagged PFAS (source OECD). '
                        'It contains ingredient "B" at 2.0% tagged NO_PFAS (source VAI).',
                    ],
                    pa.string(),
                ),
            }
        )
        store = orc.run_oracle(t)
        contains = {(s, o) for (c, s, p, o) in store.triples if p == "CONTAINS"}
        assert contains == {("M", "A"), ("M", "B")}


class TestPayloadPacking:
    def test_escaping_roundtrip_adversarial(self):
        from entity_extractor_ray.stages.extract import (
            pack_payload_str,
            unpack_payload_str,
        )

        cases = [
            ["plain", "two words"],
            ["has\x1fsep", "has\x1eesc"],
            ["\x1e1", "\x1e0"],          # strings that LOOK like escapes
            ["\x1f\x1f", "\x1e\x1f\x1e"],
            ["", "trailing empty", ""],
            ["unicode ✓", "日本語"],
        ]
        for fields in cases:
            assert unpack_payload_str(pack_payload_str(fields)) == fields

    def test_vectorized_pack_matches_python_pack(self):
        import pyarrow as pa

        from entity_extractor_ray.stages.extract import (
            pack_payload,
            pack_payload_str,
        )

        cols = [
            pa.array(["a", "x\x1fy", None, "\x1e"], pa.string()),
            pa.array(["b", "\x1e0", "", "z"], pa.string()),
        ]
        got = pack_payload(cols).to_pylist()
        want = [
            pack_payload_str([a or "", b or ""])
            for a, b in zip(cols[0].to_pylist(), cols[1].to_pylist())
        ]
        assert got == want
