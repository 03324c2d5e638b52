"""Unit tests for individual stages: chunking, embedding, multimodal
plumbing, dedup kernels, mention detection."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from entity_extractor_ray.functions import textnorm as tn
from entity_extractor_ray.stages.chunk import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    HashingEmbedder,
    chunk_text,
)
from entity_extractor_ray.stages.extract import MentionDetector, RecordExtractor
from entity_extractor_ray.stages.multimodal import (
    ImageDecodeStub,
    synth_media_table,
)


class TestChunker:
    def test_short_doc_single_chunk(self):
        out = chunk_text(pd.DataFrame({"doc_id": [1], "text": ["abc"]}))
        assert out.num_rows == 1
        assert out.column("chunk_text")[0].as_py() == "abc"

    def test_long_doc_overlap(self):
        text = "x" * (CHUNK_SIZE + 10)
        out = chunk_text(pd.DataFrame({"doc_id": [1], "text": [text]}))
        assert out.num_rows == 2
        chunks = out.column("chunk_text").to_pylist()
        assert len(chunks[0]) == CHUNK_SIZE
        # second chunk starts at stride offset => overlap preserved
        assert len(chunks[1]) == CHUNK_SIZE + 10 - (CHUNK_SIZE - CHUNK_OVERLAP)

    def test_empty_doc_dropped(self):
        out = chunk_text(pd.DataFrame({"doc_id": [1, 2], "text": ["", "hi"]}))
        assert out.column("doc_id").to_pylist() == [2]


class TestSemanticChunker:
    """Semantic chunker (reference primary M15 path: interquartile
    breakpoints over consecutive-sentence embedding distances)."""

    def _mk(self):
        from entity_extractor_ray.stages.chunk import SemanticChunkerStage

        return SemanticChunkerStage()

    TOPIC_A = [
        "The polymer coating contains fluorinated surfactant compounds.",
        "Fluorinated surfactant ratios control the polymer coating thickness.",
        "The coating polymer binds the fluorinated surfactant evenly.",
        "Surfactant and polymer compounds coat the fluorinated layer.",
        "Polymer surfactant coatings resist fluorinated compound wear.",
        "The fluorinated polymer surfactant coating cures slowly.",
    ]
    TOPIC_B = [
        "The recipe uses fresh basil and ripe tomato sauce.",
        "Fresh tomato sauce simmers with basil in the recipe.",
        "Basil leaves finish the tomato sauce recipe nicely.",
        "The sauce recipe blends tomato and fresh basil again.",
        "Ripe tomato and basil make the sauce recipe sing.",
        "Basil tomato sauce completes the fresh recipe.",
    ]

    def test_topic_boundary_splits(self):
        text = " ".join(self.TOPIC_A + self.TOPIC_B)
        out = self._mk()(pd.DataFrame({"doc_id": [1], "text": [text]}))
        chunks = out.column("chunk_text").to_pylist()
        assert len(chunks) >= 2
        # the topic-A vocabulary never bleeds into the last chunk and vice versa
        assert "polymer" in chunks[0] and "basil" not in chunks[0]
        assert "basil" in chunks[-1] and "polymer" not in chunks[-1]

    def test_single_sentence_single_chunk(self):
        out = self._mk()(pd.DataFrame({"doc_id": [1], "text": ["One sentence only."]}))
        assert out.num_rows == 1
        assert out.column("chunk_idx").to_pylist() == [0]

    def test_empty_doc_dropped_and_deterministic(self):
        df = pd.DataFrame(
            {"doc_id": [1, 2], "text": ["", " ".join(self.TOPIC_A + self.TOPIC_B)]}
        )
        a = self._mk()(df)
        b = self._mk()(df)
        assert set(a.column("doc_id").to_pylist()) == {2}
        assert a.column("chunk_text").to_pylist() == b.column("chunk_text").to_pylist()

    def test_uniform_doc_one_chunk(self):
        # no topic shift -> distances cluster tightly; IQR rule yields few or
        # no breaks, and every sentence survives in order
        text = " ".join(self.TOPIC_A)
        out = self._mk()(pd.DataFrame({"doc_id": [1], "text": [text]}))
        joined = " ".join(out.column("chunk_text").to_pylist())
        assert joined == text


class TestEmbedder:
    def test_deterministic_and_normalized(self):
        emb = HashingEmbedder()
        batch = pd.DataFrame({"doc_id": [1, 2], "text": ["hello world", "hello world"]})
        out = emb(batch)
        vecs = np.array(out.column("embedding").to_pylist())
        assert vecs.shape == (2, 64)
        assert np.allclose(vecs[0], vecs[1])
        assert np.allclose(np.linalg.norm(vecs, axis=1), 1.0)

    def test_similar_texts_closer(self):
        emb = HashingEmbedder()
        batch = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the quick brown fox jumps",
                    "the quick brown fox leaps",
                    "entirely unrelated topic matter here",
                ],
            }
        )
        vecs = np.array(emb(batch).column("embedding").to_pylist())
        near = vecs[0] @ vecs[1]
        far = vecs[0] @ vecs[2]
        assert near > far


class TestMultimodal:
    def test_synth_table_schema(self):
        t = synth_media_table(8)
        assert t.num_rows == 8
        assert t.schema.field("payload").type == pa.binary()

    def test_decode_stub_features(self):
        stub = ImageDecodeStub(strict=False)
        out = stub(synth_media_table(8))
        assert out.num_rows == 8
        feats = out.column("features").to_pylist()
        assert all(len(f) == 8 for f in feats)
        # deterministic
        out2 = stub(synth_media_table(8))
        assert out.column("sha16").to_pylist() == out2.column("sha16").to_pylist()

    def test_strict_raises_without_codec(self):
        stub = ImageDecodeStub(strict=True)
        if stub.pil:
            pytest.skip("PIL available in this environment")
        with pytest.raises(NotImplementedError):
            stub(synth_media_table(2))

    def test_pil_path_when_available(self, monkeypatch):
        """When PIL IS importable the decode path must genuinely decode
        (pixel moments, not byte moments) while the byte-derived columns
        (payload_md5/sha16/n_bytes) stay identical to the stub path — the
        container has no PIL, so a minimal fake codec stands in."""
        import sys
        import types

        import numpy as np

        class FakeImg:
            width, height = 4, 4

            def convert(self, mode):
                return self

            def __array__(self, dtype=None, copy=None):
                return np.full((4, 4), 7, dtype=dtype or np.float32)

        fake_image_mod = types.ModuleType("PIL.Image")
        fake_image_mod.open = lambda fh: FakeImg()
        fake_pil = types.ModuleType("PIL")
        fake_pil.Image = fake_image_mod
        monkeypatch.setitem(sys.modules, "PIL", fake_pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

        table = synth_media_table(6)
        real = ImageDecodeStub(strict=False)
        assert real.pil
        out_real = real(table)

        # stub comparison: force the byte-moment path
        stub = ImageDecodeStub(strict=False)
        stub.pil = False
        out_stub = stub(table)

        # byte-derived columns are decode-independent
        for col in ("payload_md5", "sha16", "n_bytes"):
            assert out_real.column(col).to_pylist() == out_stub.column(col).to_pylist()
        # image rows (mime image/*) got PIXEL moments: constant image 7s
        feats = out_real.column("features").to_pylist()
        mimes = out_real.column("mime").to_pylist()
        img_feats = [f for f, m in zip(feats, mimes) if m.startswith("image/")]
        assert img_feats and all(f[0] == 7.0 and f[1] == 0.0 for f in img_feats)
        # audio rows keep byte moments (non-image mime never hits the codec)
        aud = [f for f, m in zip(feats, mimes) if m == "audio/wav"]
        aud_stub = [
            f for f, m in zip(out_stub.column("features").to_pylist(), mimes)
            if m == "audio/wav"
        ]
        assert aud == aud_stub

    def test_pil_corrupt_payload_strict_vs_fallback(self, monkeypatch):
        import sys
        import types

        fake_image_mod = types.ModuleType("PIL.Image")

        def _raise(fh):
            raise OSError("cannot identify image file")

        fake_image_mod.open = _raise
        fake_pil = types.ModuleType("PIL")
        fake_pil.Image = fake_image_mod
        monkeypatch.setitem(sys.modules, "PIL", fake_pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

        table = synth_media_table(3)
        strict = ImageDecodeStub(strict=True)
        strict.pil = True
        with pytest.raises(OSError):
            strict(table)
        lax = ImageDecodeStub(strict=False)
        lax.pil = True
        out = lax(table)  # falls back to byte moments
        assert out.num_rows == 3


class TestMentionDetector:
    def test_spans_and_labels(self):
        det = MentionDetector()
        batch = pa.table(
            {
                "conv_id": pa.array(["c1"]),
                "turn_idx": pa.array([0], pa.int32()),
                "text": pa.array(
                    ['We are reviewing material "Foam 1" supplied by "Acme Corp".']
                ),
            }
        )
        out = det(batch)
        labels = dict(zip(out.column("label").to_pylist(), out.column("mention").to_pylist()))
        assert labels["MATERIAL"] == "Foam 1"
        assert labels["MANUFACTURER"] == "Acme Corp"
        # span correctness: slicing the text at the span reproduces the mention
        text = batch.column("text")[0].as_py()
        for row in out.to_pylist():
            assert text[row["span_start"]:row["span_end"]] == row["mention"]


class TestRecordExtractor:
    def test_chemical_with_and_without_cas(self):
        ex = RecordExtractor()
        batch = pa.table(
            {
                "conv_id": pa.array(["c", "c"]),
                "turn_idx": pa.array([0, 1], pa.int32()),
                "text": pa.array(
                    [
                        'It contains ingredient "A B" with CAS 50-00-0 at 1.5% tagged PFAS (source OECD).',
                        'It contains ingredient "C" at 2.0% tagged NO_PFAS (source NONE).',
                    ]
                ),
            }
        )
        from entity_extractor_ray.stages.extract import unpack_extraction

        rows = unpack_extraction(ex(batch)).to_pylist()
        by_name = {r["name"]: r for r in rows}
        assert by_name["A B"]["cas"] == "50-00-0"
        assert by_name["C"]["cas"] is None
        assert by_name["C"]["tag"] == "NO_PFAS"


class TestTextnormKernels:
    def test_minhash_jaccard_correlation(self):
        a, b = tn.make_minhash_params(128)
        s1 = tn.minhash_signature("the cat sat on the mat today", a, b)
        s2 = tn.minhash_signature("the cat sat on the mat yesterday", a, b)
        est = (s1 == s2).mean()
        true = tn.jaccard(
            tn.char_shingles("the cat sat on the mat today"),
            tn.char_shingles("the cat sat on the mat yesterday"),
        )
        assert abs(est - true) < 0.25

    def test_rolling_fingerprint_locality(self):
        f1 = set(tn.rolling_fingerprint("the quick brown fox jumps over the lazy dog again and again"))
        f2 = set(tn.rolling_fingerprint("the quick brown fox jumps over the lazy dog again and again!"))
        f3 = set(tn.rolling_fingerprint("completely different content with other words entirely"))
        assert tn.jaccard(f1, f2) > tn.jaccard(f1, f3)

    def test_stable_id_no_collision_on_parts(self):
        assert tn.stable_id("a", "b c") != tn.stable_id("a b", "c")
        # None is canonicalized to "" by design (nullable key parts)
        assert tn.stable_id("x", None) == tn.stable_id("x", "")


class TestVectorStore:
    def test_write_read_roundtrip(self, ray_session, sf_dir, tmp_path):
        import glob
        import os

        import ray.data as rd

        from entity_extractor_ray.stages.chunk import (
            EMBED_DIM,
            embed_documents,
            read_vector_store,
            write_vector_store,
        )

        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
        n_docs = docs.count()
        out = str(tmp_path / "vstore")
        manifest = write_vector_store(embed_documents(docs), out, n_shards=4)
        assert manifest["rows"] == n_docs
        assert manifest["dim"] == EMBED_DIM
        shard_dirs = glob.glob(os.path.join(out, "shard=*"))
        assert 1 <= len(shard_dirs) <= 4
        back = read_vector_store(out)
        assert back.count() == n_docs
        row = back.take(1)[0]
        assert len(row["embedding"]) == EMBED_DIM


class TestSectionContext:
    """RAG section-context retrieval (reference pgvector side-channel:
    per-doc chunk ranking by L2 distance to a section query embedding)."""

    SECTIONS = {
        "Material": "material name product number manufacturer",
        "Chemical": "chemical ingredient cas composition percent",
    }

    def _chunks(self):
        import itertools

        words = ["material", "chemical", "cas", "polymer", "manufacturer",
                 "composition", "solvent", "number"]
        rows = []
        for doc in range(3):
            for ci in range(6):
                picks = list(itertools.islice(
                    itertools.cycle(words), doc + ci, doc + ci + 4))
                rows.append((doc, ci, " ".join(picks) + f" item{doc}_{ci}"))
        return rows

    def test_matches_bruteforce_exactly(self, ray_session):
        import ray.data as rd

        from entity_extractor_ray.stages.chunk import (
            HashingEmbedder, embed_chunks_with_text,
        )
        from entity_extractor_ray.stages.similarity import (
            retrieve_section_context,
        )

        rows = self._chunks()
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "chunk_idx": pa.array([r[1] for r in rows], pa.int64()),
                "chunk_text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        ds = rd.from_arrow(t).repartition(4)  # chunks of one doc span blocks
        out = retrieve_section_context(
            embed_chunks_with_text(ds), self.SECTIONS, k=3, n_buckets=4
        ).take_all()

        he = HashingEmbedder()
        E = he.encode_texts([r[2] for r in rows])
        names = sorted(self.SECTIONS)
        Q = he.encode_texts([self.SECTIONS[n] for n in names])
        sims = E @ Q.T
        import numpy as np

        l2 = np.round(np.sqrt(np.maximum(0.0, 2.0 - 2.0 * sims)), 9)
        want = set()
        for si, section in enumerate(names):
            for doc in range(3):
                idx = [i for i, r in enumerate(rows) if r[0] == doc]
                order = sorted(idx, key=lambda i: (l2[i, si], rows[i][1]))
                for rank, i in enumerate(order[:3]):
                    want.add((doc, section, rank, rows[i][1]))
        got = {(r["doc_id"], r["section"], r["rank"], r["chunk_idx"]) for r in out}
        assert got == want

    def test_doc_scoped_and_k_capped(self, ray_session):
        import ray.data as rd

        from entity_extractor_ray.stages.chunk import embed_chunks_with_text
        from entity_extractor_ray.stages.similarity import (
            retrieve_section_context,
        )

        rows = self._chunks()
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "chunk_idx": pa.array([r[1] for r in rows], pa.int64()),
                "chunk_text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        out = retrieve_section_context(
            embed_chunks_with_text(rd.from_arrow(t)), self.SECTIONS, k=5,
            n_buckets=2,
        ).take_all()
        per_key = {}
        valid = {(r[0], r[1]) for r in rows}
        for r in out:
            assert (r["doc_id"], r["chunk_idx"]) in valid
            per_key.setdefault((r["doc_id"], r["section"]), []).append(r["rank"])
        for (doc, section), ranks in per_key.items():
            assert sorted(ranks) == list(range(len(ranks)))
            assert len(ranks) <= 5
        # every (doc, section) pair produced rows
        assert len(per_key) == 3 * 2


class TestDecontaminate:
    """Planted-contamination tests for the broadcast snippet scan."""

    @staticmethod
    def _docs(rows):
        import ray.data as rd

        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in rows], pa.int64()
                ),
            }
        )
        return rd.from_arrow(t).repartition(3)

    def test_planted_cross_contamination(self, ray_session):
        from entity_extractor_ray.stages.decontam import decontaminate

        eval_text = "E" * 19 + "the quick brown fox jumps over the lazy dog again and again" + "E" * 60
        # doc 5 verbatim-contains the eval snippet (chars 20..79 of doc 0)
        contaminated = "prefix words " + eval_text[19:79] + " suffix words " + "x" * 60
        clean = "a completely different document with no overlap at all " + "y" * 80
        rows = [(0, eval_text), (5, contaminated), (7, clean)]
        out = (
            decontaminate(self._docs(rows), eval_mod=1, snip_start=20,
                          snip_len=60, min_chars=120)
            .to_pandas()
            .sort_values(["doc_id", "eval_doc_id"])
            .reset_index(drop=True)
        )
        got = set(map(tuple, out[["doc_id", "eval_doc_id", "self_hit"]].itertuples(index=False)))
        # eval side: docs 0 and 5 and 7 all pass min_chars with eval_mod=1;
        # expected hits: every doc contains its own snippet (self), plus
        # doc 5 contains doc 0's snippet (the planted contamination)
        assert (5, 0, False) in got
        assert (0, 0, True) in got and (5, 5, True) in got and (7, 7, True) in got
        assert not any(d == 7 and e != 7 for d, e, _ in got)

    def test_short_docs_excluded_from_eval_side(self, ray_session):
        from entity_extractor_ray.stages.decontam import decontaminate

        rows = [(0, "tiny"), (1, "z" * 200)]
        out = decontaminate(
            self._docs(rows), eval_mod=1, snip_start=20, snip_len=60, min_chars=120
        ).to_pandas()
        # doc 0 is below min_chars: never an eval doc
        assert set(out["eval_doc_id"]) == {1}

    def test_snippet_gate_raises(self, ray_session, monkeypatch):
        from entity_extractor_ray.stages import decontam

        monkeypatch.setattr(decontam, "MAX_EVAL_SNIPPETS", 1)
        rows = [(0, "a" * 150), (1, "b" * 150)]
        with pytest.raises(ValueError, match="Aho-Corasick"):
            decontam.decontaminate(
                self._docs(rows), eval_mod=1, snip_start=20, snip_len=60, min_chars=120
            )


class TestFuzzyDecontaminate:
    """Planted + brute-force tests for the broadcast n-gram Jaccard scan."""

    @staticmethod
    def _docs(rows):
        import ray.data as rd

        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        return rd.from_arrow(t).repartition(3)

    @staticmethod
    def _brute(rows, eval_mod, n, threshold):
        from entity_extractor_ray.functions.textnorm import word_ngrams

        grams = {d: word_ngrams(t or "", n) for d, t in rows}
        ev = [d for d, _ in rows if d % eval_mod == 0 and grams[d]]
        out = {}
        for d, _ in rows:
            if d % eval_mod == 0 or not grams[d]:
                continue
            hits = []
            for e in ev:
                inter = len(grams[d] & grams[e])
                if inter == 0:
                    continue
                raw = inter / (len(grams[d]) + len(grams[e]) - inter)
                if raw >= threshold:
                    hits.append((raw, e))
            if hits:
                best = max(hits, key=lambda h: (h[0], -h[1]))
                import math

                out[d] = (best[1], math.floor(best[0] * 1e6) / 1e6, len(hits))
        return out

    def test_planted_near_duplicate(self, ray_session):
        from entity_extractor_ray.stages.decontam import fuzzy_decontaminate

        eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        near = eval_text + " lambda"        # one extra word: jaccard ~ 8/10
        far = "one two three four five six seven eight nine ten"
        rows = [(0, eval_text), (1, near), (2, far)]
        out = fuzzy_decontaminate(
            self._docs(rows), eval_mod=97, n=3, threshold=0.5
        ).to_pandas()
        assert set(out["doc_id"]) == {1}
        r = out.iloc[0]
        assert r["eval_doc_id"] == 0 and r["n_eval_hits"] == 1
        # eval: 10 words -> 8 grams, all shared; near: 11 words -> 9 grams
        assert abs(r["jaccard"] - 8 / 9) < 1e-5
        brute = self._brute(rows, 97, 3, 0.5)
        assert (r["eval_doc_id"], r["jaccard"], r["n_eval_hits"]) == brute[1]

    def test_brute_force_equality_random(self, ray_session):
        import random

        from entity_extractor_ray.stages.decontam import fuzzy_decontaminate

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(30)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
            for i in range(60)
        ]
        out = fuzzy_decontaminate(
            self._docs(rows), eval_mod=5, n=3, threshold=0.05
        ).to_pandas()
        got = {
            int(r.doc_id): (int(r.eval_doc_id), r.jaccard, int(r.n_eval_hits))
            for r in out.itertuples()
        }
        assert got == self._brute(rows, 5, 3, 0.05)

    def test_eval_gram_gate_raises(self, ray_session, monkeypatch):
        from entity_extractor_ray.stages import decontam

        monkeypatch.setattr(decontam, "MAX_EVAL_GRAM_ROWS", 1)
        rows = [(0, "a b c d e f"), (1, "g h i j k l")]
        with pytest.raises(ValueError, match="prefix-filter"):
            decontam.fuzzy_decontaminate(self._docs(rows), eval_mod=1)

    def test_argmax_tiebreak_min_eval_id(self, ray_session):
        from entity_extractor_ray.stages.decontam import fuzzy_decontaminate

        # two eval docs (ids 0 and 97) IDENTICAL -> equal jaccard vs doc 1;
        # the best match must be the smaller eval id, with both counted
        text = "p q r s t u v w"
        rows = [(0, text), (97, text), (1, text + " extra")]
        out = fuzzy_decontaminate(
            self._docs(rows), eval_mod=97, n=3, threshold=0.3
        ).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["doc_id"], r["eval_doc_id"], r["n_eval_hits"]) == (1, 0, 2)


@pytest.mark.usefixtures("ray_session")
def test_curate_by_quality_per_lang_gate():
    import ray.data as rd

    from entity_extractor_ray.stages.textstats import curate_by_quality

    # lang 'aa': clearly-separated scores; q=0.5 threshold is the median
    # score value itself and >= keeps it. lang 'bb': all identical scores
    # -> nothing is dropped.
    good = "the and for with that this from " * 30     # all stopwords, long
    bad = "xxzz qqrr ttyy"                             # no stopwords, short
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [good, good, bad, bad, bad, bad],
            "lang": ["aa", "aa", "aa", "aa", "bb", "bb"],
        }
    )
    out = curate_by_quality(rd.from_pandas(docs).repartition(3), q=0.5).to_pandas()
    kept = set(out["doc_id"])
    # 'aa' median over [g,g,b,b] -> sorted[ceil(0.5*4)-1] = the 2nd-lowest
    # (a bad score); >= keeps the two bad docs AND the two good docs
    assert {0, 1, 2, 3} <= kept
    # 'bb' all-equal scores: both survive
    assert {4, 5} <= kept
    # stricter gate: q high enough that only the good docs survive in 'aa'
    out2 = curate_by_quality(rd.from_pandas(docs).repartition(3), q=0.75).to_pandas()
    aa = out2[out2["lang"] == "aa"]
    assert set(aa["doc_id"]) == {0, 1}


@pytest.mark.usefixtures("ray_session")
def test_lm_quality_scores_corpus_like_beats_gibberish():
    import ray.data as rd

    from entity_extractor_ray.stages.textstats import lm_quality_scores

    corpusish = "the safety data sheet lists the chemical composition"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                corpusish + " " + corpusish,          # exactly corpus-like
                "zq xv wk jj pf gt bn md lr cz",      # gibberish
                corpusish,                             # corpus-like (fit data)
            ],
        }
    )
    out = (
        lm_quality_scores(rd.from_pandas(docs).repartition(2))
        .to_pandas().set_index("doc_id")
    )
    assert out.loc[0, "lm_score"] > out.loc[1, "lm_score"]
    assert out.loc[2, "lm_score"] > out.loc[1, "lm_score"]
    assert out.loc[0, "n_tokens"] == 16
    # deterministic across runs
    out2 = (
        lm_quality_scores(rd.from_pandas(docs).repartition(3))
        .to_pandas().set_index("doc_id")
    )
    assert out.loc[0, "lm_score"] == out2.loc[0, "lm_score"]


@pytest.mark.usefixtures("ray_session")
def test_lm_quality_scores_caps_vocab():
    import ray.data as rd

    from entity_extractor_ray.stages.textstats import lm_quality_scores

    # 2000 distinct tokens with a 10-token head; cap the model at 50 unigrams
    rng = np.random.default_rng(0)
    head = " ".join(["alpha beta gamma delta"] * 5)
    tail = " ".join(f"tok{i}" for i in rng.integers(0, 2000, 200))
    docs = pd.DataFrame({"doc_id": [0, 1], "text": [head, tail]})
    out = (
        lm_quality_scores(rd.from_pandas(docs), max_vocab=50, max_bigrams=50)
        .to_pandas().set_index("doc_id")
    )
    # head tokens are in-model -> better score than the capped-out tail
    assert out.loc[0, "lm_score"] > out.loc[1, "lm_score"]
