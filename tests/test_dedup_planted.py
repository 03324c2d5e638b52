"""Dedup quality on planted near-duplicates: the LSH/SimHash pipelines must
FIND the planted pairs (recall) and not link unrelated docs (precision)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _planted_docs():
    """30 base docs; docs 100+i are near-copies of doc i for i in 0..9
    (one word changed); the rest are unrelated word soups."""
    rng = np.random.RandomState(3)
    vocab = [f"word{j}" for j in range(500)]
    texts = {}
    for i in range(30):
        words = [vocab[rng.randint(0, len(vocab))] for _ in range(60)]
        texts[i] = " ".join(words)
    for i in range(10):
        words = texts[i].split()
        words[5] = "CHANGED"
        texts[100 + i] = " ".join(words)
    return pa.table(
        {
            "doc_id": pa.array(list(texts.keys()), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_planted_docs())


class TestMinHashDedup:
    def test_planted_pairs_found(self, docs_ds):
        from entity_extractor_ray.stages.dedup import minhash_dedup

        clusters = minhash_dedup(docs_ds, threshold=0.6, concurrency=2).to_pandas()
        cmap = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
        for i in range(10):
            assert cmap[i] == cmap[100 + i], f"planted pair {i} not clustered"
        # unrelated docs stay singletons
        base_clusters = [cmap[i] for i in range(10, 30)]
        assert len(set(base_clusters)) == 20

    def test_exact_dedup_no_false_merges(self, docs_ds):
        from entity_extractor_ray.stages.dedup import exact_dedup

        out = exact_dedup(docs_ds).to_pandas()
        assert len(out) == 40  # all texts distinct -> all survive


class TestSimHash:
    def test_planted_pairs_within_hamming(self, docs_ds):
        from entity_extractor_ray.stages.dedup import simhash_near_pairs

        pairs = simhash_near_pairs(docs_ds, hamming_max=10, concurrency=2).to_pandas()
        found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
        hits = sum(1 for i in range(10) if (i, 100 + i) in found)
        assert hits >= 7  # SimHash blocking is approximate; most pairs found
        # precision: no pair between two unrelated base docs
        for a, b in found:
            if a < 100 and b < 100:
                pytest.fail(f"unrelated docs {a},{b} linked")


class TestNgramJaccard:
    def test_verified_pairs_exceed_threshold(self, docs_ds):
        from entity_extractor_ray.stages.dedup import (
            minhash_candidate_pairs,
            verify_jaccard_pairs,
        )

        pairs = verify_jaccard_pairs(
            minhash_candidate_pairs(docs_ds, concurrency=2), docs_ds,
            threshold=0.5, use_words=True,
        ).to_pandas()
        assert (pairs["jaccard"] >= 0.5).all()
        found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
        assert sum(1 for i in range(10) if (i, 100 + i) in found) >= 8


class TestEmbeddingDedup:
    def test_hash_embedding_pairs(self, ray_session, docs_ds):
        import ray.data as rd

        from entity_extractor_ray.stages.chunk import embed_documents
        from entity_extractor_ray.stages.dedup import embedding_cosine_pairs

        embedded = embed_documents(docs_ds, concurrency=2).map_batches(
            lambda t: pa.table(
                {"vec_id": t.column("doc_id"), "embedding": t.column("embedding")}
            ),
            batch_format="pyarrow",
        )
        pairs = embedding_cosine_pairs(embedded, threshold=0.95).to_pandas()
        found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
        assert sum(1 for i in range(10) if (i, 100 + i) in found) >= 9
        for a, b in found:
            if a < 100 and b < 100:
                pytest.fail(f"unrelated docs {a},{b} linked by embedding")


# ------------------------------------------------ duplicated n-gram spans

@pytest.mark.usefixtures("ray_session")
def test_duplicate_ngram_spans_planted():
    import ray.data as rd

    from entity_extractor_ray.stages.dedup import duplicate_ngram_spans

    shared = " ".join(f"tok{i}" for i in range(13))  # one exact 13-gram
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                f"alpha beta {shared} gamma delta",       # dup at pos 2
                f"{shared} epsilon zeta",                  # dup at pos 0
                "nothing repeated here at all",            # no dup
            ],
        }
    )
    out = (
        duplicate_ngram_spans(rd.from_pandas(docs).repartition(2), k=13, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1]
    assert out.loc[0, ["start_tok", "end_tok", "n_grams"]].tolist() == [2, 15, 1]
    assert out.loc[1, ["start_tok", "end_tok", "n_grams"]].tolist() == [0, 13, 1]


@pytest.mark.usefixtures("ray_session")
def test_duplicate_ngram_spans_within_doc_and_merge():
    import ray.data as rd

    from entity_extractor_ray.stages.dedup import duplicate_ngram_spans

    # same 4-gram twice WITHIN one doc at positions 0 and 5: gap 5 > k=4
    # would split, gap <= k merges — plant both cases
    reps = "a b c d"
    doc0 = f"{reps} x {reps}"            # positions 0 and 5, gap 5 > 4 -> two spans
    doc1 = f"{reps} {reps}"              # positions 0 and 4, gap 4 <= 4 -> one span
    docs = pd.DataFrame({"doc_id": [0, 1], "text": [doc0, doc1]})
    out = (
        duplicate_ngram_spans(rd.from_pandas(docs), k=4, n_buckets=2)
        .to_pandas()
        .sort_values(["doc_id", "start_tok"])
        .reset_index(drop=True)
    )
    d0 = out[out["doc_id"] == 0]
    assert list(map(tuple, d0[["start_tok", "end_tok"]].to_numpy())) == [(0, 4), (5, 9)]
    d1 = out[out["doc_id"] == 1]
    # doc1 contains "a b c d a b c d": grams at 0 and 4 are the planted dup,
    # plus the bridging grams ("b c d a" etc.) are unique -> span [0, 8)
    assert list(map(tuple, d1[["start_tok", "end_tok"]].to_numpy())) == [(0, 8)]


class TestTfidfCosine:
    """Planted + serial-reference tests for the weighted APSS operator."""

    @staticmethod
    def _ds(texts: dict):
        import ray.data as rd

        t = pa.table(
            {
                "doc_id": pa.array(list(texts.keys()), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        )
        return rd.from_arrow(t).repartition(3)

    @staticmethod
    def _serial(texts: dict, threshold, min_df=2, max_df=None):
        """Pure-Python reference with the same integer microgrid weights."""
        import math
        import re

        tok = re.compile(r"[a-z0-9]+")
        tfs = {d: {} for d in texts}
        for d, t in texts.items():
            for w in tok.findall((t or "").lower()):
                tfs[d][w] = tfs[d].get(w, 0) + 1
        df: dict = {}
        for d in tfs:
            for w in tfs[d]:
                df[w] = df.get(w, 0) + 1
        n = len(texts)
        vecs = {}
        for d in tfs:
            v = {}
            for w, tf in tfs[d].items():
                if df[w] < min_df or (max_df is not None and df[w] > max_df):
                    continue
                v[w] = tf * math.floor((math.log((n + 1) / (df[w] + 1)) + 1) * 1e6)
            vecs[d] = v
        out = {}
        ids = sorted(vecs)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                dot = sum(wa * vecs[b].get(t, 0) for t, wa in vecs[a].items())
                if dot == 0:
                    continue
                na = sum(x * x for x in vecs[a].values())
                nb = sum(x * x for x in vecs[b].values())
                raw = dot / (math.sqrt(na) * math.sqrt(nb))
                if raw >= threshold:
                    out[(a, b)] = math.floor(raw * 1e6) / 1e6
        return out

    def test_planted_rare_term_twins(self, ray_session):
        from entity_extractor_ray.stages.dedup import tfidf_cosine_pairs

        # docs 0/1 share rare terms (near-dups); 2 shares only the
        # ubiquitous filler with them; 3 is the second filler doc that
        # keeps every term above min_df=2
        filler = "the a of and " * 5
        texts = {
            0: filler + "quantum entanglement teleportation protocol",
            1: filler + "quantum entanglement teleportation experiment",
            2: filler + "gardening compost tomato seedling",
            3: filler + "gardening compost tomato protocol experiment seedling",
        }
        out = tfidf_cosine_pairs(self._ds(texts), threshold=0.5).to_pandas()
        got = {
            (int(r.id_a), int(r.id_b)): r.cosine for r in out.itertuples()
        }
        assert (0, 1) in got
        assert got == self._serial(texts, 0.5)

    def test_serial_equality_random(self, ray_session):
        import random

        from entity_extractor_ray.stages.dedup import tfidf_cosine_pairs

        rng = random.Random(11)
        vocab = [f"v{i}" for i in range(25)]
        texts = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
            for i in range(40)
        }
        out = tfidf_cosine_pairs(self._ds(texts), threshold=0.6).to_pandas()
        got = {(int(r.id_a), int(r.id_b)): r.cosine for r in out.itertuples()}
        assert got == self._serial(texts, 0.6)

    def test_max_df_drops_hot_terms(self, ray_session):
        from entity_extractor_ray.stages.dedup import tfidf_cosine_pairs

        # 'hot' is in every doc; with max_df=3 it is excluded so the two
        # docs sharing ONLY 'hot' can no longer pair
        texts = {
            0: "hot unique0 unique0b shared shared2",
            1: "hot unique1 unique1b shared shared2",
            2: "hot only only2",
            3: "hot only only2",
        }
        full = tfidf_cosine_pairs(self._ds(texts), threshold=0.1).to_pandas()
        assert (0, 2) in {(int(r.id_a), int(r.id_b)) for r in full.itertuples()}
        capped = tfidf_cosine_pairs(
            self._ds(texts), threshold=0.1, max_df=3
        ).to_pandas()
        got = {(int(r.id_a), int(r.id_b)): r.cosine for r in capped.itertuples()}
        assert got == self._serial(texts, 0.1, max_df=3)
        assert (0, 2) not in got and (0, 1) in got and (2, 3) in got

    def test_weight_overflow_guard(self, ray_session):
        from entity_extractor_ray.stages.dedup import tfidf_cosine_pairs

        # tf large enough that tf * idf_micro crosses 2^31
        texts = {0: "boom " * 3000, 1: "boom " * 3000, 2: "calm calm"}
        with pytest.raises(Exception, match="2\\^31|overflow"):
            tfidf_cosine_pairs(self._ds(texts), threshold=0.1, min_df=2).to_pandas()


class TestNgramContainment:
    def test_quote_inside_long_doc(self, ray_session):
        import ray.data as rd

        from entity_extractor_ray.stages.dedup import ngram_containment_pairs

        quote = "alpha beta gamma delta epsilon zeta"
        long_doc = ("filler one two three four five six seven eight nine ten "
                    + quote + " closing words here and more trailing text")
        texts = {0: quote, 1: long_doc, 2: "entirely unrelated content words"}
        t = pa.table(
            {
                "doc_id": pa.array(list(texts.keys()), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        )
        out = ngram_containment_pairs(
            rd.from_arrow(t).repartition(2), threshold=0.9
        ).to_pandas()
        rows = {(int(r.id_sub), int(r.id_super)): r.containment for r in out.itertuples()}
        # every 3-gram of the quote appears in the long doc -> containment 1.0
        assert rows == {(0, 1): 1.0}

    def test_matches_jaccard_machinery_brute(self, ray_session):
        import random

        import ray.data as rd

        from entity_extractor_ray.functions.textnorm import word_ngrams
        from entity_extractor_ray.stages.dedup import ngram_containment_pairs

        rng = random.Random(5)
        vocab = [f"w{i}" for i in range(20)]
        texts = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
            for i in range(30)
        }
        t = pa.table(
            {
                "doc_id": pa.array(list(texts.keys()), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        )
        out = ngram_containment_pairs(
            rd.from_arrow(t).repartition(3), threshold=0.3
        ).to_pandas()
        got = {(int(r.id_sub), int(r.id_super)): r.containment for r in out.itertuples()}
        import math

        grams = {d: word_ngrams(tx, 3) for d, tx in texts.items()}
        exp = {}
        for a in texts:
            for b in texts:
                if a == b or not grams[a]:
                    continue
                inter = len(grams[a] & grams[b])
                c = inter / len(grams[a])
                if c >= 0.3:
                    exp[(a, b)] = math.floor(c * 1e6) / 1e6
        assert got == exp


class TestCorpusOverlapMinhash:
    @staticmethod
    def _ds(texts, nparts=3):
        import ray.data as rd

        t = pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        return rd.from_arrow(t).repartition(nparts)

    def test_union_signature_merge_exact(self, ray_session):
        """The distributed merged signature must equal the serial signature
        of the concatenated corpus (signature-of-union == min-of-signatures,
        exactly — not an estimate)."""
        import random

        from entity_extractor_ray.functions import textnorm
        from entity_extractor_ray.stages.dedup import (
            SHINGLE_K,
            corpus_minhash_signature,
        )

        rng = random.Random(2)
        texts = [
            " ".join(f"tok{rng.randint(0, 80)}" for _ in range(rng.randint(5, 40)))
            for _ in range(25)
        ]
        got = corpus_minhash_signature(self._ds(texts), num_perm=32)
        a, b = textnorm.make_minhash_params(32)
        serial = textnorm.minhash_signatures_batch(texts, a, b, SHINGLE_K).min(axis=0)
        assert (got == serial).all()

    def test_identical_and_disjoint_corpora(self, ray_session):
        from entity_extractor_ray.stages.dedup import corpus_overlap_minhash

        same = ["alpha beta gamma delta epsilon"] * 4
        out = corpus_overlap_minhash(self._ds(same), self._ds(same)).iloc[0]
        assert out["jaccard_est"] == 1.0

        a = ["aaaa bbbb cccc dddd eeee ffff"] * 3
        b = ["zzzz yyyy xxxx wwww vvvv uuuu"] * 3
        lo = corpus_overlap_minhash(self._ds(a), self._ds(b)).iloc[0]
        assert lo["jaccard_est"] < 0.2  # disjoint shingles; binomial noise only

    def test_estimate_within_3_sigma(self, ray_session):
        """Half-shared vocabularies: the estimate must sit within 3 binomial
        standard errors of the true shingle-set jaccard."""
        import random

        from entity_extractor_ray.functions.textnorm import _shingle_hashes
        from entity_extractor_ray.stages.dedup import (
            SHINGLE_K,
            corpus_overlap_minhash,
        )

        rng = random.Random(9)
        shared = [" ".join(f"s{rng.randint(0,50)}" for _ in range(30)) for _ in range(10)]
        only_a = [" ".join(f"a{rng.randint(0,50)}" for _ in range(30)) for _ in range(5)]
        only_b = [" ".join(f"b{rng.randint(0,50)}" for _ in range(30)) for _ in range(5)]
        ta, tb = shared + only_a, shared + only_b
        sa = set(np.concatenate([_shingle_hashes(t, SHINGLE_K) for t in ta]).tolist())
        sb = set(np.concatenate([_shingle_hashes(t, SHINGLE_K) for t in tb]).tolist())
        true_j = len(sa & sb) / len(sa | sb)
        out = corpus_overlap_minhash(self._ds(ta), self._ds(tb), num_perm=256).iloc[0]
        se = (true_j * (1 - true_j) / 256) ** 0.5
        assert abs(out["jaccard_est"] - true_j) <= 3 * se + 1e-9

    def test_empty_side_guard(self, ray_session):
        from entity_extractor_ray.stages.dedup import corpus_overlap_minhash

        out = corpus_overlap_minhash(self._ds([""]), self._ds(["some words here"]))
        assert out.iloc[0]["n_match"] == 0 and pd.isna(out.iloc[0]["jaccard_est"])


@pytest.mark.usefixtures("ray_session")
def test_dedup_reweight_planted_cluster_sizes():
    import ray.data as rd

    from entity_extractor_ray.stages.dedup import dedup_reweight

    docs = _planted_docs()  # docs 100+i near-copies of doc i for i in 0..9
    out = dedup_reweight(rd.from_arrow(docs).repartition(3)).to_pandas()
    w = dict(zip(out["doc_id"], out["weight"]))
    # total mass is preserved exactly
    assert sum(w.values()) == docs.num_rows
    # each planted pair collapses to rep i (min id) with weight 2
    for i in range(10):
        assert w[i] == 2 and 100 + i not in w
    # unrelated docs survive as their own singleton
    for i in range(10, 30):
        assert w[i] == 1


class TestMinhashDelta:
    def test_delta_equals_full_run_restricted_to_new(self, ray_session):
        import ray.data as rd

        from entity_extractor_ray.stages.dedup import (
            minhash_candidate_pairs,
            minhash_dedup_delta,
            minhash_index_rows,
            verify_jaccard_pairs,
        )

        docs = _planted_docs().to_pandas()
        # old corpus = all docs except two planted near-copies; new batch =
        # docs 105/106 (near-copies of 5/6) plus a fresh near-copy pair
        new_ids = {105, 106, 200, 201}
        base = docs[~docs["doc_id"].isin(new_ids)]
        extra = pd.DataFrame(
            {
                "doc_id": [200, 201],
                "text": ["brand new shared content words " * 8 + "alpha",
                         "brand new shared content words " * 8 + "beta"],
            }
        )
        old_df = base
        new_df = pd.concat(
            [docs[docs["doc_id"].isin({105, 106})], extra], ignore_index=True
        )
        union_df = pd.concat([old_df, new_df], ignore_index=True)

        def _arrow(df):
            return rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                        "text": pa.array(df["text"].tolist(), pa.string()),
                    }
                )
            )

        old_ds = _arrow(old_df).repartition(3)
        new_ds = _arrow(new_df).repartition(2)
        union_ds = _arrow(union_df).repartition(3)

        got = minhash_dedup_delta(
            minhash_index_rows(old_ds), new_ds, union_ds, threshold=0.3,
            n_buckets=4,
        ).to_pandas()
        got_pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}

        # reference: FULL run on the union, restricted to pairs with a new side
        full = verify_jaccard_pairs(
            minhash_candidate_pairs(union_ds, n_buckets=4), union_ds,
            threshold=0.3, use_words=True,
        ).to_pandas()
        exp = {
            (int(a), int(b))
            for a, b in zip(full["id_a"], full["id_b"])
            if a in new_ids or b in new_ids
        }
        assert got_pairs == exp
        # the planted expectations themselves: new-vs-old copies found,
        # new-vs-new pair found, and NO old-old pair leaks into the delta
        assert (5, 105) in got_pairs and (6, 106) in got_pairs
        assert (200, 201) in got_pairs
        assert not any(a not in new_ids and b not in new_ids
                       for a, b in got_pairs)
