"""dedup_keep_best pins: the kept member of every near-dup cluster is the
quality argmax (NOT the min-id representative), ties break to the lowest
doc_id, singletons survive as their own cluster — all against a serial
pandas reference built on the same cluster assignment."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

_STOPS = "the of and to in a is that it was for on are with as"


def _planted_docs():
    """10 near-dup families of 3 copies each + 15 singletons. Within a
    family the HIGHEST-id copy carries a stopword-rich tail, so quality
    argmax != min doc_id — the property exact_dedup/minhash_dedup's
    min-id representative would get wrong."""
    rng = np.random.RandomState(17)
    vocab = [f"tok{j}" for j in range(600)]
    texts = {}
    for f in range(10):
        base = " ".join(vocab[rng.randint(0, len(vocab))] for _ in range(60))
        words = base.split()
        w2 = list(words)
        w2[3] = "ALTERED"
        texts[f] = base
        texts[100 + f] = " ".join(w2)
        # highest id, near-copy + quality tail (stopwords raise the score)
        texts[200 + f] = base + " " + _STOPS
    for s in range(15):
        texts[500 + s] = " ".join(
            vocab[rng.randint(0, len(vocab))] for _ in range(50)
        )
    return pa.table(
        {
            "doc_id": pa.array(list(texts.keys()), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_planted_docs()).repartition(3)


class TestKeepBest:
    def test_matches_serial_reference(self, docs_ds):
        from entity_extractor_ray.stages.dedup import dedup_keep_best, minhash_dedup
        from entity_extractor_ray.stages.textstats import quality_features

        got = (
            dedup_keep_best(docs_ds, threshold=0.6)
            .to_pandas()
            .sort_values("cluster_id")
            .reset_index(drop=True)
        )
        clusters = minhash_dedup(docs_ds, threshold=0.6).to_pandas()
        quality = quality_features(docs_ds.to_pandas())
        merged = clusters.merge(
            quality[["doc_id", "quality_score"]], on="doc_id", validate="1:1"
        )
        merged = merged.sort_values(
            ["cluster_id", "quality_score", "doc_id"],
            ascending=[True, False, True],
        )
        want = (
            merged.groupby("cluster_id", sort=True)
            .agg(
                keep_doc_id=("doc_id", "first"),
                quality_score=("quality_score", "first"),
                n_members=("doc_id", "size"),
            )
            .reset_index()
            .astype({"keep_doc_id": "int64", "n_members": "int64"})
        )
        pd.testing.assert_frame_equal(got, want)

    def test_quality_beats_min_id(self, docs_ds):
        from entity_extractor_ray.stages.dedup import dedup_keep_best

        out = dedup_keep_best(docs_ds, threshold=0.6).to_pandas()
        fams = out[out["n_members"] >= 3]
        assert len(fams) == 10
        # the stopword-tailed copy (id 200+f) must win every family even
        # though the cluster representative id is the family min (f)
        assert (fams["keep_doc_id"] >= 200).all()
        assert (fams["keep_doc_id"] < 300).all()

    def test_singletons_keep_themselves(self, docs_ds):
        from entity_extractor_ray.stages.dedup import dedup_keep_best

        out = dedup_keep_best(docs_ds, threshold=0.6).to_pandas()
        singles = out[out["n_members"] == 1]
        assert len(singles) == 15
        assert (singles["keep_doc_id"] == singles["cluster_id"]).all()
