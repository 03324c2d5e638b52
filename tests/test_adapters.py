"""Real-model adapter plumbing, tested with injected fake heavy models.

The real packages (sentence-transformers, GLiNER) are absent in this
container; the adapters' Ray-side contract is what these tests pin:

  * the model loads ONCE PER ACTOR, never per batch (the fake factory
    writes a unique marker file per load; files == concurrency);
  * output schema identical to the deterministic stand-ins
    (HashingEmbedder / rule MentionDetector), so swapping models never
    touches downstream stages;
  * the ImportError path is actionable when the package is missing.
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def docs_table():
    n = 512
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"document number {i} about topic {i % 7}" for i in range(n)]),
        }
    )


def test_embedder_one_load_per_actor_and_schema(ray_session, docs_table, tmp_path):
    import ray.data as rd

    from entity_extractor_ray.stages import chunk as ck
    from entity_extractor_ray.stages.adapters import embed_documents_with_model

    marker_dir = str(tmp_path / "loads")
    os.makedirs(marker_dir, exist_ok=True)

    dim = ck.EMBED_DIM  # match the stand-in so the schemas compare equal

    def fake_factory(marker_dir=marker_dir, dim=dim):
        with open(os.path.join(marker_dir, uuid.uuid4().hex), "w") as fh:
            fh.write("load")

        class FakeModel:
            def encode(self, texts):
                out = np.zeros((len(texts), dim), dtype=np.float32)
                for i, t in enumerate(texts):
                    out[i, len(t) % dim] = 1.0
                return out

        return FakeModel()

    ds = rd.from_arrow(docs_table).repartition(8)
    # batch_size 32 over 512 rows => 16 batches, far more than 2 actors
    out = embed_documents_with_model(
        ds, concurrency=2, batch_size=32, model_factory=fake_factory
    ).materialize()
    assert out.count() == 512

    # the contract: loads are bounded by the POOL SIZE (an actor may never
    # start if the pool drains first), never by the batch count (16 here)
    n_loads = len(glob.glob(os.path.join(marker_dir, "*")))
    assert 1 <= n_loads <= 2, f"expected <=1 model load per actor, saw {n_loads}"

    ref = ck.embed_documents(rd.from_arrow(docs_table), concurrency=2).materialize()
    assert out.schema().names == ref.schema().names
    assert [str(t) for t in out.schema().types] == [str(t) for t in ref.schema().types]


def test_gliner_adapter_schema_and_rows(ray_session, tmp_path):
    import ray.data as rd

    from entity_extractor_ray.stages.adapters import detect_mentions_with_model
    from entity_extractor_ray.stages.extract import MENTIONS_SCHEMA

    marker_dir = str(tmp_path / "ner_loads")
    os.makedirs(marker_dir, exist_ok=True)

    def fake_factory(marker_dir=marker_dir):
        with open(os.path.join(marker_dir, uuid.uuid4().hex), "w") as fh:
            fh.write("load")

        class FakeNER:
            def predict_entities(self, text, labels):
                if "ingredient" not in text:
                    return []
                lo = text.index("ingredient") + len("ingredient ")
                return [
                    {
                        "start": lo,
                        "end": len(text),
                        "text": text[lo:],
                        "label": labels[2],
                        "score": 0.87,
                    }
                ]

        return FakeNER()

    turns = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(64)], pa.string()),
            "turn_idx": pa.array([0] * 64, pa.int32()),
            "text": pa.array(
                [
                    f"It contains ingredient Chem{i}" if i % 2 == 0 else "no entity here"
                    for i in range(64)
                ]
            ),
        }
    )
    out = detect_mentions_with_model(
        rd.from_arrow(turns).repartition(4),
        concurrency=2, batch_size=8, model_factory=fake_factory,
    ).materialize()

    got = out.to_pandas()
    assert len(got) == 32  # one mention per even row
    assert list(got.columns) == MENTIONS_SCHEMA.names
    assert set(got["label"]) == {"CHEMICAL"}
    assert (got["confidence"] == 0.87).all()
    row = got[got["conv_id"] == "c0"].iloc[0]
    assert row["mention"] == "Chem0"

    n_loads = len(glob.glob(os.path.join(marker_dir, "*")))
    assert 1 <= n_loads <= 2, f"expected <=1 model load per actor, saw {n_loads}"


def test_import_error_is_actionable():
    from entity_extractor_ray.stages.adapters import (
        GLiNERMentionDetector,
        SentenceTransformerEmbedder,
    )

    with pytest.raises(ImportError, match="sentence-transformers"):
        SentenceTransformerEmbedder()
    with pytest.raises(ImportError, match="gliner"):
        GLiNERMentionDetector()
