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


# ------------------------- extractor="gliner" e2e through build_kg (r5 #7)


def _make_fake_span_factory(marker_dir=None):
    """Returns a fully NESTED factory closure — cloudpickle ships it by
    VALUE (a module-level function in a test file pickles by module
    reference, which Ray workers cannot import; the in-tree sys.path
    gotcha). The fake is a GLiNER-API model backed by the synthetic
    grammar's own regexes: it emits typed spans (heads + attributes,
    correct span starts) so ModelRecordExtractor's span-order assembly
    must reconstruct EXACTLY the records the rule extractor parses — the
    strongest possible equality pin for the adapter path without the real
    package."""

    def factory():
        import os as _os
        import re
        import uuid as _uuid

        from entity_extractor_ray.stages.extract import (
            CHEMICAL_PATTERN,
            GEO_FIELDS,
            MATERIAL_PATTERN,
            PRODUCT_PATTERN,
            SUPPLIER_PATTERN,
            UPC_PATTERN,
        )

        if marker_dir:
            with open(_os.path.join(marker_dir, _uuid.uuid4().hex), "w") as fh:
                fh.write("load")

        pats = {
            "mat": re.compile(MATERIAL_PATTERN),
            "prod": re.compile(PRODUCT_PATTERN),
            "upc": re.compile(UPC_PATTERN),
            "chem": re.compile(CHEMICAL_PATTERN),
            "supp": re.compile(SUPPLIER_PATTERN),
        }

        class FakeSpanModel:
            def predict_entities(self, text, labels):
                ents = []

                def add(label, m, group):
                    g = m.group(group)
                    if g is None:
                        return
                    ents.append(
                        {"start": m.start(group), "end": m.end(group),
                         "text": g, "label": label, "score": 0.9}
                    )

                for m in pats["mat"].finditer(text):
                    add("MATERIAL", m, "material")
                    add("MANUFACTURER", m, "manufacturer")
                for m in pats["prod"].finditer(text):
                    add("PRODUCT_NO", m, "product_no")
                for m in pats["upc"].finditer(text):
                    add("UPC", m, "upc")
                for m in pats["chem"].finditer(text):
                    add("CHEMICAL", m, "name")
                    add("CAS", m, "cas")
                    add("PERCENT", m, "pct")
                    add("TAG", m, "tag")
                    add("SOURCE", m, "source")
                for m in pats["supp"].finditer(text):
                    add("SUPPLIER", m, "supplier")
                    for g in GEO_FIELDS:
                        add(g.upper(), m, g)
                return ents

        return FakeSpanModel()

    return factory


def _kg_sets(res):
    nodes = {
        (r["entity_id"], r["name"], r["node_type"], r["cas_number"],
         r["pfas_status"], r["pfas_information_source"])
        for r in res.nodes.take_all()
    }
    edges = {(r["src"], r["dst"], r["pred"], r["weight"])
             for r in res.edges.take_all()}
    triples = {(r["subj"], r["pred"], r["obj"]) for r in res.triples.take_all()}
    return nodes, edges, triples


def test_build_kg_through_gliner_adapter_identical(ray_session, tmp_path):
    from entity_extractor_ray.pipelines.kg_build import build_kg
    from entity_extractor_ray.sources.transcripts import TurnCorpusSpec, write_turns

    corpus = write_turns(
        str(tmp_path / "corpus"), TurnCorpusSpec(n_convs=60, seed=11), num_files=2
    )
    base = build_kg(corpus, out_dir=None, n_buckets=8, num_join_partitions=4)
    base_sets = _kg_sets(base)

    marker_dir = str(tmp_path / "kg_loads")
    os.makedirs(marker_dir, exist_ok=True)
    model = build_kg(
        corpus, out_dir=None, n_buckets=8, num_join_partitions=4,
        extractor="gliner",
        extractor_kwargs={
            "model_factory": _make_fake_span_factory(marker_dir),
            "concurrency": 2,
        },
    )
    model_sets = _kg_sets(model)
    for name, b, m in zip(("nodes", "edges", "triples"), base_sets, model_sets):
        assert b == m, (
            f"{name}: missing={list(b - m)[:3]} extra={list(m - b)[:3]}"
        )
    n_loads = len(glob.glob(os.path.join(marker_dir, "*")))
    assert 1 <= n_loads <= 2, f"expected <=1 model load per actor, saw {n_loads}"


def test_build_kg_gliner_auto_fallback(ray_session, tmp_path, caplog):
    import logging

    from entity_extractor_ray.pipelines.kg_build import build_kg
    from entity_extractor_ray.sources.transcripts import TurnCorpusSpec, write_turns

    corpus = write_turns(
        str(tmp_path / "corpus_fb"), TurnCorpusSpec(n_convs=20, seed=3), num_files=1
    )
    with caplog.at_level(logging.WARNING, logger="entity_extractor_ray.kg_build"):
        res = build_kg(corpus, out_dir=None, n_buckets=4, num_join_partitions=2,
                       extractor="gliner")  # package absent, no factory
    assert any("falling back" in r.message for r in caplog.records)
    assert res.nodes.count() > 0  # the rules path produced the KG

    with pytest.raises(ValueError, match="unknown extractor"):
        build_kg(corpus, extractor="nonsense")


def test_embed_documents_st_flag_and_fallback(ray_session, docs_table, caplog):
    import logging

    import ray.data as rd

    from entity_extractor_ray.stages import chunk as ck

    dim = ck.EMBED_DIM

    def fake_factory(dim=dim):  # nested in the test: cloudpickled by value
        class FakeModel:
            def encode(self, texts):
                out = np.zeros((len(texts), dim), dtype=np.float32)
                for i, t in enumerate(texts):
                    out[i, len(t) % dim] = 1.0
                return out

        return FakeModel()

    out = ck.embed_documents(
        rd.from_arrow(docs_table), embedder="st",
        embedder_kwargs={"model_factory": fake_factory, "concurrency": 2},
    ).materialize()
    assert out.count() == 512
    assert "embedding" in out.schema().names

    # package absent + no factory: logged fallback to the hashing embedder,
    # output identical to the default path
    with caplog.at_level(logging.WARNING, logger="entity_extractor_ray.chunk"):
        fb = ck.embed_documents(rd.from_arrow(docs_table), embedder="st")
        fb_df = fb.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert any("falling back" in r.message for r in caplog.records)
    ref_df = (
        ck.embed_documents(rd.from_arrow(docs_table))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert all(
        np.array_equal(a, b)
        for a, b in zip(fb_df["embedding"], ref_df["embedding"])
    )

    with pytest.raises(ValueError, match="unknown embedder"):
        ck.embed_documents(rd.from_arrow(docs_table), embedder="nonsense")


@pytest.mark.usefixtures("ray_session")
def test_rerank_documents_overlap_and_fake_cross_encoder():
    import ray.data as rd

    from entity_extractor_ray.stages.adapters import (
        CrossEncoderReranker,
        rerank_documents,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "window merge join stream all four",       # overlap 4
                    "window merge only two here",              # overlap 2
                    "window window window",                    # distinct: 1
                    "nothing relevant at all",                 # 0 -> dropped
                ],
                pa.string(),
            ),
        }
    )
    ds = rd.from_arrow(t).repartition(2)
    out = rerank_documents(ds, query="window merge join stream",
                           reranker="overlap", top_k=3).to_pandas()
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["rerank_score"].tolist() == [4.0, 2.0, 1.0]

    # fake cross-encoder: one model LOAD per actor, scores = text length
    class FakeModel:
        loads = 0

        def __init__(self):
            FakeModel.loads += 1

        def predict(self, pairs):
            return [float(len(d)) for _, d in pairs]

    scored = ds.map_batches(
        CrossEncoderReranker,
        fn_constructor_kwargs={
            "query": "q", "model_factory": FakeModel,
        },
        batch_format="pandas",
        concurrency=1,
    ).to_pandas()
    assert (scored["rerank_score"]
            == scored["text"].str.len().astype(float)).all()
