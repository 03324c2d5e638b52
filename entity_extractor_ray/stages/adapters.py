"""Optional REAL-model adapters behind the existing warm-actor interfaces.

The deterministic stand-ins (chunk.HashingEmbedder, extract.MentionDetector)
are the oracle-testable defaults; these adapters swap in a true neural
encoder / NER model with the SAME Ray plumbing and the SAME output schemas:

  * SentenceTransformerEmbedder — reference ST3/M16 semantics (a remote
    encoder warmed once per process, embedding_service.py:30-40): loads a
    sentence-transformers model ONCE per actor in ``__init__``, encodes each
    batch vectorized, emits ``embedding`` as fixed_size_list<float32, dim>
    exactly like HashingEmbedder.
  * GLiNERMentionDetector — reference ST1/M1 semantics (a warm vision/NER
    client, entity_extractor/constants.py:66-78 label vocabulary): loads a
    GLiNER model once per actor, emits MENTIONS_SCHEMA rows exactly like the
    rule-based MentionDetector (confidence = model score).

Neither package ships in this container, so both classes import their model
lazily inside ``__init__`` and raise ``ImportError`` with an actionable
message when absent; the pipeline helpers below take ``num_gpus`` /
``concurrency`` and pass them straight to ``map_batches`` so a GPU pool is a
call-site decision, not a code change. A ``model_factory`` hook lets tests
inject a fake heavy model and assert the one-load-per-actor contract without
the real dependency (tests/test_adapters.py).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .extract import MENTIONS_SCHEMA


def _load_sentence_transformer(model_name: str):
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:  # pragma: no cover - package absent here
        raise ImportError(
            "SentenceTransformerEmbedder needs the 'sentence-transformers' "
            "package (pip install sentence-transformers); for a dependency-"
            "free deterministic embedder use chunk.HashingEmbedder"
        ) from e
    return SentenceTransformer(model_name)


class SentenceTransformerEmbedder:
    """Actor-pool embedding stage hosting a real sentence-transformers
    encoder. Model load happens ONCE per actor (``__init__``); ``__call__``
    encodes one batch. Output schema is identical to HashingEmbedder:
    input columns minus the text column, plus ``embedding``
    fixed_size_list<float32, dim>."""

    def __init__(self, model_name: str = "all-MiniLM-L6-v2",
                 model_factory: Optional[Callable] = None):
        factory = model_factory or (lambda: _load_sentence_transformer(model_name))
        self.model = factory()
        # probe the output width once so the batch path never guesses
        self.dim = int(np.asarray(self.model.encode(["probe"])).shape[1])

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        vecs = np.asarray(
            self.model.encode([t or "" for t in texts]), dtype=np.float32
        )
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return vecs / norms

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        text_col = "chunk_text" if "chunk_text" in batch.columns else "text"
        vecs = self.encode_texts(list(batch[text_col]))
        cols = {}
        for c in batch.columns:
            if c != text_col:
                cols[c] = pa.array(batch[c])
        cols["embedding"] = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), self.dim
        )
        return pa.table(cols)


def embed_documents_with_model(docs_ds, model_name: str = "all-MiniLM-L6-v2",
                               concurrency: int = 2, batch_size: int = 256,
                               num_gpus: float = 0,
                               model_factory: Optional[Callable] = None):
    """M16 with a real encoder: a FIXED actor pool (heavy model => never the
    elastic task path), ``num_gpus`` forwarded per actor. Size
    ``concurrency`` to leave CPU headroom for the read operator — an actor
    pool at num_cpus starves the scan (see ray_guide actor-pool pitfall)."""
    kwargs = {"model_name": model_name}
    if model_factory is not None:
        kwargs["model_factory"] = model_factory
    return docs_ds.map_batches(
        SentenceTransformerEmbedder,
        fn_constructor_kwargs=kwargs,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_gpus=num_gpus or None,
    )


DEFAULT_NER_LABELS = ("MATERIAL", "MANUFACTURER", "CHEMICAL", "CAS",
                      "PERCENT", "TAG")


def _load_gliner(model_name: str):
    try:
        from gliner import GLiNER
    except ImportError as e:  # pragma: no cover - package absent here
        raise ImportError(
            "GLiNERMentionDetector needs the 'gliner' package (pip install "
            "gliner); for the dependency-free rule-based detector use "
            "extract.MentionDetector"
        ) from e
    return GLiNER.from_pretrained(model_name)


class GLiNERMentionDetector:
    """Actor-pool NER stage hosting a real GLiNER model. The model and the
    label vocabulary load once per actor; ``__call__`` turns one turns batch
    into MENTIONS_SCHEMA rows (same schema as the rule-based
    MentionDetector; confidence carries the model score).

    The injected model must provide
    ``predict_entities(text, labels) -> [{start, end, text, label, score}]``
    (the GLiNER API)."""

    def __init__(self, model_name: str = "urchade/gliner_small-v2.1",
                 labels: Sequence[str] = DEFAULT_NER_LABELS,
                 model_factory: Optional[Callable] = None):
        factory = model_factory or (lambda: _load_gliner(model_name))
        self.model = factory()
        self.labels: List[str] = list(labels)
        self._empty = MENTIONS_SCHEMA.empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._empty
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = [t or "" for t in batch.column("text").to_pylist()]
        out = {k: [] for k in ("conv", "tidx", "m", "l", "s", "e", "c")}
        for i, text in enumerate(texts):
            for ent in self.model.predict_entities(text, self.labels):
                out["conv"].append(conv[i])
                out["tidx"].append(tidx[i])
                out["m"].append(ent["text"])
                out["l"].append(ent["label"])
                out["s"].append(int(ent["start"]))
                out["e"].append(int(ent["end"]))
                out["c"].append(float(ent.get("score", 1.0)))
        return pa.table(
            {
                "conv_id": pa.array(out["conv"], pa.string()),
                "turn_idx": pa.array(out["tidx"], pa.int32()),
                "mention": pa.array(out["m"], pa.string()),
                "label": pa.array(out["l"], pa.string()),
                "span_start": pa.array(out["s"], pa.int32()),
                "span_end": pa.array(out["e"], pa.int32()),
                "confidence": pa.array(out["c"], pa.float64()),
            },
            schema=MENTIONS_SCHEMA,
        )


# Labels the record assembler understands (superset of DEFAULT_NER_LABELS:
# the extra labels carry the structured-record fields a span model must tag
# for record assembly — PRODUCT_NO/UPC heads and the supplier-geo attributes)
RECORD_NER_LABELS = (
    "MATERIAL", "MANUFACTURER", "PRODUCT_NO", "UPC",
    "CHEMICAL", "CAS", "PERCENT", "TAG", "SOURCE",
    "SUPPLIER", "ADDRESS", "POSTAL_CODE", "CITY", "STATE", "COUNTRY",
    "REGION",
)

_RECORD_HEADS = {"MATERIAL", "PRODUCT_NO", "UPC", "CHEMICAL", "SUPPLIER"}
_GEO_LABELS = ("ADDRESS", "POSTAL_CODE", "CITY", "STATE", "COUNTRY", "REGION")


class ModelRecordExtractor:
    """M4 through a REAL span model: turns batch -> EXTRACTION_SCHEMA
    records, with mention detection delegated to a GLiNER-API model
    (``predict_entities(text, labels) -> [{text, label, start, ...}]``)
    and record assembly done by span order — the standard NER-pipeline
    reconstruction: mentions of one turn are sorted by span start; a HEAD
    label (MATERIAL / PRODUCT_NO / UPC / CHEMICAL / SUPPLIER) opens a
    record and the attribute labels that follow (MANUFACTURER, CAS,
    PERCENT, TAG, SOURCE, the six geo fields) attach to the open record
    until the next head. Same output schema and downstream semantics as
    the rule-based RecordExtractor (extract.py), so the rest of the KG
    build is untouched — reference analog: the per-page LLM analysis
    returning typed fields (artifact_ingestor_service.py:759-817).

    Model load happens ONCE per actor (``__init__``); inference is per
    turn (the GLiNER API shape). ``model_factory`` injects a fake heavy
    model in tests (one-load-per-actor + rules-equality pinned in
    tests/test_adapters.py)."""

    def __init__(self, model_name: str = "urchade/gliner_small-v2.1",
                 labels: Sequence[str] = RECORD_NER_LABELS,
                 model_factory: Optional[Callable] = None):
        from .extract import EXTRACTION_SCHEMA

        factory = model_factory or (lambda: _load_gliner(model_name))
        self.model = factory()
        self.labels: List[str] = list(labels)
        self._schema = EXTRACTION_SCHEMA
        self._empty = EXTRACTION_SCHEMA.empty_table()

    def _assemble(self, conv: str, tidx: int, ents: list, rows: list) -> None:
        rec = None
        for ent in sorted(ents, key=lambda e: int(e.get("start", 0))):
            label, text = ent["label"], ent["text"]
            if label in _RECORD_HEADS:
                if label == "MATERIAL":
                    rec = {"kind": "MATERIAL", "name": text}
                elif label in ("PRODUCT_NO", "UPC"):
                    rec = {"kind": label, "name": text}
                elif label == "CHEMICAL":
                    rec = {"kind": "CHEMICAL", "name": text}
                else:  # SUPPLIER
                    rec = {"kind": "SUPPLIER_GEO", "manufacturer": text,
                           "geo": {}}
                rec["conv_id"], rec["turn_idx"] = conv, tidx
                rows.append(rec)
            elif rec is None:
                continue  # attribute before any head: no record to attach to
            elif label == "MANUFACTURER" and rec["kind"] == "MATERIAL":
                rec["manufacturer"] = text
            elif rec["kind"] == "CHEMICAL" and label in (
                "CAS", "PERCENT", "TAG", "SOURCE"
            ):
                field = {"CAS": "cas", "PERCENT": "composition",
                         "TAG": "tag", "SOURCE": "source"}[label]
                rec[field] = text or None
            elif rec["kind"] == "SUPPLIER_GEO" and label in _GEO_LABELS:
                rec["geo"][label.lower()] = text

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .extract import KIND_CODE, KIND_FIELDS, pack_payload_str

        if batch.num_rows == 0:
            return self._empty
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        rows: list = []
        for c, t, text in zip(conv, tidx, texts):
            ents = self.model.predict_entities(text or "", self.labels)
            if ents:
                self._assemble(c, t, ents, rows)
        # emit the packed exchange format (int8 kind + escaped payload —
        # extract.EXTRACTION_SCHEMA round 5); geo fields the model did not
        # tag travel as "" like the rule path's empty captures
        payloads = []
        for r in rows:
            if r["kind"] == "SUPPLIER_GEO":
                geo = r.get("geo") or {}
                fields = [r.get("manufacturer")] + [
                    geo.get(f, "") for f in KIND_FIELDS["SUPPLIER_GEO"][1:]
                ]
            else:
                fields = [r.get(f) for f in KIND_FIELDS[r["kind"]]]
            payloads.append(pack_payload_str(fields))
        return pa.table(
            {
                "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
                "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
                "kind": pa.array(
                    np.array([KIND_CODE[r["kind"]] for r in rows], np.int8)
                ),
                "payload": pa.array(payloads, pa.string()),
            },
            schema=self._schema,
        )


def gliner_available() -> bool:
    """Driver-side probe for build_kg's auto-fallback: True when the gliner
    package imports (the actor would load it per worker)."""
    try:
        import gliner  # noqa: F401

        return True
    except ImportError:
        return False


def st_available() -> bool:
    """Same probe for the sentence-transformers embedder."""
    try:
        import sentence_transformers  # noqa: F401

        return True
    except ImportError:
        return False


def detect_mentions_with_model(turns_ds,
                               model_name: str = "urchade/gliner_small-v2.1",
                               labels: Sequence[str] = DEFAULT_NER_LABELS,
                               concurrency: int = 2, batch_size: int = 64,
                               num_gpus: float = 0,
                               model_factory: Optional[Callable] = None):
    """M1/ST1 with a real NER model: fixed actor pool, ``num_gpus``
    forwarded per actor, small batches (transformer inference memory)."""
    kwargs = {"model_name": model_name, "labels": list(labels)}
    if model_factory is not None:
        kwargs["model_factory"] = model_factory
    return turns_ds.map_batches(
        GLiNERMentionDetector,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_gpus=num_gpus or None,
    )


# ---------------------------------------------------- cross-encoder rerank


def _load_cross_encoder(model_name: str):
    try:
        from sentence_transformers import CrossEncoder
    except ImportError as e:  # pragma: no cover - package absent here
        raise ImportError(
            "CrossEncoderReranker needs the 'sentence-transformers' package "
            "(pip install sentence-transformers); for a dependency-free "
            "deterministic reranker use OverlapReranker"
        ) from e
    return CrossEncoder(model_name)


class CrossEncoderReranker:
    """Actor-pool reranking stage hosting a real cross-encoder: the model
    loads ONCE per actor (``__init__``), ``__call__`` scores one batch of
    (query, document) pairs — the retrieve-then-rerank second stage of a
    RAG pipeline (reference analog: the retrieval J8 followed by the LLM
    chain M4; the reranker is the standard precision stage between them).
    Output: input columns plus ``rerank_score`` float64."""

    def __init__(self, query: str, model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2",
                 model_factory: Optional[Callable] = None,
                 text_col: str = "text"):
        factory = model_factory or (lambda: _load_cross_encoder(model_name))
        self.model = factory()
        self.query = query
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pairs = [(self.query, t or "") for t in batch[self.text_col]]
        scores = np.asarray(self.model.predict(pairs), dtype=np.float64)
        return batch.assign(rerank_score=scores)


class OverlapReranker:
    """Dependency-free deterministic stand-in with the same interface:
    score = number of DISTINCT query tokens present in the document
    ([a-z0-9]+ pretokenizer — the corpus-statistics tokenizer). Integer
    arithmetic, so rerank_documents admits an exact DuckDB oracle."""

    def __init__(self, query: str, text_col: str = "text"):
        from .textstats import _VOCAB_RE

        self._re = _VOCAB_RE
        self.qtokens = frozenset(_VOCAB_RE.findall(query.lower()))
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        scores = np.fromiter(
            (
                len(self.qtokens & set(self._re.findall((t or "").lower())))
                for t in batch[self.text_col]
            ),
            dtype=np.float64,
            count=len(batch),
        )
        return batch.assign(rerank_score=scores)


def cross_encoder_available() -> bool:
    try:
        from sentence_transformers import CrossEncoder  # noqa: F401

        return True
    except ImportError:
        return False


def rerank_documents(docs_ds, query: str, top_k: int = 20,
                     reranker: str = "auto", text_col: str = "text",
                     key_col: str = "doc_id", concurrency: int = 2):
    """Retrieve-then-rerank second stage over a candidate set: score every
    candidate against ``query`` with a warm per-actor model, keep the
    global top_k by (score desc, key asc). ``reranker="cross_encoder"``
    uses the real model (actor pool, one load per actor);
    ``"overlap"`` the deterministic stand-in; ``"auto"`` picks the real
    model when the package exists and logs the fallback otherwise.

    Scale shape: scoring is map-only (candidates stream through the actor
    pool); each batch keeps its local top_k, one k-sized single block
    finishes — the weighted_reservoir combine discipline. Zero shuffle."""
    import logging

    logger = logging.getLogger("entity_extractor_ray.adapters")
    use_real = reranker == "cross_encoder" or (
        reranker == "auto" and cross_encoder_available()
    )
    if reranker == "auto" and not use_real:
        logger.info(
            "rerank_documents: sentence-transformers absent; using the "
            "deterministic OverlapReranker stand-in"
        )
    if use_real:
        scored = docs_ds.map_batches(
            CrossEncoderReranker,
            fn_constructor_kwargs={"query": query, "text_col": text_col},
            batch_format="pandas",
            concurrency=concurrency,
        )
    else:
        scored = docs_ds.map_batches(
            OverlapReranker(query, text_col=text_col), batch_format="pandas"
        )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["rerank_score"] > 0]
        order = np.lexsort(
            (df[key_col].to_numpy(), -df["rerank_score"].to_numpy())
        )[:top_k]
        return df.iloc[order][[key_col, "rerank_score"]]

    local = scored.map_batches(local_topk, batch_format="pandas")

    def final_topk(df: pd.DataFrame) -> pa.Table:
        order = np.lexsort(
            (df[key_col].to_numpy(), -df["rerank_score"].to_numpy())
        )[:top_k]
        d = df.iloc[order]
        return pa.table(
            {
                key_col: pa.array(d[key_col].to_numpy(), pa.int64()),
                "rerank_score": pa.array(
                    d["rerank_score"].to_numpy(), pa.float64()
                ),
            }
        )

    return local.repartition(1).map_batches(
        final_topk, batch_size=None, batch_format="pandas"
    )


def rerank_documents_sql(query: str, top_k: int = 20) -> str:
    """Oracle for the OverlapReranker semantics (the path this container
    executes): distinct-query-token overlap, (score desc, doc_id) top-k."""
    import re as _re

    toks = sorted(set(_re.findall(r"[a-z0-9]+", query.lower())))
    arr = ", ".join(f"'{t}'" for t in toks)
    return f"""
    SELECT doc_id, rerank_score FROM (
      SELECT doc_id,
             CAST(len(list_intersect(
                 list_distinct(regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+')),
                 [{arr}])) AS DOUBLE) AS rerank_score
      FROM documents
    ) WHERE rerank_score > 0
    ORDER BY rerank_score DESC, doc_id LIMIT {top_k}
    """
