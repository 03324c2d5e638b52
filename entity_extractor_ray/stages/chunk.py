"""Text chunking + embedding stages (reference M15/M16, ST2/ST3).

The reference chunks page text with a SemanticChunker (alt params: recursive
chunk_size 2000 / overlap 200, token limit 3072 —
/root/reference/app/modules/entity_extractor/constants.py:122-130) and embeds
chunks with a remote model warmed once per process
(embedding_service.py:30-40, 56-104). Here:

  * chunk_text: deterministic fixed-window chunker, chunk i covers
    [i*stride, i*stride + size) with stride = size - overlap — exactly
    SQL-expressible for the parity oracle;
  * HashingEmbedder: an actor-pool stage hosting a "warm" deterministic
    embedding model (hashing-trick bag-of-words, L2-normalized float32) —
    the Ray-side plumbing (actor __init__ model load, batched encode,
    fixed_size_list output) is real; swap the model for a true encoder on a
    GPU pool without touching the pipeline.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

CHUNK_SIZE = 2000
CHUNK_OVERLAP = 200
CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP

CHUNKS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("chunk_idx", pa.int64()),
        ("chunk_text", pa.string()),
        ("n_chunk_chars", pa.int64()),
    ]
)


def chunk_text(batch: pd.DataFrame, size: int = CHUNK_SIZE,
               overlap: int = CHUNK_OVERLAP) -> pa.Table:
    """doc rows -> chunk rows (flat_map shape, vectorized per batch)."""
    stride = size - overlap
    doc_ids: List[int] = []
    idxs: List[int] = []
    texts: List[str] = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        t = text or ""
        n = len(t)
        if n == 0:
            continue
        n_chunks = 1 + max(0, -(-(n - size) // stride)) if n > size else 1
        for i in range(n_chunks):
            doc_ids.append(doc_id)
            idxs.append(i)
            texts.append(t[i * stride : i * stride + size])
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
            "n_chunk_chars": pa.array([len(t) for t in texts], pa.int64()),
        },
        schema=CHUNKS_SCHEMA,
    )


def chunk_text_sql(size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP) -> str:
    stride = size - overlap
    return f"""
    WITH n AS (
      SELECT doc_id, text, length(text) AS len,
             CASE WHEN length(text) > {size}
                  THEN 1 + CAST(ceil((length(text) - {size}) / {stride}.0) AS BIGINT)
                  ELSE 1 END AS n_chunks
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id,
           gs.generate_series AS chunk_idx,
           substring(text, 1 + CAST(gs.generate_series AS BIGINT) * {stride}, {size}) AS chunk_text,
           length(substring(text, 1 + CAST(gs.generate_series AS BIGINT) * {stride}, {size})) AS n_chunk_chars
    FROM n JOIN generate_series(0, 100000) AS gs
      ON gs.generate_series < n.n_chunks
    """


EMBED_DIM = 64


class HashingEmbedder:
    """Actor-pool embedding stage: the 'model' (hash projection seeds) is
    built ONCE per actor in __init__ (reference warms its encoder per process,
    ST3); __call__ encodes a batch vectorized. Output column `embedding` is
    fixed_size_list<float32, dim> — the engine's standard vector layout."""

    def __init__(self, dim: int = EMBED_DIM, seed: int = 17):
        import re

        self.dim = dim
        self.word_re = re.compile(r"[a-z0-9]+")
        rng = np.random.RandomState(seed)
        self.signs = rng.choice([-1.0, 1.0], size=1 << 16).astype(np.float32)
        self._cache: dict = {}

    def _slot(self, word: str):
        got = self._cache.get(word)
        if got is None:
            from ..functions.textnorm import stable_hash64

            h = stable_hash64(word)
            got = (h % self.dim, self.signs[h % (1 << 16)])
            if len(self._cache) < 1_000_000:
                self._cache[word] = got
        return got

    def encode_texts(self, texts) -> np.ndarray:
        """texts -> L2-normalized (n, dim) float32 matrix."""
        vecs = np.zeros((len(texts), self.dim), dtype=np.float32)
        for row, text in enumerate(texts):
            for w in self.word_re.findall((text or "").lower()):
                slot, sign = self._slot(w)
                vecs[row, slot] += sign
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


class SemanticChunkerStage:
    """The reference's PRIMARY chunking path (embedding_service.py:36-41:
    langchain SemanticChunker, breakpoint_threshold_type='interquartile',
    amount=1.5 — constants.py:122-123), re-expressed as a warm actor-pool
    stage:

      1. split each doc into sentences ([.?!] + whitespace);
      2. embed each sentence WITH its +-1-sentence buffer window (the
         published SemanticChunker combine step) — one vectorized matrix
         encode per batch across ALL docs' sentences;
      3. cosine distance between consecutive windowed embeddings;
      4. breakpoint where distance > mean + 1.5 * IQR of the doc's
         distances; chunk = sentences joined between breakpoints.

    The embedder warms once per actor (__init__); fixed-window chunk_text
    remains the oracle-parity variant (this one's breakpoints depend on the
    embedding model, so it is rows-only for the driver and pinned by
    planted-topic unit tests)."""

    def __init__(self, dim: int = EMBED_DIM, seed: int = 17,
                 iqr_amount: float = 1.5, buffer_size: int = 1):
        import re

        self.embedder = HashingEmbedder(dim=dim, seed=seed)
        self.sent_re = re.compile(r"(?<=[.?!])\s+")
        self.iqr_amount = iqr_amount
        self.buffer_size = buffer_size

    def _doc_chunks(self, sents: List[str], dists: np.ndarray) -> List[str]:
        if len(sents) <= 1:
            return [" ".join(sents)] if sents else []
        q1, q3 = np.percentile(dists, [25, 75])
        threshold = dists.mean() + self.iqr_amount * (q3 - q1)
        breaks = np.flatnonzero(dists > threshold)
        chunks, lo = [], 0
        for b in breaks:
            chunks.append(" ".join(sents[lo : b + 1]))
            lo = b + 1
        chunks.append(" ".join(sents[lo:]))
        return chunks

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        # sentence-split every doc, then ONE matrix encode for the whole
        # batch's windowed sentences (never per-sentence model calls)
        all_windows: List[str] = []
        doc_sents: List[List[str]] = []
        for text in batch["text"]:
            sents = [s for s in self.sent_re.split(text or "") if s.strip()]
            doc_sents.append(sents)
            b = self.buffer_size
            all_windows.extend(
                " ".join(sents[max(0, i - b) : i + b + 1])
                for i in range(len(sents))
            )
        embs = self.embedder.encode_texts(all_windows)

        doc_ids: List[int] = []
        idxs: List[int] = []
        texts: List[str] = []
        pos = 0
        for doc_id, sents in zip(batch["doc_id"], doc_sents):
            n = len(sents)
            e = embs[pos : pos + n]
            pos += n
            # embeddings are L2-normalized: cosine distance = 1 - dot
            dists = 1.0 - np.sum(e[:-1] * e[1:], axis=1) if n > 1 else np.zeros(0)
            for i, chunk in enumerate(self._doc_chunks(sents, dists)):
                doc_ids.append(doc_id)
                idxs.append(i)
                texts.append(chunk)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "chunk_text": pa.array(texts, pa.string()),
                "n_chunk_chars": pa.array([len(t) for t in texts], pa.int64()),
            },
            schema=CHUNKS_SCHEMA,
        )


def semantic_chunk_documents(docs_ds, concurrency: int = 2, batch_size: int = 256):
    """documents -> semantic chunk rows via a fixed actor pool (the model
    warms per actor; concurrency stays small so the pool never starves the
    read operators — see the actor-pool deadlock note in SURVEY §7.5)."""
    return docs_ds.map_batches(
        SemanticChunkerStage,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


_EMBEDDER_SINGLETON = None


def _embed_batch(batch):
    global _EMBEDDER_SINGLETON
    if _EMBEDDER_SINGLETON is None:
        _EMBEDDER_SINGLETON = HashingEmbedder()
    return _EMBEDDER_SINGLETON(batch)


def _embed_keep_text_batch(batch: pd.DataFrame) -> pa.Table:
    """Like _embed_batch but RETAINS the text column (the RAG section-context
    retrieval needs chunk_text and embedding side by side)."""
    global _EMBEDDER_SINGLETON
    if _EMBEDDER_SINGLETON is None:
        _EMBEDDER_SINGLETON = HashingEmbedder()
    emb = _EMBEDDER_SINGLETON
    text_col = "chunk_text" if "chunk_text" in batch.columns else "text"
    vecs = emb.encode_texts(list(batch[text_col]))
    cols = {c: pa.array(batch[c].tolist()) for c in batch.columns}
    cols["embedding"] = pa.array(
        [v for v in vecs.tolist()], pa.list_(pa.float32())
    )
    return pa.table(cols)


def embed_chunks_with_text(chunks_ds, batch_size: int = 1024):
    """chunk rows -> same rows + embedding column, chunk_text retained."""
    return chunks_ds.map_batches(
        _embed_keep_text_batch, batch_format="pandas", batch_size=batch_size
    )


def embed_documents(docs_ds, concurrency: int = None, batch_size: int = 1024,
                    embedder: str = "hashing", embedder_kwargs: dict = None):
    """documents/chunks -> rows + embedding vector column.

    Default: elastic task pool with a per-process warm singleton (the
    hashing model is cheap to build; an actor pool sized near num_cpus can
    starve the read/shuffle operators). Pass an explicit ``concurrency`` to
    pin a fixed actor pool for a heavyweight encoder (GPU model), sized to
    leave CPU headroom for the other stages.

    embedder: "hashing" (default, deterministic) or "st"
    (adapters.SentenceTransformerEmbedder — a real sentence-transformers
    encoder warmed once per actor; same output schema). "st" without the
    package installed and without an injected ``model_factory`` in
    ``embedder_kwargs`` LOGS a warning and falls back to hashing
    (auto-fallback, VERDICT r4 #7)."""
    if embedder == "st":
        from .adapters import embed_documents_with_model, st_available

        kw = dict(embedder_kwargs or {})
        if "model_factory" in kw or st_available():
            kw.setdefault("concurrency", concurrency or 2)
            kw.setdefault("batch_size", min(batch_size, 256))
            return embed_documents_with_model(docs_ds, **kw)
        import logging

        logging.getLogger("entity_extractor_ray.chunk").warning(
            "embedder='st' requested but sentence-transformers is not "
            "installed and no model_factory was injected; falling back to "
            "the hashing embedder"
        )
    elif embedder != "hashing":
        raise ValueError(f"unknown embedder {embedder!r}")
    if concurrency is not None:
        return docs_ds.map_batches(
            HashingEmbedder,
            batch_format="pandas",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return docs_ds.map_batches(
        _embed_batch, batch_format="pandas", batch_size=batch_size
    )


# ------------------------------------------------------------- vector sink

def write_vector_store(embedded_ds, out_dir: str, id_col: str = "doc_id",
                       n_shards: int = 16) -> dict:
    """K3 vector-store sink (the reference's pgvector writer,
    embedding_service -> vector_repository insert path): hash-sharded
    partitioned Parquet + a commit-last JSON manifest (dim, rows, shards).

    Shards are directories (shard=<i>/), so a failed load can re-push one
    shard, a retrieval tier can mmap shards independently, and a 100TB store
    never concentrates in one file. Returns the manifest dict."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    from .shuffle import stable_bucket_array

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = stable_bucket_array(batch, [id_col], n_shards)
        return batch.append_column("shard", pa.array(shard, pa.int64()))

    sharded = embedded_ds.map_batches(add_shard, batch_format="pyarrow")
    sharded.write_parquet(out_dir, partition_cols=["shard"])

    files = sorted(glob.glob(os.path.join(out_dir, "**", "*.parquet"),
                             recursive=True))
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    dim = None
    if files:
        emb_type = pq.read_schema(files[0]).field("embedding").type
        dim = getattr(emb_type, "list_size", None)
    manifest = {"rows": rows, "dim": dim, "n_shards": n_shards,
                "id_col": id_col, "files": len(files)}
    with open(os.path.join(out_dir, "_MANIFEST"), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def read_vector_store(out_dir: str):
    """Read a write_vector_store output back as a Dataset (hive shard
    column recovered by the partitioned read)."""
    import ray.data as rd

    return rd.read_parquet(out_dir)
