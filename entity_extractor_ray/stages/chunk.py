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

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        text_col = "chunk_text" if "chunk_text" in batch.columns else "text"
        vecs = np.zeros((len(batch), self.dim), dtype=np.float32)
        for row, text in enumerate(batch[text_col]):
            for w in self.word_re.findall((text or "").lower()):
                slot, sign = self._slot(w)
                vecs[row, slot] += sign
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vecs = vecs / norms
        cols = {}
        for c in batch.columns:
            if c != text_col:
                cols[c] = pa.array(batch[c])
        cols["embedding"] = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), self.dim
        )
        return pa.table(cols)


_EMBEDDER_SINGLETON = None


def _embed_batch(batch):
    global _EMBEDDER_SINGLETON
    if _EMBEDDER_SINGLETON is None:
        _EMBEDDER_SINGLETON = HashingEmbedder()
    return _EMBEDDER_SINGLETON(batch)


def embed_documents(docs_ds, concurrency: int = None, batch_size: int = 1024):
    """documents/chunks -> rows + embedding vector column.

    Default: elastic task pool with a per-process warm singleton (the
    hashing model is cheap to build; an actor pool sized near num_cpus can
    starve the read/shuffle operators). Pass an explicit ``concurrency`` to
    pin a fixed actor pool for a heavyweight encoder (GPU model), sized to
    leave CPU headroom for the other stages."""
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
