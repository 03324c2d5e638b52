"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine — the large-scale training-data-pipeline dedup family.

Scale shapes:
  * exact:      hash per doc (map_batches) -> groupby(hash) keep min id.
  * MinHash-LSH: signature per doc -> explode to (band_id, band_hash, doc_id)
                 rows -> groupby(band) buckets -> candidate pairs -> verify
                 Jaccard -> min-label connected components. Only bucket
                 contents ever co-locate; no all-pairs stage.
  * SimHash:    64-bit signature, blocked on 4x16-bit sub-bands (pigeonhole:
                 any pair within Hamming distance 3 shares a clean sub-band
                 ... guaranteed only for <=3 differing bits across distinct
                 bands; standard SimHash blocking).
  * n-gram Jaccard: exact word-3-gram Jaccard verification over LSH buckets.
  * embedding:  brute-force cosine (small side / verification) and a
                 hyperplane-LSH bucketed variant (the scale path).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import textnorm

# ------------------------------------------------------------------ exact

def exact_dedup(docs_ds):
    """One surviving doc per distinct text: (fingerprint, doc_id=min).
    Reduction is a groupby over md5 keys — skew-free, fully parallel."""
    from ray.data.aggregate import Min

    from .textstats import exact_fingerprints

    fp = docs_ds.map_batches(exact_fingerprints, batch_format="pandas")
    return fp.groupby("fingerprint").aggregate(Min("doc_id", alias_name="doc_id"))


def exact_dedup_sql() -> str:
    return """
    SELECT md5(COALESCE(text, '')) AS fingerprint, min(doc_id) AS doc_id
    FROM documents GROUP BY md5(COALESCE(text, ''))
    """


# ------------------------------------------------------------------ minhash

NUM_PERM = 64
NUM_BANDS = 16
SHINGLE_K = 5
JACCARD_THRESHOLD = 0.6

_MINHASH_A, _MINHASH_B = textnorm.make_minhash_params(NUM_PERM)


class MinHashSignatures:
    """doc -> (band_id, band_hash, doc_id) rows. Used as a TASK-pool stage
    via the module singleton below: an actor pool sized near the CPU count
    would reserve every slot and starve the read/shuffle operators (observed
    deadlock at num_cpus=4); the signature state is cheap to build once per
    worker process."""

    def __init__(self, num_perm: int = NUM_PERM, num_bands: int = NUM_BANDS):
        self.a, self.b = textnorm.make_minhash_params(num_perm)
        self.num_bands = num_bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids: List[int] = []
        band_ids: List[int] = []
        band_hashes: List[int] = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = textnorm.minhash_signature(text or "", self.a, self.b, SHINGLE_K)
            for band_id, band_hash in enumerate(textnorm.minhash_bands(sig, self.num_bands)):
                doc_ids.append(doc_id)
                band_ids.append(band_id)
                band_hashes.append(band_hash)
        return pd.DataFrame(
            {"doc_id": doc_ids, "band_id": band_ids, "band_hash": band_hashes}
        )


def _pairs_bucket(df: pd.DataFrame, bucket_id: int) -> pa.Table:
    """One hash bucket of (band_id, band_hash) groups -> candidate pairs
    (id_a < id_b). In-bucket pandas groupby amortizes per-group overhead
    over thousands of LSH buckets."""
    a_out: List[int] = []
    b_out: List[int] = []
    for _, g in df.groupby(["band_id", "band_hash"], sort=False):
        if len(g) < 2:
            continue
        ids = sorted(set(g["doc_id"].tolist()))
        # cap pathological buckets (hot-band salt would go here)
        if len(ids) > 1000:
            ids = ids[:1000]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
    return pa.table(
        {"id_a": pa.array(a_out, pa.int64()), "id_b": pa.array(b_out, pa.int64())}
    )


_MINHASH_SINGLETON: "MinHashSignatures | None" = None


def _minhash_rows(batch: pd.DataFrame) -> pd.DataFrame:
    global _MINHASH_SINGLETON
    if _MINHASH_SINGLETON is None:
        _MINHASH_SINGLETON = MinHashSignatures()
    return _MINHASH_SINGLETON(batch)


def minhash_candidate_pairs(docs_ds, concurrency: int = None, n_buckets: int = 32):
    """docs -> distinct LSH candidate pairs (one shuffle + one dedup groupby).
    ``concurrency`` is accepted for API compatibility; signatures run as
    elastic tasks with a per-process singleton."""
    from .shuffle import bucket_group_apply

    bands = docs_ds.map_batches(_minhash_rows, batch_format="pandas")
    pairs = bucket_group_apply(bands, ["band_id", "band_hash"], _pairs_bucket, n_buckets)
    return pairs.groupby(["id_a", "id_b"]).count().select_columns(["id_a", "id_b"])


def verify_jaccard_pairs(pairs_ds, docs_ds, threshold: float = JACCARD_THRESHOLD,
                         use_words: bool = False):
    """Join candidate pairs back to texts (broadcast the doc map — callers
    use this on verification-scale data; at full scale the join is a
    Dataset.join on doc_id) and keep pairs with true Jaccard >= threshold."""
    import ray

    texts = {}
    for b in docs_ds.select_columns(["doc_id", "text"]).iter_batches(
        batch_size=8192, batch_format="pandas"
    ):
        texts.update(zip(b["doc_id"], b["text"]))
    ref = ray.put(texts)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        tmap = ray.get(ref)
        shingle_cache: dict = {}

        def shingles(doc_id):
            got = shingle_cache.get(doc_id)
            if got is None:
                text = tmap.get(doc_id, "")
                got = (
                    textnorm.word_ngrams(text, 3)
                    if use_words
                    else textnorm.char_shingles(text, SHINGLE_K)
                )
                shingle_cache[doc_id] = got
            return got

        sims = [
            round(textnorm.jaccard(shingles(a), shingles(b_)), 6)
            for a, b_ in zip(batch["id_a"], batch["id_b"])
        ]
        out = batch.copy()
        out["jaccard"] = sims
        return out[out["jaccard"] >= threshold]

    return pairs_ds.map_batches(verify, batch_format="pandas")


def connected_components(pairs: pd.DataFrame, all_ids: List[int]) -> pd.DataFrame:
    """Min-label union-find over verified pairs -> (doc_id, cluster_id).
    Driver-side: pair sets are small after verification; the scale path is
    iterative min-label propagation with groupby rounds (ray_guide pattern)."""
    parent: Dict[int, int] = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(i, find(i)) for i in all_ids]
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


def minhash_dedup(docs_ds, threshold: float = JACCARD_THRESHOLD, concurrency: int = None):
    """Full near-dup pipeline -> (doc_id, cluster_id); cluster rep = min id."""
    pairs = verify_jaccard_pairs(
        minhash_candidate_pairs(docs_ds, concurrency), docs_ds, threshold
    ).to_pandas()
    all_ids = [r["doc_id"] for r in docs_ds.select_columns(["doc_id"]).take_all()]
    return connected_components(pairs, all_ids)


# ------------------------------------------------------------------ simhash

SIMHASH_BANDS = 4
HAMMING_MAX = 3


def simhash_rows(batch: pd.DataFrame) -> pd.DataFrame:  # stateless task fn
    """doc -> 4 rows (band_id, band_value, doc_id, simhash)."""
    doc_ids, band_ids, band_vals, sims = [], [], [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        sh = textnorm.simhash64(text or "")
        for band in range(SIMHASH_BANDS):
            doc_ids.append(doc_id)
            band_ids.append(band)
            band_vals.append((sh >> (band * 16)) & 0xFFFF)
            sims.append(sh)
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "band_id": band_ids,
            "band_value": band_vals,
            "simhash": [s - (1 << 63) for s in sims],  # store as signed int64
        }
    )


def simhash_near_pairs(docs_ds, hamming_max: int = HAMMING_MAX, concurrency: int = None,
                       n_buckets: int = 32):
    """Pairs within Hamming distance <= hamming_max, via sub-band blocking."""
    from .shuffle import bucket_group_apply

    rows = docs_ds.map_batches(simhash_rows, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame, bucket_id: int) -> pa.Table:
        a_out: List[int] = []
        b_out: List[int] = []
        d_out: List[int] = []
        for _, group in df.groupby(["band_id", "band_value"], sort=False):
            if len(group) < 2:
                continue
            g = group.drop_duplicates("doc_id").sort_values("doc_id")
            ids = g["doc_id"].tolist()
            sims = [s + (1 << 63) for s in g["simhash"].tolist()]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = textnorm.hamming64(sims[i], sims[j])
                    if d <= hamming_max:
                        a_out.append(ids[i])
                        b_out.append(ids[j])
                        d_out.append(d)
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(d_out, pa.int64()),
            }
        )

    pairs = bucket_group_apply(rows, ["band_id", "band_value"], bucket_pairs, n_buckets)
    from ray.data.aggregate import Min

    return pairs.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ------------------------------------------------------------------ embeddings

def _normalized_matrix(embeddings_ds):
    ids, vecs = [], []
    for b in embeddings_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids.extend(b.column("vec_id").to_pylist())
        vecs.extend(b.column("embedding").to_pylist())
    mat = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return np.asarray(ids), mat / norms


def embedding_cosine_pairs(embeddings_ds, threshold: float = 0.95):
    """Exact all-pairs cosine near-dup pairs (id_a < id_b, cos >= threshold).

    Brute force per batch against the broadcast matrix (numpy matmul) — the
    verification-scale method; the scale path is hyperplane-LSH bucketing
    (embedding_lsh_pairs)."""
    import ray

    ids, mat = _normalized_matrix(embeddings_ds)
    ref = ray.put((ids, mat))

    def score(batch: pa.Table) -> pd.DataFrame:
        all_ids, all_mat = ray.get(ref)
        q_ids = np.asarray(batch.column("vec_id").to_pylist())
        q = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        sims = (q / qn) @ all_mat.T
        rows_a, rows_b, rows_s = [], [], []
        for qi in range(len(q_ids)):
            mask = (sims[qi] >= threshold) & (all_ids > q_ids[qi])
            for j in np.flatnonzero(mask):
                rows_a.append(int(q_ids[qi]))
                rows_b.append(int(all_ids[j]))
                rows_s.append(round(float(sims[qi, j]), 6))
        return pd.DataFrame(
            {
                "id_a": pd.array(rows_a, dtype="int64"),
                "id_b": pd.array(rows_b, dtype="int64"),
                "cos_sim": pd.array(rows_s, dtype="float64"),
            }
        )

    return embeddings_ds.map_batches(score, batch_format="pyarrow")


def embedding_cosine_pairs_sql(threshold: float = 0.95) -> str:
    return f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(
               CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
    WHERE list_cosine_similarity(
        CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= {threshold}
    """


HYPERPLANE_BITS = 8


def embedding_lsh_pairs(embeddings_ds, threshold: float = 0.9, seed: int = 11,
                        concurrency: int = None):
    """Hyperplane-LSH bucketed near-dup: sign-bits of random projections form
    the bucket key; exact cosine verified within buckets only. Approximate
    (recall < 1), but bucket-local — the 100TB-shaped variant."""
    import ray

    def make_planes(dim):
        rng = np.random.RandomState(seed)
        return rng.normal(size=(HYPERPLANE_BITS, dim))

    first = embeddings_ds.take(1)[0]
    planes = make_planes(len(first["embedding"]))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pd.DataFrame:
        pl = ray.get(planes_ref)
        ids = batch.column("vec_id").to_pylist()
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        bits = (mat @ pl.T) > 0
        keys = (bits * (1 << np.arange(HYPERPLANE_BITS))).sum(axis=1)
        return pd.DataFrame({
            "vec_id": ids, "bucket": keys.astype("int64"),
            "embedding": list(mat),
        })

    bucketed = embeddings_ds.map_batches(bucketize, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id")
        ids = g["vec_id"].tolist()
        mat = np.asarray(g["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        sims = mat @ mat.T
        a_out, b_out, s_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    s_out.append(round(float(sims[i, j]), 6))
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "cos_sim": s_out})

    return bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
