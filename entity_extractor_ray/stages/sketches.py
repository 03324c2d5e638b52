"""KMV (bottom-k minimum values) distinct-count sketch as a grouped aggregate.

``COUNT(DISTINCT x) GROUP BY g`` is the classic scale trap: exact answers
need every distinct value of a group co-located, so a hot group ships its
whole value set through the shuffle. The KMV estimator caps that: hash each
value to a uniform 63-bit point, keep only the k SMALLEST per group, and
estimate ``(k-1) / theta`` where theta is the k-th smallest hash scaled to
(0,1]. Standard error is ~1/sqrt(k-2) (~1.6% at k=4096). The engine already
trusts this estimator for its linking skew gate (linking.py's bottom-k
refinement); this module exposes it as a first-class aggregate.

Two properties make it engine-shaped:

  * MERGEABLE map-side state: each batch contributes at most k hashes per
    group, so shuffle volume is O(k x groups x batches) no matter how hot a
    group is — union-of-bottom-k sets always contains the true bottom-k of
    the union.
  * EXACT below k: if the merged distinct-hash count of a group is < k, no
    batch can have truncated (truncation only happens at exactly k kept),
    so the merged set IS the full distinct set and the reported count is
    exact (modulo 63-bit hash collisions, ~n^2/2^64). That is why the
    driver's DuckDB ``COUNT(DISTINCT)`` oracle hash-matches at test scale
    (hundreds of users, k=4096) while the SAME operator degrades gracefully
    to a ±1.6% estimate on a 100-TB corpus — documented, not silent: the
    output carries an ``exact`` flag column.

Hashing uses md5 (via samples.md5_hex_array's digest discipline) so the
sketch is process- and platform-stable — resumed runs merge cleanly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .shuffle import bucket_group_apply

MASK63 = (1 << 63) - 1


def hash63(values) -> np.ndarray:
    """Stable uniform 63-bit hash of str(v) (first 8 md5 bytes, top bit
    cleared)."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big") & MASK63
            for v in values
        ],
        dtype=np.uint64,
    )


def approx_distinct_by(
    ds,
    group_col: str,
    value_col: str,
    k: int = 4096,
    out_col: str = "n_distinct",
    n_buckets: int = 8,
):
    """Per group of ``group_col``: KMV distinct-count of ``value_col``.
    Output: (group_col, out_col int64, exact bool)."""

    def local_sketch(df: pd.DataFrame) -> pd.DataFrame:
        # distinct (group, value) pairs in this batch, hashed once each
        pairs = df[[group_col, value_col]].drop_duplicates()
        pairs = pairs.assign(__h=hash63(pairs[value_col].to_numpy()).astype(np.uint64))
        pairs = pairs.sort_values([group_col, "__h"], kind="mergesort")
        kept = pairs.groupby(group_col, sort=False).head(k)
        return kept[[group_col, "__h"]]

    pre = ds.map_batches(local_sketch, batch_format="pandas")

    def bucket_fn(df: pd.DataFrame, bucket_id: int) -> pa.Table:
        groups, counts, exacts = [], [], []
        merged = df.drop_duplicates([group_col, "__h"]).sort_values(
            [group_col, "__h"], kind="mergesort"
        )
        for g, sub in merged.groupby(group_col, sort=False):
            h = sub["__h"].to_numpy()
            if len(h) < k:
                groups.append(g)
                counts.append(len(h))
                exacts.append(True)
            else:
                theta = float(h[k - 1]) / float(1 << 63)
                groups.append(g)
                counts.append(int(round((k - 1) / theta)))
                exacts.append(False)
        return pa.table(
            {
                group_col: pa.array(groups),
                out_col: pa.array(counts, pa.int64()),
                "exact": pa.array(exacts, pa.bool_()),
            }
        )

    return bucket_group_apply(pre, [group_col], bucket_fn, n_buckets=n_buckets)
