"""Partitioned window functions as ONE bucket shuffle + vectorized kernels.

SQL window functions (``row_number/rank/dense_rank/lag/lead`` and running
aggregates ``OVER (PARTITION BY p ORDER BY o)``) generalize several reference
patterns — the per-conversation ordering that feeds record assembly
(reference chat_transcript_processor.py's turn-order walk) and the
first-result-wins limit (A9, global_node_repository.py:158) are both
``row_number() = 1`` specializations. This module gives them to callers
directly, engine-shaped:

  * ONE all-to-all exchange on ``hash(partition_key) % n_buckets`` — the
    same ``bucket_group_apply`` shape every wide operator here uses; all
    rows of a partition land in one bucket task.
  * Inside a bucket: a single stable lexsort over (partition, order)
    columns, then every window column is computed VECTORIZED — numpy
    boundary masks for row_number/rank/dense_rank, pandas grouped
    shift/cumsum (C kernels) for lag/lead/running sums. No Python loop
    touches rows.
  * Output is row-per-input-row, so the exchange is inherently O(rows) —
    there is no combiner to push (unlike top-k/quantiles); what matters at
    100 TB is that it is exactly ONE shuffle and per-bucket memory is
    bounded by the largest partition, not the corpus. A single partition
    key hotter than a bucket's memory is the caller's contract to pre-split
    (same contract as groupby everywhere else in the engine).

Tie semantics match SQL: ``rank``/``dense_rank`` group ties over the FULL
(partition + order) key tuple. Order columns are assumed NON-NULL (SQL
treats NULL order keys as equal in a tie; numpy's ``NaN != NaN`` would
split them) — callers with nullable order keys must fill or filter first.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .shuffle import bucket_group_apply

# spec kinds -> required fields:
#   ("row_number", None, out)         1-based position within partition
#   ("rank", None, out)               SQL RANK() (gaps after ties)
#   ("dense_rank", None, out)         SQL DENSE_RANK()
#   ("lag", src, out)                 previous row's src within partition
#   ("lead", src, out)                next row's src within partition
#   ("running_sum", src, out)         cumulative sum of src (rows unbounded
#                                     preceding .. current row)
#   ("ntile", n, out)                 SQL NTILE(n): n buckets per partition,
#                                     sizes differ by <=1, larger first
#   ("first_value", src, out)         partition's first src in sort order
#   ("last_value", src, out)          partition's last src (full frame —
#                                     SQL default-frame last_value is just
#                                     "current row"; this is the ROWS
#                                     BETWEEN UNBOUNDED .. UNBOUNDED form)
#   ("percent_rank", None, out)       (rank-1)/(c-1), 0.0 for c == 1
#   ("cume_dist", None, out)          rows-with-order-key-<=-current / c
WINDOW_KINDS = (
    "row_number", "rank", "dense_rank", "lag", "lead", "running_sum",
    "ntile", "first_value", "last_value", "percent_rank", "cume_dist",
)


def _ntile(rn: np.ndarray, part_id: np.ndarray, part_start: np.ndarray,
           n_rows: int, n: int) -> np.ndarray:
    """SQL NTILE: with c rows, the first c%n buckets get c//n+1 rows."""
    sizes = np.diff(np.append(part_start, n_rows))  # rows per partition
    c = sizes[part_id].astype(np.int64)
    small = c // n
    r = c % n  # number of big buckets
    big = small + 1
    pos = rn - 1  # 0-based position within partition
    in_big = pos < r * big
    # small == 0 (c < n) means every row is in a big bucket; guard the
    # then-unused small divisor (big = small+1 >= 1 needs no guard)
    small_safe = np.where(small == 0, 1, small)
    tile_big = pos // big + 1
    tile_small = r + (pos - r * big) // small_safe + 1
    return np.where(in_big, tile_big, tile_small)


def _change_mask(df: pd.DataFrame, cols: Sequence[str], base: np.ndarray | None) -> np.ndarray:
    """Boolean mask: True where row i differs from row i-1 on any of cols
    (row 0 always True). ``base`` seeds the mask (partition changes force
    tie-group changes)."""
    n = len(df)
    mask = np.zeros(n, dtype=bool)
    mask[0] = True
    if base is not None:
        mask |= base
    for c in cols:
        v = df[c].to_numpy()
        mask[1:] |= v[1:] != v[:-1]
    return mask


def partitioned_window(
    ds,
    by: Sequence[str],
    order_by: Sequence[str],
    specs: Sequence[tuple],
    descending: Sequence[bool] | None = None,
    out_schema: pa.Schema | None = None,
    keep_cols: Sequence[str] | None = None,
    n_buckets: int = 64,
):
    """Compute window columns ``specs`` over ``PARTITION BY by ORDER BY
    order_by`` and return keep_cols + the window columns.

    ``out_schema`` declares the FULL output schema (keep_cols first, then
    one field per spec, in order) so every bucket emits identical Arrow
    types regardless of its data.
    """
    by = list(by)
    order_by = list(order_by)
    desc = list(descending) if descending is not None else [False] * len(order_by)
    keep = list(keep_cols) if keep_cols is not None else None
    for kind, _src, _out in specs:
        if kind not in WINDOW_KINDS:
            raise ValueError(f"unknown window kind {kind!r}")

    def bucket_fn(df: pd.DataFrame, bucket_id: int) -> pa.Table:
        asc = [True] * len(by) + [not d for d in desc]
        df = df.sort_values(by + order_by, ascending=asc, kind="mergesort").reset_index(
            drop=True
        )
        n = len(df)
        part_change = _change_mask(df, by, None)
        part_id = np.cumsum(part_change) - 1  # 0-based partition ordinal
        idx = np.arange(n)
        part_start = idx[part_change]
        rn = idx - part_start[part_id] + 1  # 1-based row_number

        need_tie = any(
            k in ("rank", "dense_rank", "percent_rank", "cume_dist")
            for k, _, _ in specs
        )
        if need_tie:
            tie_change = _change_mask(df, order_by, part_change)
            tie_id = np.cumsum(tie_change) - 1
            rank = rn[tie_change][tie_id]  # first rn of each tie group
            dense_global = np.cumsum(tie_change)
            dense = dense_global - dense_global[part_change][part_id] + 1
        if any(k in ("percent_rank", "cume_dist") for k, _, _ in specs):
            part_sizes = np.diff(np.append(part_start, n))
            csize = part_sizes[part_id].astype(np.float64)
            tie_sizes = np.bincount(tie_id)
            last_rn = rank + tie_sizes[tie_id] - 1  # rn of the tie's last row

        grouped = df.groupby(part_id, sort=False) if any(
            k in ("lag", "lead", "running_sum", "first_value", "last_value")
            for k, _, _ in specs
        ) else None

        keep_here = keep if keep is not None else [c for c in df.columns]
        cols: dict[str, object] = {}
        for c in keep_here:
            typ = out_schema.field(c).type if out_schema is not None else None
            cols[c] = pa.array(df[c], type=typ, from_pandas=True)
        for kind, src, out in specs:
            typ = out_schema.field(out).type if out_schema is not None else None
            if kind == "row_number":
                cols[out] = pa.array(rn, pa.int64())
            elif kind == "rank":
                cols[out] = pa.array(rank, pa.int64())
            elif kind == "dense_rank":
                cols[out] = pa.array(dense, pa.int64())
            elif kind == "lag":
                cols[out] = pa.array(grouped[src].shift(1), type=typ, from_pandas=True)
            elif kind == "lead":
                cols[out] = pa.array(grouped[src].shift(-1), type=typ, from_pandas=True)
            elif kind == "running_sum":
                cols[out] = pa.array(grouped[src].cumsum(), type=typ, from_pandas=True)
            elif kind == "ntile":
                cols[out] = pa.array(
                    _ntile(rn, part_id, part_start, n, int(src)), pa.int64()
                )
            elif kind == "first_value":
                cols[out] = pa.array(
                    grouped[src].transform("first"), type=typ, from_pandas=True
                )
            elif kind == "last_value":
                cols[out] = pa.array(
                    grouped[src].transform("last"), type=typ, from_pandas=True
                )
            elif kind == "percent_rank":
                pr = np.where(csize > 1, (rank - 1) / np.maximum(csize - 1, 1), 0.0)
                cols[out] = pa.array(pr, pa.float64())
            elif kind == "cume_dist":
                cols[out] = pa.array(last_rn / csize, pa.float64())
        return pa.table(cols, schema=out_schema) if out_schema is not None else pa.table(cols)

    return bucket_group_apply(ds, by, bucket_fn, n_buckets=n_buckets)
