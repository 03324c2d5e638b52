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


# ------------------------------------------------------- global ordered scan

_scan_partial = None
_scan_apply = None


def _init_scan_remotes():
    """Nested defs ship by cloudpickle VALUE (the shuffle._init_remote
    pattern) so workers need no repo sys.path."""
    global _scan_partial, _scan_apply
    if _scan_partial is not None:
        return
    import ray

    def _partial(tbl, sum_cols):
        """(n_rows, [block sums]) to the driver; the Arrow-converted block
        stays in the object store for the apply pass."""
        import pyarrow as _pa
        import pyarrow.compute as _pc

        if not isinstance(tbl, _pa.Table):
            from ray.data.block import BlockAccessor

            tbl = BlockAccessor.for_block(tbl).to_arrow()
        if tbl.schema.metadata:
            tbl = tbl.replace_schema_metadata(None)
        sums = [
            (_pc.sum(tbl.column(c)).as_py() or 0) if tbl.num_rows else 0
            for c in sum_cols
        ]
        return (tbl.num_rows, sums), tbl

    _scan_partial = ray.remote(num_cpus=0.25, num_returns=2)(_partial)

    def _apply(tbl, specs, keep_cols, row_offset, sum_offsets):
        import numpy as _np
        import pyarrow as _pa

        n = tbl.num_rows
        cols = {c: tbl.column(c) for c in keep_cols}
        for (kind, src, out), s_off in zip(specs, sum_offsets):
            if kind == "row_number":
                cols[out] = _pa.array(
                    row_offset + 1 + _np.arange(n, dtype=_np.int64), _pa.int64()
                )
            else:  # running_sum
                v = tbl.column(src).to_numpy(zero_copy_only=False)
                if _np.issubdtype(v.dtype, _np.integer):
                    cols[out] = _pa.array(s_off + _np.cumsum(v.astype(_np.int64)),
                                          _pa.int64())
                else:
                    cols[out] = _pa.array(s_off + _np.cumsum(v.astype(_np.float64)),
                                          _pa.float64())
        return _pa.table(cols)

    _scan_apply = ray.remote(num_cpus=0.5)(_apply)


def global_scan(
    ds,
    order_by: Sequence[str],
    specs: Sequence[tuple],
    descending: Sequence[bool] | bool = False,
    keep_cols: Sequence[str] | None = None,
):
    """Window functions over a GLOBAL order (no PARTITION BY) — SQL
    ``row_number()/SUM(x) OVER (ORDER BY ...)`` on the whole relation, i.e.
    the distributed zipWithIndex / prefix-sum primitive.

    Shape: ONE global sort (Ray's range-partitioned all-to-all — the
    unavoidable exchange for a total order), then a metadata-only offset
    pass — the driver fetches one (n_rows, block_sums) tuple PER BLOCK,
    computes exclusive prefix offsets, and per-block tasks append the
    window columns with those offsets. Block payloads never cross the
    driver, so the post-sort cost is O(n_blocks) driver work + one
    vectorized cumsum per block. Supported specs: ``("row_number", None,
    out)`` and ``("running_sum", src, out)`` (ROWS UNBOUNDED PRECEDING —
    deterministic only under a tie-free order key, same contract as
    partitioned_window). Ties: include a unique column in ``order_by``.
    """
    import ray
    import ray.data as rd

    for kind, _src, _out in specs:
        if kind not in ("row_number", "running_sum"):
            raise ValueError(f"global_scan supports row_number/running_sum, got {kind}")
    _init_scan_remotes()
    sorted_ds = ds.sort(list(order_by), descending=descending)
    mat = sorted_ds.materialize()
    refs = mat.to_arrow_refs()
    sum_cols = [src for kind, src, _ in specs if kind == "running_sum"]
    pairs = [_scan_partial.remote(r, sum_cols) for r in refs]
    metas = ray.get([m for m, _ in pairs]) if refs else []

    # Ray's sort of an EMPTY dataset loses the schema (mat.schema() is
    # None or a zero-column filler); fall back to the input's — it is what
    # keep/the typed empty output must mirror anyway
    base_schema = mat.schema()
    if base_schema is None or not base_schema.names:
        base_schema = ds.schema()
    keep = list(keep_cols) if keep_cols is not None else list(base_schema.names)
    specs_ser = [tuple(s) for s in specs]

    out_refs = []
    row_off = 0
    # per-spec running offsets (row_number slots unused, kept for zip align)
    sum_off = [0] * len(specs)
    sum_idx = {i: j for j, i in enumerate(
        i for i, (k, _, _) in enumerate(specs) if k == "running_sum")}
    for (n_rows, sums), (_, blk) in zip(metas, pairs):
        if n_rows == 0:
            continue
        out_refs.append(
            _scan_apply.remote(blk, specs_ser, keep, row_off, list(sum_off))
        )
        row_off += n_rows
        for i, j in sum_idx.items():
            sum_off[i] += sums[j]
    if not out_refs:
        # empty input: emit a typed empty table so downstream schemas hold
        fields = [
            (n, t) for n, t in zip(base_schema.names, base_schema.types) if n in keep
        ]
        types = dict(zip(base_schema.names, base_schema.types))
        for kind, src, out in specs:
            # running_sum over a float src emits float64 (the apply path's
            # dtype rule); everything else is int64
            is_f = kind == "running_sum" and pa.types.is_floating(types[src])
            fields.append((out, pa.float64() if is_f else pa.int64()))
        return rd.from_arrow(pa.schema(fields).empty_table())
    return rd.from_arrow_refs(out_refs)
