"""As-of join — an operator Ray Data lacks, built as a composition of one
key-co-locating bucket shuffle + an in-bucket vectorized searchsorted.

Semantics (backward as-of, strict): for each LEFT row, attach the RIGHT row
of the same ``by`` group with the greatest ``on`` value strictly below the
left row's ``on`` (LEFT-join: nulls when no such row). Deterministic
because right-side (by, on) pairs are required unique — the caller dedups
(the query surface dedups by keeping max id per (by, on), matching the SQL
oracle's ASOF tie rule).

Partitioning assumption (documented per the task contract): all rows of one
``by`` key co-locate in one bucket task — the same assumption every keyed
window operator here makes; skewed keys pre-aggregate poorly for as-of
(order matters), so a pathological single key holds its full history in one
task. At 100 TB, range-partition ``on`` within the key (the segment-compose
pattern in linking.fold_chemical_states) before resorting to this shape.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_int64(series: pd.Series) -> np.ndarray:
    arr = series.to_numpy()
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[us]").astype(np.int64)
    return arr.astype(np.int64)


def asof_join(left_ds, right_ds, by: str, on: str,
              right_cols: Dict[str, str], n_buckets: int = 16,
              strict: bool = True):
    """left_ds rows + the as-of matching right row's ``right_cols``
    (source name -> output name), null-filled on miss.

    ONE shuffle: both sides are tagged and bucket-co-located on ``by``;
    each bucket sorts its right side once per key and answers every left
    row with a vectorized searchsorted."""
    from .shuffle import bucket_group_apply

    l_schema = left_ds.schema()
    left_names = list(l_schema.names)
    out_fields = list(zip(l_schema.names, l_schema.types))

    def tag_left(t: pa.Table) -> pa.Table:
        return t.append_column("__side", pa.array(["L"] * t.num_rows, pa.string()))

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {by: t.column(by), on: t.column(on)}
        for src in right_cols:
            cols["__r_" + src] = t.column(src)
        out = pa.table(cols)
        # align to the left schema: missing left columns ride as nulls
        for name, typ in out_fields:
            if name not in (by, on):
                out = out.append_column(name, pa.nulls(t.num_rows, typ))
        return out.append_column(
            "__side", pa.array(["R"] * t.num_rows, pa.string())
        )

    tagged_l = left_ds.map_batches(tag_left, batch_format="pyarrow")
    tagged_r = right_ds.map_batches(tag_right, batch_format="pyarrow")
    # the union's left batches lack the __r_* columns; add them as nulls so
    # both sides share one schema
    r_field_types = {}

    r_schema = right_ds.schema()
    for src in right_cols:
        r_field_types["__r_" + src] = r_schema.types[r_schema.names.index(src)]

    def widen_left(t: pa.Table) -> pa.Table:
        for name, typ in r_field_types.items():
            t = t.append_column(name, pa.nulls(t.num_rows, typ))
        return t

    # canonical column order for the union: left cols + __r_* + __side
    canon = left_names + list(r_field_types) + ["__side"]

    def order_cols(t: pa.Table) -> pa.Table:
        return t.select(canon)

    tagged_l = tagged_l.map_batches(widen_left, batch_format="pyarrow").map_batches(
        order_cols, batch_format="pyarrow"
    )
    tagged_r = tagged_r.map_batches(order_cols, batch_format="pyarrow")
    both = tagged_l.union(tagged_r)

    ts_like = {
        src: pa.types.is_timestamp(r_field_types["__r_" + src]) for src in right_cols
    }

    def bucket(df: pd.DataFrame, bucket_id: int) -> pa.Table:
        lefts: List[pd.DataFrame] = []
        rvals: Dict[str, list] = {out: [] for out in right_cols.values()}
        for _, g in df.groupby(by, sort=False):
            lmask = (g["__side"] == "L").to_numpy()
            lg = g[lmask]
            rg = g[~lmask]
            if lg.empty:
                continue
            lefts.append(lg[left_names])
            n = len(lg)
            if rg.empty:
                for out in right_cols.values():
                    rvals[out].extend([None] * n)
                continue
            r_on = _as_int64(rg[on])
            order = np.argsort(r_on, kind="stable")
            r_on_sorted = r_on[order]
            l_on = _as_int64(lg[on])
            idx = np.searchsorted(
                r_on_sorted, l_on, side="left" if strict else "right"
            ) - 1
            for src, out in right_cols.items():
                raw = rg["__r_" + src].to_numpy()
                if ts_like[src]:
                    raw = raw.astype("datetime64[us]").astype(np.int64)
                raw = raw[order]
                rvals[out].extend(
                    raw[i] if i >= 0 else None for i in idx
                )
        if not lefts:
            empty = {name: pa.array([], typ) for name, typ in out_fields}
            for src, out in right_cols.items():
                empty[out] = pa.array([], r_field_types["__r_" + src])
            return pa.table(empty)
        merged = pd.concat(lefts, ignore_index=True)
        cols = {name: pa.array(merged[name], typ) for name, typ in out_fields}
        for src, out in right_cols.items():
            typ = r_field_types["__r_" + src]
            vals = rvals[out]
            if ts_like[src]:
                cols[out] = pa.array(
                    [None if v is None else int(v) for v in vals],
                    pa.timestamp("us"),
                )
            else:
                cols[out] = pa.array(vals, typ)
        return pa.table(cols)

    return bucket_group_apply(both, [by], bucket, n_buckets)


def range_join(left_ds, intervals: pa.Table, on: str, how: str = "inner"):
    """Range join against a BROADCAST interval table: each left row matches
    intervals where lo <= row[on] <= hi. The interval side is
    dimension-sized (bands, buckets, SLA tiers), so it ships once via
    ray.put and every batch resolves matches with two vectorized
    searchsorted calls — never a shuffle, never a per-row loop.

    ``intervals`` columns: lo, hi + any label columns (all copied to the
    output). Intervals may NOT overlap (validated) — overlapping ranges
    would need an interval tree; non-overlap covers the banding/bucketing
    uses this engine needs and keeps the match vectorizable. how="left"
    keeps unmatched rows with null interval columns."""
    import ray

    lo = np.asarray(intervals.column("lo").to_pylist(), dtype=np.float64)
    hi = np.asarray(intervals.column("hi").to_pylist(), dtype=np.float64)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    if np.any(hi[:-1] >= lo[1:]) or np.any(hi < lo):
        raise ValueError("range_join requires non-overlapping, ordered intervals")
    label_cols = [n for n in intervals.schema.names if n not in ("lo", "hi")]
    labels = {n: np.asarray(intervals.column(n).to_pylist(), dtype=object)[order]
              for n in label_cols}
    label_types = {n: intervals.schema.field(n).type for n in label_cols}
    ref = ray.put((lo, hi, labels))

    def match(t: pa.Table) -> pa.Table:
        lo_, hi_, labels_ = ray.get(ref)
        vals = np.asarray(t.column(on).to_pylist(), dtype=np.float64)
        idx = np.searchsorted(lo_, vals, side="right") - 1
        ok = (idx >= 0) & (vals <= hi_[np.clip(idx, 0, None)])
        if how == "inner":
            t = t.filter(pa.array(ok))
            sel = idx[ok]
            for n in label_cols:
                t = t.append_column(n, pa.array(labels_[n][sel].tolist(),
                                                label_types[n]))
            return t
        out_cols = {}
        for n in label_cols:
            col = np.empty(len(vals), dtype=object)
            col[:] = None
            col[ok] = labels_[n][idx[ok]]
            out_cols[n] = pa.array(col.tolist(), label_types[n])
        for n in out_cols:
            t = t.append_column(n, out_cols[n])
        return t

    return left_ds.map_batches(match, batch_format="pyarrow")
