"""As-of join — an operator Ray Data lacks, built as a composition of one
key-co-locating bucket shuffle + an in-bucket vectorized searchsorted.

Semantics (backward as-of, strict): for each LEFT row, attach the RIGHT row
of the same ``by`` group with the greatest ``on`` value strictly below the
left row's ``on`` (LEFT-join: nulls when no such row). Deterministic
because right-side (by, on) pairs are required unique — ENFORCED: the
bucket fn raises on duplicates (a tie would make the engine pick one row
and a SQL ASOF oracle pick an arbitrary other). Callers dedup first; the
query surface keeps max event_id per (by, on).

Partitioning assumption (documented per the task contract): all rows of one
``by`` key co-locate in one bucket task — the same assumption every keyed
window operator here makes; skewed keys pre-aggregate poorly for as-of
(order matters), so a pathological single key holds its full history in one
task. At 100 TB, range-partition ``on`` within the key (the segment-compose
pattern in linking.fold_chemical_states) before resorting to this shape.
"""

from __future__ import annotations

from typing import Dict

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
        """Fully vectorized in-bucket match: ONE joint lexsort over
        (by-code, on, side) for all keys at once; each left row's match is
        'the last right row before me in that order within my group',
        computed with a cumulative right-count — no per-key loop, no
        per-row Python gather (the round-2 version looped users and emitted
        right values through a per-left-row generator)."""
        lmask = (df["__side"] == "L").to_numpy()
        lg = df[lmask]
        if lg.empty:
            empty = {name: pa.array([], typ) for name, typ in out_fields}
            for src, out in right_cols.items():
                empty[out] = pa.array([], r_field_types["__r_" + src])
            return pa.table(empty)
        rg = df[~lmask]
        n_l, n_r = len(lg), len(rg)
        codes = pd.factorize(df[by], sort=False)[0]
        lcodes, rcodes = codes[lmask], codes[~lmask]
        l_on = _as_int64(lg[on])

        if n_r == 0:
            match = np.full(n_l, -1, np.int64)
            r_order = np.zeros(0, np.int64)
        else:
            r_on = _as_int64(rg[on])
            r_order = np.lexsort((r_on, rcodes))
            rc_s, ro_s = rcodes[r_order], r_on[r_order]
            dup = (rc_s[1:] == rc_s[:-1]) & (ro_s[1:] == ro_s[:-1])
            if dup.any():
                raise ValueError(
                    "asof_join requires unique right-side (by, on) pairs "
                    f"for a deterministic match; found {int(dup.sum())} "
                    "duplicates — dedup the right side first"
                )
            # combined order: (code, on, side); strict => a left row ties
            # BEFORE the equal-on right (so the equal right is not counted),
            # non-strict => after
            side_rank = np.concatenate(
                [np.zeros(n_l, np.int8), np.ones(n_r, np.int8)]
                if strict
                else [np.ones(n_l, np.int8), np.zeros(n_r, np.int8)]
            )
            code_all = np.concatenate([lcodes, rcodes])
            on_all = np.concatenate([l_on, r_on])
            order = np.lexsort((side_rank, on_all, code_all))
            is_right = order >= n_l
            cum = np.cumsum(is_right)
            left_pos = np.flatnonzero(~is_right)
            orig_left = order[left_pos]  # indices into lg's row order
            cand = cum[left_pos] - 1  # last right anywhere before, in r_order
            ok = cand >= 0
            # the candidate must belong to the SAME group — rights of earlier
            # groups sort before and would otherwise leak across keys
            ok[ok] = rc_s[cand[ok]] == lcodes[orig_left[ok]]
            match = np.full(n_l, -1, np.int64)
            match[orig_left] = np.where(ok, cand, -1)

        miss = match < 0
        take = np.clip(match, 0, None)
        cols = {name: pa.array(lg[name], typ) for name, typ in out_fields}
        for src, out in right_cols.items():
            typ = r_field_types["__r_" + src]
            if n_r == 0:
                cols[out] = pa.nulls(n_l, typ)
                continue
            raw = rg["__r_" + src].to_numpy()
            if ts_like[src]:
                raw = raw.astype("datetime64[us]").astype(np.int64)
                vals = raw[r_order][take]
                cols[out] = pa.array(vals, type=pa.timestamp("us"), mask=miss)
            else:
                vals = raw[r_order][take].astype(object)
                vals[miss] = None
                cols[out] = pa.array(vals, typ, from_pandas=True)
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
        vals = t.column(on).to_numpy(zero_copy_only=False).astype(np.float64)
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
