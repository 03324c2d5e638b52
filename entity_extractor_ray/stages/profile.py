"""One-pass distributed table profiler — the data-quality census every
ingest runs before a 100-TB job: per column, row/null counts, distinct
cardinality, and typed min/max, computed from MERGEABLE map-side partials
(one tiny row per column per batch) and one dimension-sized reduce.

Shapes and honesty rules follow the sketches module:
  * the distinct count is a KMV bottom-k union — each batch ships at most k
    hashes per column, and the merged count is EXACT whenever no batch
    truncated (the ``exact`` flag; the SQL oracle rides that regime at test
    scale) and a ~1/sqrt(k-2) estimate beyond, never silently;
  * min/max are exact lattice merges (min-of-mins / max-of-maxs);
  * means are deliberately ABSENT: float sums are accumulation-order
    dependent, so a hash-compared oracle cannot pin them — use the
    cents-exact aggregate queries for money columns instead.

Timestamps profile as epoch microseconds (both engines compute the same
integer), numerics as float64, strings lexicographically.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .shuffle import bucket_group_apply
from .sketches import hash63

logger = logging.getLogger("entity_extractor_ray.profile")

PROFILE_K = 65536


def _empty_partial() -> pa.Table:
    return pa.table(
        {
            "col": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "n_null": pa.array([], pa.int64()),
            "kmv": pa.array([], pa.list_(pa.uint64())),
            "trunc": pa.array([], pa.bool_()),
            "min_num": pa.array([], pa.float64()),
            "max_num": pa.array([], pa.float64()),
            "min_str": pa.array([], pa.string()),
            "max_str": pa.array([], pa.string()),
        }
    )


def profile_table(ds, columns=None, k: int = PROFILE_K, n_buckets: int = 4):
    """Profile ``columns`` (default: every column) of a Dataset.

    Output, one row per column:
      (col, n_rows, n_null, n_distinct int64, exact bool,
       min_num float64|null, max_num float64|null,   -- numeric/timestamp
       min_str string|null,  max_str string|null)    -- string columns
    """
    if columns is None:
        columns = list(ds.schema().names)

    def partial(t: pa.Table) -> pa.Table:
        rows = {key: [] for key in (
            "col", "n_rows", "n_null", "kmv", "trunc",
            "min_num", "max_num", "min_str", "max_str",
        )}
        for c in columns:
            arr = t.column(c)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            typ = arr.type
            valid = arr.drop_null()
            min_num = max_num = None
            min_str = max_str = None
            if len(valid):
                if pa.types.is_timestamp(typ):
                    mm = pc.min_max(pc.cast(valid, pa.int64()))
                    min_num, max_num = float(mm["min"].as_py()), float(mm["max"].as_py())
                elif pa.types.is_integer(typ) or pa.types.is_floating(typ):
                    mm = pc.min_max(valid)
                    min_num, max_num = float(mm["min"].as_py()), float(mm["max"].as_py())
                elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                    mm = pc.min_max(valid)
                    min_str, max_str = mm["min"].as_py(), mm["max"].as_py()
                else:
                    raise ValueError(
                        f"profile_table: unsupported column type {typ} for {c!r}"
                    )
            uniq = pc.unique(valid)
            hs = np.unique(hash63(uniq.to_pylist()))
            trunc = len(hs) > k
            if trunc:
                logger.warning(
                    "profile_table: column %r batch has %d distinct > k=%d; "
                    "count degrades to a KMV estimate", c, len(hs), k,
                )
                hs = hs[:k]
            rows["col"].append(c)
            rows["n_rows"].append(len(arr))
            rows["n_null"].append(arr.null_count)
            rows["kmv"].append(hs)
            rows["trunc"].append(trunc)
            rows["min_num"].append(min_num)
            rows["max_num"].append(max_num)
            rows["min_str"].append(min_str)
            rows["max_str"].append(max_str)
        return pa.table(
            {
                "col": pa.array(rows["col"], pa.string()),
                "n_rows": pa.array(rows["n_rows"], pa.int64()),
                "n_null": pa.array(rows["n_null"], pa.int64()),
                "kmv": pa.array(rows["kmv"], pa.list_(pa.uint64())),
                "trunc": pa.array(rows["trunc"], pa.bool_()),
                "min_num": pa.array(rows["min_num"], pa.float64()),
                "max_num": pa.array(rows["max_num"], pa.float64()),
                "min_str": pa.array(rows["min_str"], pa.string()),
                "max_str": pa.array(rows["max_str"], pa.string()),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow")

    def bucket_fn(df: pd.DataFrame, bucket_id: int) -> pa.Table:
        out = {key: [] for key in (
            "col", "n_rows", "n_null", "n_distinct", "exact",
            "min_num", "max_num", "min_str", "max_str",
        )}
        for col, g in df.groupby("col", sort=False):
            merged = np.unique(np.concatenate([np.asarray(v, np.uint64)
                                               for v in g["kmv"]]))
            trunc_any = bool(g["trunc"].any())
            if not trunc_any:
                n_distinct, exact = len(merged), True
            else:
                # union of bottom-k sets contains the union's true bottom-k
                merged = merged[:k]
                theta = float(merged[k - 1]) / float(1 << 63)
                n_distinct, exact = int(round((k - 1) / theta)), False
            out["col"].append(col)
            out["n_rows"].append(int(g["n_rows"].sum()))
            out["n_null"].append(int(g["n_null"].sum()))
            out["n_distinct"].append(n_distinct)
            out["exact"].append(exact)
            out["min_num"].append(g["min_num"].min(skipna=True))
            out["max_num"].append(g["max_num"].max(skipna=True))
            mn = g["min_str"].dropna()
            mx = g["max_str"].dropna()
            out["min_str"].append(mn.min() if len(mn) else None)
            out["max_str"].append(mx.max() if len(mx) else None)
        def _f(vals):
            return pa.array([None if v is None or (isinstance(v, float) and np.isnan(v))
                             else float(v) for v in vals], pa.float64())
        return pa.table(
            {
                "col": pa.array(out["col"], pa.string()),
                "n_rows": pa.array(out["n_rows"], pa.int64()),
                "n_null": pa.array(out["n_null"], pa.int64()),
                "n_distinct": pa.array(out["n_distinct"], pa.int64()),
                "exact": pa.array(out["exact"], pa.bool_()),
                "min_num": _f(out["min_num"]),
                "max_num": _f(out["max_num"]),
                "min_str": pa.array(out["min_str"], pa.string()),
                "max_str": pa.array(out["max_str"], pa.string()),
            }
        )

    return bucket_group_apply(pre, ["col"], bucket_fn, n_buckets=n_buckets)


def profile_table_sql(table: str, num_cols=(), ts_cols=(), str_cols=()) -> str:
    """Exact-regime oracle: one UNION ALL arm per profiled column."""
    arms = []

    def arm(c, min_expr, max_expr, as_num: bool):
        null_num = "CAST(NULL AS DOUBLE)"
        null_str = "CAST(NULL AS VARCHAR)"
        min_num = min_expr if as_num else null_num
        max_num = max_expr if as_num else null_num
        min_str = null_str if as_num else min_expr
        max_str = null_str if as_num else max_expr
        return f"""
        SELECT '{c}' AS col, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               TRUE AS exact,
               {min_num} AS min_num, {max_num} AS max_num,
               {min_str} AS min_str, {max_str} AS max_str
        FROM {table}"""

    for c in num_cols:
        arms.append(arm(c, f"CAST(min({c}) AS DOUBLE)", f"CAST(max({c}) AS DOUBLE)", True))
    for c in ts_cols:
        arms.append(arm(c, f"CAST(epoch_us(min({c})) AS DOUBLE)",
                        f"CAST(epoch_us(max({c})) AS DOUBLE)", True))
    for c in str_cols:
        arms.append(arm(c, f"min({c})", f"max({c})", False))
    return " UNION ALL ".join(arms)
