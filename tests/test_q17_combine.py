"""Cardinality robustness of q17's two-level map-side combine.

Plants a lineitem-like table whose part-key space (40k keys) is far larger
than the forced level-1 combine batch (8192 rows), the regime where the
round-3 single-level combine silently stopped shrinking (one partial per raw
row — the exchange carried ~the whole fact table). Asserts that

1. the two-level combine's exchange input stays ≤ 2x distinct keys
   (n_coalesce=2 → the level-2 bound), and
2. the merged statistics equal an exact serial groupby, so the reduction is
   lossless.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

N_ROWS = 200_000
N_KEYS = 40_000


@pytest.fixture(scope="module")
def planted_li(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    pk = rng.integers(0, N_KEYS, size=N_ROWS, dtype=np.int64)
    qty = rng.integers(1, 50, size=N_ROWS).astype(np.float64)
    t = pa.table(
        {
            "l_partkey": pa.array(pk, pa.int64()),
            "l_quantity": pa.array(qty, pa.float64()),
        }
    )
    # many small blocks => many level-1 combine scopes, the worst case
    return rd.from_arrow(t).repartition(16).materialize(), pk, qty


def test_exchange_rows_bounded_by_cardinality(planted_li):
    from entity_extractor_ray.pipelines.relational import part_qty_partials

    ds, pk, _ = planted_li
    pre2 = part_qty_partials(ds, combine_batch_size=8192, n_coalesce=2)
    n_exchange = pre2.count()
    n_distinct = len(np.unique(pk))
    # the level-2 bound: ≤ n_coalesce x distinct keys (observed ~1.84x),
    # where a single-level 8192-row combine over 40k keys would emit close
    # to one partial per raw row (~200k)
    assert n_exchange <= 2 * n_distinct, (n_exchange, n_distinct)


def test_two_level_combine_is_lossless(planted_li):
    from entity_extractor_ray.pipelines.relational import part_qty_partials

    ds, pk, qty = planted_li
    pre2 = part_qty_partials(ds, combine_batch_size=8192, n_coalesce=2)
    got = pre2.to_pandas().groupby("pk").agg(sq=("sq", "sum"), cnt=("cnt", "sum"))

    q_int = np.round(qty).astype(np.int64)
    order = np.argsort(pk, kind="mergesort")
    pks, qs = pk[order], q_int[order]
    starts = np.flatnonzero(np.r_[True, pks[1:] != pks[:-1]])
    exp_keys = pks[starts]
    exp_sq = np.add.reduceat(qs, starts)
    exp_cnt = np.diff(np.r_[starts, len(pks)])

    got = got.sort_index()
    assert np.array_equal(got.index.to_numpy(), exp_keys)
    assert np.array_equal(got["sq"].to_numpy(), exp_sq)
    assert np.array_equal(got["cnt"].to_numpy(), exp_cnt)
