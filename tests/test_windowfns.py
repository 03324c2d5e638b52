"""Window-function kernels vs hand-computed SQL semantics on planted data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_partitioned_window_all_kinds():
    import ray.data as rd

    from entity_extractor_ray.stages.windowfns import partitioned_window

    # two partitions; partition "a" has a tie on the order key (v=5 twice)
    df = pd.DataFrame(
        {
            "p": ["a", "a", "a", "a", "b", "b"],
            "v": [5, 3, 5, 9, 2, 2],
            "id": [1, 2, 3, 4, 5, 6],
            "x": [10, 20, 30, 40, 50, 60],
        }
    )
    schema = pa.schema(
        [
            ("p", pa.string()),
            ("v", pa.int64()),
            ("id", pa.int64()),
            ("rn", pa.int64()),
            ("rk", pa.int64()),
            ("drk", pa.int64()),
            ("prev_x", pa.int64()),
            ("next_x", pa.int64()),
            ("run_x", pa.int64()),
        ]
    )
    out = partitioned_window(
        rd.from_pandas(df),
        by=["p"],
        order_by=["v"],
        specs=[
            ("row_number", None, "rn"),
            ("rank", None, "rk"),
            ("dense_rank", None, "drk"),
            ("lag", "x", "prev_x"),
            ("lead", "x", "next_x"),
            ("running_sum", "x", "run_x"),
        ],
        out_schema=schema,
        keep_cols=["p", "v", "id"],
        n_buckets=4,
    ).to_pandas()
    out = out.sort_values(["p", "v", "id"]).reset_index(drop=True)

    # partition a sorted by v: (3,id2) (5,id1) (5,id3) (9,id4)
    a = out[out["p"] == "a"]
    assert list(a["v"]) == [3, 5, 5, 9]
    assert list(a["rn"]) == [1, 2, 3, 4]
    assert list(a["rk"]) == [1, 2, 2, 4]  # RANK gaps after the tie
    assert list(a["drk"]) == [1, 2, 2, 3]  # DENSE_RANK does not
    # lag/lead follow the sorted order (x of the sorted rows: 20,10,30,40)
    assert list(a["prev_x"].fillna(-1)) == [-1, 20, 10, 30]
    assert list(a["next_x"].fillna(-1)) == [10, 30, 40, -1]
    assert list(a["run_x"]) == [20, 30, 60, 100]

    b = out[out["p"] == "b"]
    assert list(b["rk"]) == [1, 1]
    assert list(b["drk"]) == [1, 1]
    assert list(b["run_x"]) == [50, 110]


@pytest.mark.usefixtures("ray_session")
def test_ntile_and_first_last_value():
    import ray.data as rd

    from entity_extractor_ray.stages.windowfns import partitioned_window

    # c=6, n=4 -> SQL bucket sizes 2,2,1,1 (NOT the even-division 2,1,2,1)
    df = pd.DataFrame(
        {"p": ["a"] * 6 + ["b"] * 3, "v": list(range(6)) + [7, 8, 9],
         "x": [10, 20, 30, 40, 50, 60, 70, 80, 90]}
    )
    out = partitioned_window(
        rd.from_pandas(df),
        by=["p"],
        order_by=["v"],
        specs=[
            ("ntile", 4, "tile"),
            ("first_value", "x", "fx"),
            ("last_value", "x", "lx"),
        ],
        keep_cols=["p", "v"],
        n_buckets=2,
    ).to_pandas().sort_values(["p", "v"]).reset_index(drop=True)

    a = out[out["p"] == "a"]
    assert list(a["tile"]) == [1, 1, 2, 2, 3, 4]
    assert set(a["fx"]) == {10} and set(a["lx"]) == {60}
    b = out[out["p"] == "b"]
    assert list(b["tile"]) == [1, 2, 3]  # c < n: one row per leading tile
    assert set(b["fx"]) == {70} and set(b["lx"]) == {90}


@pytest.mark.usefixtures("ray_session")
def test_percent_rank_cume_dist():
    import ray.data as rd

    from entity_extractor_ray.stages.windowfns import partitioned_window

    # partition a: v = 3,5,5,9 -> ranks 1,2,2,4
    df = pd.DataFrame(
        {"p": ["a"] * 4 + ["b"], "v": [3, 5, 5, 9, 7], "id": range(5)}
    )
    out = (
        partitioned_window(
            rd.from_pandas(df), by=["p"], order_by=["v"],
            specs=[("percent_rank", None, "pr"), ("cume_dist", None, "cd")],
            keep_cols=["p", "v", "id"], n_buckets=2,
        )
        .to_pandas().sort_values(["p", "v", "id"]).reset_index(drop=True)
    )
    a = out[out["p"] == "a"]
    assert list(a["pr"]) == [0.0, 1 / 3, 1 / 3, 1.0]
    assert list(a["cd"]) == [0.25, 0.75, 0.75, 1.0]
    b = out[out["p"] == "b"]  # single-row partition
    assert list(b["pr"]) == [0.0] and list(b["cd"]) == [1.0]


@pytest.mark.usefixtures("ray_session")
def test_partitioned_window_descending_matches_pandas():
    import ray.data as rd

    from entity_extractor_ray.stages.windowfns import partitioned_window

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "p": rng.integers(0, 20, n),
            "v": rng.integers(0, 30, n),  # plenty of ties
            "id": np.arange(n),
        }
    )
    out = partitioned_window(
        rd.from_pandas(df),
        by=["p"],
        order_by=["v"],
        descending=[True],
        specs=[("rank", None, "rk"), ("dense_rank", None, "drk")],
        keep_cols=["p", "v", "id"],
        n_buckets=8,
    ).to_pandas()

    exp_rk = df.groupby("p")["v"].rank(method="min", ascending=False).astype(int)
    exp_drk = df.groupby("p")["v"].rank(method="dense", ascending=False).astype(int)
    exp = df.assign(rk=exp_rk, drk=exp_drk).sort_values("id").reset_index(drop=True)
    got = out.sort_values("id").reset_index(drop=True)
    assert list(got["rk"]) == list(exp["rk"])
    assert list(got["drk"]) == list(exp["drk"])
