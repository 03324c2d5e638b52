"""Property-based checks (hypothesis) for the generic operators.

The pure kernels get wide random coverage; the Ray-executed operators get
a handful of random frames each (every example pays a full pipeline run
on the 4-CPU test session, so max_examples stays small — the planted unit
tests carry the fixed edge cases, these sweep the input space)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(c=st.integers(1, 60), n=st.integers(1, 12))
@settings(max_examples=200, deadline=None)
def test_ntile_matches_sql_rule(c, n):
    from entity_extractor_ray.stages.windowfns import _ntile

    rn = np.arange(1, c + 1)
    part_id = np.zeros(c, dtype=np.int64)
    part_start = np.array([0])
    got = _ntile(rn, part_id, part_start, c, n)
    # SQL rule: first c%n buckets take c//n+1 rows, the rest c//n
    sizes = [c // n + 1 if i < c % n else c // n for i in range(n)]
    exp = np.repeat(np.arange(1, n + 1), sizes)
    assert list(got) == list(exp)


def _key_frames(draw):
    lk = draw(st.lists(st.integers(0, 8), min_size=1, max_size=20))
    rk = draw(st.lists(st.integers(0, 8), min_size=0, max_size=20))
    left = pd.DataFrame({"k": lk, "a": range(len(lk))})
    right = pd.DataFrame({"rk": rk, "b": [f"v{i}" for i in range(len(rk))]})
    return left, right


@pytest.mark.usefixtures("ray_session")
@given(data=st.data())
@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_bucket_join_modes_match_pandas(data):
    import ray.data as rd

    from entity_extractor_ray.stages.shuffle import bucket_hash_join

    left, right = _key_frames(data.draw)

    def run(how):
        out = bucket_hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", right_key="rk", how=how, n_buckets=3,
        ).to_pandas()
        return out

    # inner / left / outer vs pandas merge (multiset of rows)
    for how in ("inner", "left", "outer"):
        got = run(how)
        exp = left.merge(right.rename(columns={"rk": "k"}), on="k", how=how)
        key_g = sorted(map(str, got.fillna("~").itertuples(index=False, name=None)))
        key_e = sorted(map(str, exp.fillna("~").itertuples(index=False, name=None)))
        assert key_g == key_e, how

    def a_col(df):
        # an all-empty Ray result arrives schemaless (0 columns) — treat
        # it as the empty column it semantically is
        return sorted(df["a"]) if "a" in df.columns else []

    matched = set(right["rk"])
    assert a_col(run("semi")) == sorted(left[left["k"].isin(matched)]["a"])
    assert a_col(run("anti")) == sorted(left[~left["k"].isin(matched)]["a"])


@pytest.mark.usefixtures("ray_session")
@given(data=st.data())
@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_asof_join_matches_pandas_merge_asof(data):
    import ray.data as rd

    from entity_extractor_ray.stages.windows import asof_join

    n_l = data.draw(st.integers(1, 30))
    n_r = data.draw(st.integers(0, 30))
    seed = data.draw(st.integers(0, 10_000))
    strict = data.draw(st.booleans())
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "u": rng.integers(0, 4, n_l),
        "t": rng.integers(0, 50, n_l).astype(np.int64),
        "lid": np.arange(n_l),
    })
    right = pd.DataFrame({
        "u": rng.integers(0, 4, n_r),
        "t": rng.integers(0, 50, n_r).astype(np.int64),
        "v": rng.integers(100, 200, n_r).astype(np.int64),
    }).drop_duplicates(["u", "t"])  # the operator's uniqueness contract

    got = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by="u", on="t", right_cols={"v": "v"}, n_buckets=3, strict=strict,
        )
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort"),
        on="t", by="u", direction="backward",
        allow_exact_matches=not strict,
    ).sort_values("lid").reset_index(drop=True)
    assert got["v"].fillna(-1).astype(np.int64).tolist() == \
        exp["v"].fillna(-1).astype(np.int64).tolist()


@pytest.mark.usefixtures("ray_session")
@given(data=st.data())
@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_window_kernels_match_pandas(data):
    import ray.data as rd

    from entity_extractor_ray.stages.windowfns import partitioned_window

    n = data.draw(st.integers(2, 40))
    parts = data.draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))
    rng_seed = data.draw(st.integers(0, 10_000))
    rng = np.random.default_rng(rng_seed)
    # unique order key per row -> deterministic row_number/lag/lead
    df = pd.DataFrame({
        "p": parts,
        "v": rng.permutation(n),
        "x": rng.integers(-50, 50, n),
    })
    out = (
        partitioned_window(
            rd.from_pandas(df), by=["p"], order_by=["v"],
            specs=[
                ("row_number", None, "rn"),
                ("lag", "x", "px"),
                ("lead", "x", "nx"),
                ("running_sum", "x", "cx"),
            ],
            keep_cols=["p", "v", "x"], n_buckets=3,
        )
        .to_pandas()
        .sort_values(["p", "v"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["p", "v"]).reset_index(drop=True)
    g = ref.groupby("p", sort=False)
    assert list(out["rn"]) == list(g.cumcount() + 1)
    assert out["px"].fillna(999).tolist() == g["x"].shift(1).fillna(999).tolist()
    assert out["nx"].fillna(999).tolist() == g["x"].shift(-1).fillna(999).tolist()
    assert list(out["cx"]) == list(g["x"].cumsum())
