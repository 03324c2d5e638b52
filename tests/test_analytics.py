"""Planted-data tests for the analytics batch: funnel stage cascade (the
sf corpora are so dense every user converts, so stages 0-2 only show up on
planted data), cohort offsets, and the batched Levenshtein kernel."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_levenshtein_batch_matches_reference():
    from entity_extractor_ray.pipelines.analytics import _levenshtein_batch

    rng = np.random.RandomState(7)
    alphabet = list("abcde")
    pairs = []
    for _ in range(200):
        la, lb = rng.randint(0, 9), rng.randint(0, 9)
        pairs.append(
            (
                "".join(rng.choice(alphabet, la)),
                "".join(rng.choice(alphabet, lb)),
            )
        )
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("same", "same")]
    got = _levenshtein_batch([a for a, _ in pairs], [b for _, b in pairs])
    want = np.array([_py_lev(a, b) for a, b in pairs])
    assert np.array_equal(got, want)


def _write_events(tmp_path, rows):
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                (
                    np.datetime64("2024-01-01")
                    + np.array([h for h, _, _ in rows], dtype="timedelta64[h]")
                ).astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for _, u, _ in rows], pa.int64()),
            "event_type": pa.array([e for _, _, e in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
def test_funnel_stages_planted(tmp_path):
    from entity_extractor_ray.pipelines.analytics import events_funnel

    rows = [
        # user 1: full ordered funnel -> stage 3
        (1, 1, "view"), (2, 1, "click"), (3, 1, "purchase"),
        # user 2: view then click, purchase BEFORE the click -> stage 2
        (1, 2, "view"), (5, 2, "click"), (4, 2, "purchase"),
        # user 3: click before any view -> stage 1 (view exists, click doesn't count)
        (5, 3, "click"), (6, 3, "view"),
        # user 4: never in the funnel types -> stage 0
        (1, 4, "error"), (2, 4, "signup"),
        # user 5: purchase tied with click timestamp (>= is inclusive) -> 3
        (1, 5, "view"), (2, 5, "click"), (2, 5, "purchase"),
    ]
    got = (
        events_funnel(_write_events(tmp_path, rows))
        .to_pandas()
        .set_index("stage")["n_users"]
        .to_dict()
    )
    assert got == {3: 2, 2: 1, 1: 1, 0: 1}


@pytest.mark.usefixtures("ray_session")
def test_cohort_offsets_planted(tmp_path):
    from entity_extractor_ray.pipelines.analytics import user_cohort_retention

    rows = [
        # user 1: first seen day 0, active again day 2 (two events that day
        # must count once)
        (0, 1, "view"), (48, 1, "view"), (50, 1, "click"),
        # user 2: first seen day 1 only
        (25, 2, "view"),
        # user 3: first seen day 0, active day 1
        (1, 3, "view"), (26, 3, "view"),
    ]
    got = user_cohort_retention(_write_events(tmp_path, rows)).to_pandas()
    got["cohort_day"] = got["cohort_day"].astype("datetime64[us]")
    d0 = pd.Timestamp("2024-01-01")
    d1 = pd.Timestamp("2024-01-02")
    want = {
        (d0, 0): 2,  # users 1 and 3 on their cohort day
        (d0, 1): 1,  # user 3
        (d0, 2): 1,  # user 1 (deduped within the day)
        (d1, 0): 1,  # user 2
    }
    gotmap = {
        (r.cohort_day, r.day_offset): r.n_users for r in got.itertuples()
    }
    assert gotmap == want


def _brute_skyline(size, price):
    n = len(size)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (
                size[j] >= size[i]
                and price[j] <= price[i]
                and (size[j] > size[i] or price[j] < price[i])
            ):
                keep[i] = False
                break
    return keep


def test_skyline_filter_matches_brute_force_and_is_a_combiner():
    from entity_extractor_ray.pipelines.analytics import _skyline_filter

    rng = np.random.RandomState(3)
    for trial in range(20):
        n = rng.randint(1, 60)
        # small value ranges force duplicate points (both must survive)
        size = rng.randint(0, 6, n).astype(np.int64)
        price = rng.randint(0, 6, n).astype(np.int64)
        got = _skyline_filter(size, price)
        want = _brute_skyline(size, price)
        assert np.array_equal(got, want), (trial, size, price)
        # combiner property: filtering partitions first never changes the front
        cut = n // 2
        keep_a = _skyline_filter(size[:cut], price[:cut]) if cut else np.zeros(0, bool)
        keep_b = _skyline_filter(size[cut:], price[cut:])
        s2 = np.r_[size[:cut][keep_a], size[cut:][keep_b]]
        p2 = np.r_[price[:cut][keep_a], price[cut:][keep_b]]
        final = _skyline_filter(s2, p2)
        got_pts = sorted(zip(s2[final], p2[final]))
        want_pts = sorted(zip(size[want], price[want]))
        assert got_pts == want_pts, trial


def test_lev_le1_matches_dp():
    from entity_extractor_ray.pipelines.analytics import (
        _encode_codepoints,
        _lev_dp,
        _lev_le1,
    )

    rng = np.random.RandomState(11)
    alphabet = list("ab")  # tiny alphabet maximizes near-miss pairs
    strs = ["".join(rng.choice(alphabet, rng.randint(0, 7))) for _ in range(80)]
    strs += ["", "a", "xyz", "xzy", "Customer#1", "Customer#2", "Customer#12"]
    M, lens = _encode_codepoints(strs)
    n = len(strs)
    ii, jj = np.triu_indices(n, k=1)
    band = np.abs(lens[ii] - lens[jj]) <= 1
    ii, jj = ii[band], jj[band]
    fast = _lev_le1(M[ii], M[jj], lens[ii], lens[jj])
    full = _lev_dp(M[ii], M[jj], lens[ii], lens[jj])
    assert np.array_equal(fast <= 1, full <= 1)
    hit = fast <= 1
    assert np.array_equal(fast[hit], full[hit])


@pytest.mark.usefixtures("ray_session")
def test_fk_audit_detects_planted_orphans(tmp_path):
    from entity_extractor_ray.pipelines.analytics import fk_integrity_audit

    def w(name, table):
        pq.write_table(table, str(tmp_path / f"{name}.parquet"))

    w("orders", pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 99], pa.int64()),  # 99 -> orphan
    }))
    w("customer", pa.table({"c_custkey": pa.array([10], pa.int64())}))
    w("part", pa.table({"p_partkey": pa.array([5], pa.int64())}))
    w("supplier", pa.table({"s_suppkey": pa.array([7], pa.int64())}))
    w("lineitem", pa.table({
        "l_orderkey": pa.array([1, 3, 3], pa.int64()),   # two orphan rows (3)
        "l_partkey": pa.array([5, 5, 6], pa.int64()),    # one orphan (6)
        "l_suppkey": pa.array([7, 7, 7], pa.int64()),    # none
    }))
    got = (
        fk_integrity_audit(str(tmp_path))
        .to_pandas()
        .set_index("fk")["n_orphans"]
        .to_dict()
    )
    assert got == {
        "lineitem.l_orderkey->orders": 2,
        "lineitem.l_partkey->part": 1,
        "lineitem.l_suppkey->supplier": 0,
        "orders.o_custkey->customer": 1,
    }


@pytest.mark.usefixtures("ray_session")
def test_cumulative_users_planted(tmp_path):
    """Planted first-day spread: the sf corpora funnel almost every user's
    first event into days 1-2, so the running sum's interesting shape
    (gaps, multi-day growth) only shows up planted. Also cross-checked
    against the SQL oracle on the same little table."""
    import duckdb

    from entity_extractor_ray.pipelines.analytics import (
        EVENTS_CUMULATIVE_USERS_SQL,
        events_cumulative_users,
    )

    rows = [
        # user 1: first on day 0, active again day 2 (re-activity must NOT
        # count as new)
        (1, 1, "view"), (49, 1, "click"),
        # user 2: two events day 0 (counted once)
        (2, 2, "view"), (5, 2, "view"),
        # user 3: first on day 1
        (25, 3, "view"),
        # users 4, 5: first on day 3 (a day-2 gap in n_new, not in n_cum)
        (75, 4, "purchase"), (80, 5, "view"),
    ]
    got = (
        events_cumulative_users(_write_events(tmp_path, rows))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert list(got["n_new"]) == [2, 1, 2]
    assert list(got["n_cum"]) == [2, 3, 5]
    assert list(got["day"].dt.day) == [1, 2, 4]  # Jan 1, 2, 4

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    orc = (
        con.execute(EVENTS_CUMULATIVE_USERS_SQL)
        .df()
        .sort_values("day")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["day", "n_new", "n_cum"]], orc[["day", "n_new", "n_cum"]],
        check_dtype=False,
    )


@pytest.mark.usefixtures("ray_session")
def test_sorted_neighborhood_halo_boundaries(tmp_path):
    """block=8 over 30 rows forces a halo at every block seam; the output
    must equal the brute-force window-by-rank reference, and must be
    invariant to the block size (halo correctness is exactly what block
    size must NOT leak into)."""
    from entity_extractor_ray.pipelines.analytics import sorted_neighborhood_pairs

    n = 30
    rng = np.random.RandomState(3)
    names = [f"Customer#{rng.randint(0, 10**9):09d}" for i in range(n)]
    t = pa.table(
        {
            "c_custkey": pa.array(range(n), pa.int64()),
            "c_name": pa.array(names, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "customer.parquet"))

    def run(block):
        return (
            sorted_neighborhood_pairs(str(tmp_path), window=4, block=block)
            .to_pandas()
            .sort_values(["id_a", "id_b", "d"])
            .reset_index(drop=True)
        )

    # brute force: sort by (reversed digits, custkey), all pairs with
    # rank gap in [1, window)
    key = [nm.replace("Customer#", "")[::-1] for nm in names]
    order = sorted(range(n), key=lambda i: (key[i], i))
    want = []
    for p in range(n):
        for d in range(1, 4):
            if p + d < n:
                want.append((order[p], order[p + d], d))
    want = (
        pd.DataFrame(want, columns=["id_a", "id_b", "d"])
        .sort_values(["id_a", "id_b", "d"])
        .reset_index(drop=True)
    )

    got8 = run(block=8)
    pd.testing.assert_frame_equal(got8, want, check_dtype=False)
    got512 = run(block=512)
    pd.testing.assert_frame_equal(got512, got8, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestCohortRetention:
    """Planted pin for events_cohort_retention beyond its every-suite-run
    DuckDB oracle: a hand-computed matrix plus the cohort-size identity."""

    def _write(self, tmp_path):
        import pyarrow.parquet as pq

        # u1 first day 1 (active d1, d3), u2 first day 1 (d1 only),
        # u3 first day 2 (d2, d3); two events same user+day collapse
        rows = [
            (1, "2024-01-01 10:00:00", 1), (2, "2024-01-01 11:00:00", 1),
            (3, "2024-01-03 09:00:00", 1),
            (4, "2024-01-01 12:00:00", 2),
            (5, "2024-01-02 08:00:00", 3), (6, "2024-01-02 20:00:00", 3),
            (7, "2024-01-03 07:00:00", 3),
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [np.datetime64(r[1].replace(" ", "T"), "us") for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["click"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_hand_computed_matrix(self, tmp_path):
        from entity_extractor_ray.pipelines.analytics import (
            events_cohort_retention,
        )

        sf = self._write(tmp_path)
        df = events_cohort_retention(sf).to_pandas()
        got = {
            (str(r.cohort_day)[:10], int(r.day_offset)): int(r.n_users)
            for r in df.itertuples()
        }
        assert got == {
            ("2024-01-01", 0): 2,  # u1, u2
            ("2024-01-01", 2): 1,  # u1 back on d3
            ("2024-01-02", 0): 1,  # u3
            ("2024-01-02", 1): 1,  # u3 on d3
        }
        # offset-0 rows partition the user base: their sum is the number
        # of distinct users
        assert df[df["day_offset"] == 0]["n_users"].sum() == 3
