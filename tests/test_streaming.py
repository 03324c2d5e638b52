"""Watermark / late-data semantics: the late side-output must match the
window SQL on a planted OUT-OF-ORDER stream (the synthetic testdata is
perfectly in-order, so the driver-level oracle only covers the watermark
summary — this pins the late-detection path itself)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from entity_extractor_ray.pipelines.relational import (
    EVENTS_LATE_SQL,
    events_late,
    events_watermark,
)


def _planted_events(tmpdir) -> str:
    """3 users; user 1 has two badly-late arrivals (>10 min behind the
    running max), user 2 has one mildly-out-of-order (not late) arrival."""
    rng = np.random.RandomState(3)
    rows = []  # (event_id, user_id, ts_us)
    base = 1_700_000_000_000_000
    eid = 0
    for i in range(20):  # user 0: in order
        rows.append((eid, 0, base + i * 60_000_000)); eid += 1
    t = base
    for i in range(20):  # user 1: mostly in order...
        t += 60_000_000
        rows.append((eid, 1, t)); eid += 1
    rows.append((eid, 1, base - 3_600_000_000)); eid += 1  # 1h late
    rows.append((eid, 1, t - 1_200_000_000)); eid += 1  # 20min late
    for i in range(10):  # user 2: one 30s wobble (under 600s lateness)
        ts = base + i * 60_000_000 - (30_000_000 if i == 5 else 0)
        rows.append((eid, 2, ts)); eid += 1

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(np.array([r[2] for r in rows], np.int64),
                           pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["x"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    path = str(tmpdir / "events.parquet")
    pq.write_table(table, path)
    return str(tmpdir), path


class TestWatermark:
    def test_late_side_output_matches_sql(self, ray_session, tmp_path):
        sf_dir, path = _planted_events(tmp_path)
        got = sorted(
            (r["user_id"], r["event_id"], r["ts"], r["watermark"])
            for r in events_late(sf_dir).take_all()
        )
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
        want = sorted(map(tuple, con.execute(
            "SELECT user_id, event_id, ts, watermark FROM (" + EVENTS_LATE_SQL + ")"
        ).fetchall()))
        assert len(want) == 2  # exactly the two planted late arrivals
        assert got == want

    def test_watermark_summary_counts_late(self, ray_session, tmp_path):
        sf_dir, path = _planted_events(tmp_path)
        got = {r["user_id"]: r["n_late"] for r in events_watermark(sf_dir).take_all()}
        assert got == {0: 0, 1: 2, 2: 0}


class TestAsofJoin:
    def test_backward_strict_and_misses(self, ray_session):
        import ray.data as rd

        from entity_extractor_ray.stages.windows import asof_join

        left = pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
                "t": pa.array([10, 20, 30, 5, 7], pa.int64()),
                "payload": pa.array(["a", "b", "c", "d", "e"], pa.string()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1, 1, 2], pa.int64()),
                "t": pa.array([10, 25, 9], pa.int64()),
                "tag": pa.array(["r10", "r25", "r9"], pa.string()),
            }
        )
        out = asof_join(
            rd.from_arrow(left), rd.from_arrow(right), by="k", on="t",
            right_cols={"tag": "asof_tag", "t": "asof_t"}, n_buckets=4,
        )
        rows = {(r["k"], r["t"]): (r["asof_tag"], r["asof_t"]) for r in out.take_all()}
        assert rows[(1, 10)] == (None, None)      # strict: t=10 not < 10
        assert rows[(1, 20)] == ("r10", 10)
        assert rows[(1, 30)] == ("r25", 25)
        assert rows[(2, 5)] == (None, None)       # right exists but later
        assert rows[(3, 7)] == (None, None)       # key absent on the right
        assert len(rows) == 5


class TestRangeJoin:
    def test_inner_left_and_validation(self, ray_session):
        import ray.data as rd

        from entity_extractor_ray.stages.windows import range_join

        left = pa.table(
            {"v": pa.array([1, 5, 10, 11, 99], pa.int64()),
             "id": pa.array([0, 1, 2, 3, 4], pa.int64())}
        )
        bands = pa.table(
            {"lo": pa.array([1, 11], pa.int64()),
             "hi": pa.array([10, 20], pa.int64()),
             "band": pa.array(["a", "b"], pa.string())}
        )
        inner = {r["id"]: r["band"]
                 for r in range_join(rd.from_arrow(left), bands, on="v").take_all()}
        assert inner == {0: "a", 1: "a", 2: "a", 3: "b"}  # 99 dropped
        left_out = {r["id"]: r["band"] for r in range_join(
            rd.from_arrow(left), bands, on="v", how="left").take_all()}
        assert left_out[4] is None and len(left_out) == 5

        overlapping = pa.table(
            {"lo": pa.array([1, 5], pa.int64()),
             "hi": pa.array([10, 20], pa.int64()),
             "band": pa.array(["a", "b"], pa.string())}
        )
        with pytest.raises(ValueError):
            range_join(rd.from_arrow(left), overlapping, on="v")
