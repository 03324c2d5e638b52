"""Per-stage exchange-byte instrumentation (VERDICT r4 #3).

Every engine all-to-all funnels through ``shuffle._add_bucket`` (the
map-side bucket assignment), so that is where exchange volume is counted:
each batch reports (tag, nbytes, rows) to a small session-named meter
actor (``num_cpus=0`` — takes no slot), and the driver snapshots the
meter at stage boundaries; the per-stage exchange volume is the snapshot
DELTA. This catches every shuffle a stage runs — including interior
``materialize()`` boundaries and self-committing partitioned builders,
which a stats-tree walk of the final consumed plan cannot see.

The tag defaults to the shuffle's key columns, so the per-tag breakdown
says WHICH exchange key carries the bytes. All calls are guarded:
instrumentation must never fail or slow a build (one fire-and-forget
actor call per map batch).
"""

from __future__ import annotations

from typing import Optional

METER_NAME = "eer_exchange_meter"

_METER = None  # per-process cached handle


class _ExchangeMeterImpl:
    """tag -> [bytes, rows], plus a monotone total."""

    def __init__(self):
        self.tags: dict = {}
        self.total_bytes = 0
        self.total_rows = 0

    def add(self, tag: str, nbytes: int, nrows: int) -> None:
        b = self.tags.setdefault(tag, [0, 0])
        b[0] += nbytes
        b[1] += nrows
        self.total_bytes += nbytes
        self.total_rows += nrows

    def snapshot(self) -> dict:
        return {
            "total_bytes": self.total_bytes,
            "total_rows": self.total_rows,
            "tags": {k: list(v) for k, v in self.tags.items()},
        }


def _get_meter():
    global _METER
    if _METER is None:
        import ray

        _METER = (
            ray.remote(_ExchangeMeterImpl)
            .options(name=METER_NAME, get_if_exists=True, num_cpus=0)
            .remote()
        )
    return _METER


def meter_add(tag: str, nbytes: int, nrows: int) -> None:
    """Worker-side, fire-and-forget; never raises."""
    try:
        _get_meter().add.remote(tag, int(nbytes), int(nrows))
    except Exception:
        global _METER
        _METER = None  # stale handle across sessions: rebuild next call


def meter_snapshot() -> Optional[dict]:
    """Driver-side synchronous snapshot; None when unavailable."""
    try:
        import ray

        return ray.get(_get_meter().snapshot.remote())
    except Exception:
        global _METER
        _METER = None
        return None


def snapshot_delta(before: Optional[dict], after: Optional[dict]) -> Optional[dict]:
    """Exchange volume between two snapshots: total + per-tag deltas."""
    if before is None or after is None:
        return None
    tags = {}
    for k, (b, r) in after["tags"].items():
        b0, r0 = before["tags"].get(k, (0, 0))
        if b > b0 or r > r0:
            tags[k] = [b - b0, r - r0]
    return {
        "exchange_bytes": after["total_bytes"] - before["total_bytes"],
        "exchange_rows": after["total_rows"] - before["total_rows"],
        "tags": tags,
    }
