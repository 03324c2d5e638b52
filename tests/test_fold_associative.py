"""Associative segment fold == whole-history fold, including coercions.

fold_chemical_states (range-sort + per-block segment transfer functions +
per-entity composition) must produce exactly what the reference-shaped
fold_chemical_states_simple produces, even when a hot entity's mentions
span many blocks."""

import numpy as np
import pyarrow as pa
import pytest

from entity_extractor_ray.stages.linking import (
    _build_fold_tables,
    fold_chemical_states,
    fold_chemical_states_simple,
)


def _linked_table(n_entities: int = 30, hot_mentions: int = 400) -> pa.Table:
    """A hot entity with hundreds of ordered mentions (mixed sources incl.
    impossible OECD->MANUAL flips) plus ordinary entities."""
    rng = np.random.RandomState(13)
    ents, orders, tags, sources = [], [], [], []

    def add(ent, i, tag, src):
        ents.append(ent)
        orders.append(f"conv{i:06d}|{i % 9:08d}")
        tags.append(tag)
        sources.append(src)

    for i in range(hot_mentions):
        tag = ("PFAS", "NO_PFAS", "PENDING", "UNKNOWN")[int(rng.randint(0, 4))]
        src = ("OPENAI", "OECD", "MANUAL", "NONE")[int(rng.randint(0, 4))]
        add("hot-entity", i, tag, src)
    for e in range(n_entities):
        for i in range(int(rng.randint(1, 6))):
            tag = ("PFAS", "NO_PFAS", "PENDING")[int(rng.randint(0, 3))]
            src = ("OPENAI", "OECD", "MANUAL", "NONE")[int(rng.randint(0, 4))]
            add(f"ent{e:04d}", 1000 + e * 10 + i, tag, src)

    return pa.table(
        {
            "entity_id": pa.array(ents, pa.string()),
            "order_key": pa.array(orders, pa.string()),
            "tag": pa.array(tags, pa.string()),
            "source": pa.array(sources, pa.string()),
        }
    )


def _rows(ds):
    return sorted(
        (r["entity_id"], r["pfas_status"], r["pfas_information_source"],
         r["n_mentions"], r["n_coerced"])
        for r in ds.take_all()
    )


class TestAssociativeFold:
    def test_matches_simple_fold(self, ray_session):
        import ray.data as rd

        # many small blocks force the hot entity to span block boundaries,
        # exercising cross-segment composition
        ds = rd.from_arrow(_linked_table()).repartition(16)
        got = _rows(fold_chemical_states(ds, n_buckets=8))
        want = _rows(fold_chemical_states_simple(ds, n_buckets=8))
        assert got == want
        # sanity: the mixed-source stream must have produced coercions
        assert any(r[4] > 0 for r in want)

    def test_transfer_tables_match_pointwise_fold(self):
        """Every (state, mention-type) table cell equals the direct fold."""
        from entity_extractor_ray.functions.decision_tables import (
            STATUSES,
            TransitionError,
            final_source,
            final_status,
        )

        states, state_idx, mtype_idx, step, coer, init = _build_fold_tables(
            ["OPENAI", "OECD", "MANUAL", "NONE"]
        )
        for (est, esrc), si in state_idx.items():
            for (nst, nsrc), mi in mtype_idx.items():
                try:
                    src = final_source(esrc, nsrc)
                    status = final_status(esrc, nsrc, est, nst)
                    assert states[step[si, mi]] == (status, src)
                    assert coer[si, mi] == 0
                except TransitionError:
                    assert step[si, mi] == si
                    assert coer[si, mi] == 1
        assert len(states) == len(STATUSES) * 5
