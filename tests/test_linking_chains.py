"""Pin the engine's entity-linking granularity on adversarial alias chains.

The reference's two-tier probe (cas, name) against a mutable store is
ORDER-DEPENDENT: for the chain (A,X), (B,X), (B,Y) ingested in that order it
keeps two nodes, but a (B,Y)-first order yields different nodes. The engine
intentionally diverges to the order-independent TRANSITIVE CLOSURE (one
cluster per connected alias chain) — documented in stages/linking.py. These
tests pin that choice: chains collapse, and the result is identical under
any input order/partitioning.
"""

import pyarrow as pa
import pytest


def _mentions(rows):
    """rows: (conv_id, turn_idx, manufacturer, name, cas|None); pos (the A1
    within-conversation processing order) mirrors turn_idx here — these
    fixtures plant one mention per turn."""
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "pos": pa.array([r[1] for r in rows], pa.int32()),
                "manufacturer": pa.array([r[2] for r in rows], pa.string()),
                "name": pa.array([r[3] for r in rows], pa.string()),
                "cas": pa.array([r[4] for r in rows], pa.string()),
            }
        )
    )


def _clusters(mapping_ds):
    nodes = [r for r in mapping_ds.take_all() if r["row_kind"] == "NODE"]
    return {(n["manufacturer"], n["name"], n["cas"]) for n in nodes}


@pytest.mark.usefixtures("ray_session")
class TestAliasChains:
    def test_chain_collapses_to_one_cluster(self):
        from entity_extractor_ray.stages.linking import build_chemical_mapping

        rows = [
            ("c1", 0, "M", "A", "X"),
            ("c1", 1, "M", "B", "X"),
            ("c1", 2, "M", "B", "Y"),
        ]
        mapping = build_chemical_mapping(_mentions(rows), n_buckets=4)
        nodes = _clusters(mapping)
        # transitive closure: ONE node (reference arrival-order probe would
        # keep two — documented divergence, linking.py module docstring)
        assert len(nodes) == 1
        mfr, name, cas = next(iter(nodes))
        assert name == "A"  # winner = min order key member
        assert cas == "Y"  # canonical cas = LAST mention's cas

    def test_chain_order_independent(self):
        from entity_extractor_ray.stages.linking import build_chemical_mapping

        base = [
            ("c1", 0, "M", "A", "X"),
            ("c1", 1, "M", "B", "X"),
            ("c1", 2, "M", "B", "Y"),
            ("c2", 0, "M", "C", "Y"),
            ("c2", 1, "M", "D", None),
        ]
        shuffled = [base[3], base[1], base[4], base[0], base[2]]
        m1 = _clusters(build_chemical_mapping(_mentions(base), n_buckets=4))
        m2 = _clusters(build_chemical_mapping(_mentions(shuffled), n_buckets=2))
        assert m1 == m2
        # A-B-C chain via X,Y collapses; D stands alone
        assert len(m1) == 2

    def test_probe_keys_all_resolve_to_cluster(self):
        from entity_extractor_ray.stages.linking import (
            build_chemical_mapping,
            probe_hash,
        )

        rows = [
            ("c1", 0, "M", "A", "X"),
            ("c1", 1, "M", "B", "X"),
            ("c1", 2, "M", "B", "Y"),
        ]
        mapping = build_chemical_mapping(_mentions(rows), n_buckets=4)
        probes = {r["probe_key"]: r["entity_id"] for r in mapping.take_all() if r["row_kind"] == "PROBE"}
        expected = {
            probe_hash("N", "M", "A"),
            probe_hash("N", "M", "B"),
            probe_hash("C", "M", "X"),
            probe_hash("C", "M", "Y"),
        }
        assert set(probes) == expected
        assert len(set(probes.values())) == 1  # mapping consistency
