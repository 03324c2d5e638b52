"""Name-blocked canonicalization (SURVEY §7.1: MinHash-LSH banding over
normalized names feeding the linking union-find, flag-gated).

Reference identity rule is EXACT normalized-name equality
(global_node_repository.py:139-158), so the flag defaults OFF and the
default path must keep producing one node per exact name key; with
name_blocking=True, alias variants ("Acme Chemical Co" / "AcmeChemicalCo.")
must collapse into one canonical cluster whose winner follows the same
min-(order, name, cas) rule as exact clusters.
"""

import pyarrow as pa
import pytest

from entity_extractor_ray.stages.linking import (
    _name_candidate_pairs,
    build_chemical_mapping,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _mentions_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "pos": pa.array([r[1] for r in rows], pa.int32()),
                "manufacturer": pa.array([r[2] for r in rows], pa.string()),
                "name": pa.array([r[3] for r in rows], pa.string()),
                "cas": pa.array([r[4] for r in rows], pa.string()),
            }
        )
    )


ALIAS_ROWS = [
    # (conv_id, pos, manufacturer, name, cas) — no shared cas, no exact
    # name equality: ONLY near-dup names connect the first two
    ("c01", 0, "Acme", "Perfluoro Octanoic Acid", ""),
    ("c02", 0, "Acme", "PerfluoroOctanoic-Acid", ""),
    ("c03", 0, "Acme", "Toluene", ""),
    # different manufacturer: never merges across blocks
    ("c04", 0, "Other", "Perfluoro Octanoic Acid", ""),
]


def _nodes(mapping_ds):
    t = mapping_ds.to_pandas()
    return t[t["row_kind"] == "NODE"]


class TestNameCandidatePairs:
    def test_alias_variants_pair(self):
        pairs = _name_candidate_pairs(
            ["Acme Chemical Co", "AcmeChemicalCo.", "Zinc Oxide"]
        )
        assert (0, 1) in pairs or (1, 0) in pairs
        flat = {i for p in pairs for i in p}
        assert 2 not in flat  # unrelated name never becomes a candidate

    def test_disjoint_names_no_pairs(self):
        assert _name_candidate_pairs(["Methanol", "Sulfuric Acid"]) == []


class TestNameBlockedMapping:
    def test_default_exact_keeps_variants_separate(self):
        nodes = _nodes(build_chemical_mapping(_mentions_ds(ALIAS_ROWS), n_buckets=4))
        acme = nodes[nodes["manufacturer"] == "Acme"]
        assert len(acme) == 3  # exact semantics: one node per distinct name

    def test_blocking_collapses_alias_variants(self):
        nodes = _nodes(
            build_chemical_mapping(
                _mentions_ds(ALIAS_ROWS), n_buckets=4, name_blocking=True
            )
        )
        acme = nodes[nodes["manufacturer"] == "Acme"]
        # the two alias variants collapse; Toluene stays its own node
        assert len(acme) == 2
        # winner = first mention in (conv, pos) order
        assert "Perfluoro Octanoic Acid" in set(acme["name"])
        assert "Toluene" in set(acme["name"])
        # other manufacturer unaffected
        other = nodes[nodes["manufacturer"] == "Other"]
        assert len(other) == 1

    def test_blocking_probe_mapping_consistent(self):
        mapping = build_chemical_mapping(
            _mentions_ds(ALIAS_ROWS), n_buckets=4, name_blocking=True
        ).to_pandas()
        probes = mapping[
            (mapping["row_kind"] == "PROBE")
        ]
        nodes = mapping[mapping["row_kind"] == "NODE"]
        acme_id = nodes[
            (nodes["manufacturer"] == "Acme")
            & (nodes["name"] == "Perfluoro Octanoic Acid")
        ]["entity_id"].iloc[0]
        # BOTH alias-name probes resolve to the single canonical entity
        acme_probe_ids = probes["entity_id"].value_counts()
        assert acme_probe_ids[acme_id] == 2

    def test_blocking_leaves_exact_merges_intact(self):
        rows = [
            ("c01", 0, "Acme", "PFOA", "335-67-1"),
            ("c02", 0, "Acme", "Perfluorooctanoic acid", "335-67-1"),
        ]
        nodes = _nodes(
            build_chemical_mapping(_mentions_ds(rows), n_buckets=4, name_blocking=True)
        )
        assert len(nodes) == 1  # shared CAS still merges exactly as before
