"""Fixed-point rollup over a 3-level hierarchy (deeper than the reference's
2-level MATERIAL->CHEMICAL graph — A5 generality)."""

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_three_level_propagation():
    import ray.data as rd

    from entity_extractor_ray.stages.graph import rollup_fixed_point, rollup_status

    # A -> B -> C(leaf YES), B -> D(leaf NO), A -> E(leaf NO)
    edges = rd.from_arrow(
        pa.table(
            {
                "src": ["A", "B", "B", "A"],
                "dst": ["B", "C", "D", "E"],
                "pred": ["CONTAINS"] * 4,
                "weight": [None] * 4,
            }
        )
    )
    leaves = rd.from_arrow(
        pa.table(
            {
                "entity_id": ["C", "D", "E"],
                "pfas_status": ["YES", "NO", "NO"],
                "pfas_information_source": ["OECD", "VAI", "VAI"],
            }
        )
    )

    # single pass only resolves B (its children are leaves); A sees only E
    one = {r["entity_id"]: r["pfas_status"]
           for r in rollup_status(edges, leaves, 4, 2).take_all()}
    assert one["B"] == "YES"
    assert one["A"] == "NO"  # B not yet rolled when A was computed

    # fixed point propagates C's YES through B up to A
    final = {r["entity_id"]: (r["pfas_status"], r["pfas_information_source"])
             for r in rollup_fixed_point(edges, leaves, 4, 2).take_all()}
    assert final["B"][0] == "YES"
    assert final["A"][0] == "YES"
