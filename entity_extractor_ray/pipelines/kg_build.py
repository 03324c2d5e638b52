"""The flagship pipeline: transcript turns -> knowledge graph.

Logical DAG (SURVEY.md §7.1), all Ray Data:

    read_parquet(turns: conv_id, turn_idx, role, text, tool, ts)
      -> map_batches(RecordExtractor)            [vectorized RE2, stateless]
      -> assemble_records                        [groupby conv bucket]
      -> explode triples / chem mentions         [map_batches]
      -> build_chemical_mapping                  [distinct-key groupby + union-find]
      -> link_chem_mentions                      [hash join on probe_key]
      -> fold_chemical_states                    [bucketed ordered fold]
      -> material identities / edges / rollup    [pre-aggregated groupbys]
      -> nodes / edges / lineage / metrics       [checkpointed Parquet sinks]

Every stage output is checkpointed via CheckpointManager when ``out_dir`` is
given (resume skips completed stages); in-memory mode (out_dir=None)
materializes the small intermediate tables instead, for tests.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import pyarrow as pa

from ..stages.assemble import assemble_records, dedup_records
from ..stages.extract import RecordExtractor
from ..stages.graph import (
    assemble_nodes,
    dedup_contains_edges,
    dedup_made_by_edges,
    distinct_manufacturers,
    build_material_identities,
    lineage_rows,
    rollup_status,
)
from ..stages.linking import (
    build_chemical_mapping,
    fold_chemical_states,
    link_chem_mentions,
)
from ..stages.triples import explode_chem_mentions, explode_triples
from ..state.checkpoint import CheckpointManager

METRICS_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("stage", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("matched_count", pa.int64()),
        ("duration_ms", pa.float64()),
    ]
)


@dataclasses.dataclass
class KGResult:
    triples: "ray.data.Dataset"  # noqa: F821
    nodes: "ray.data.Dataset"  # noqa: F821
    edges: "ray.data.Dataset"  # noqa: F821
    lineage: "ray.data.Dataset"  # noqa: F821
    metrics: List[dict]


def _read_turns(turns, columns):
    import ray.data as rd

    if isinstance(turns, (str, list)):
        return rd.read_parquet(turns, columns=columns)
    return turns.select_columns(columns)


def build_kg(
    turns,
    out_dir: Optional[str] = None,
    n_buckets: int = 32,
    num_join_partitions: int = 16,
    extract_concurrency: Optional[int] = None,
    batch_size: int = 8192,
) -> KGResult:
    """Run the full KG build.

    turns: parquet path(s) or a ray.data.Dataset with the input_hint schema.
    out_dir: when set, every stage checkpoints to ``out_dir/<stage>/`` and a
      rerun skips completed stages (stage-level resume).
    n_buckets: hash-bucket count for the wide stages — scale with cluster
      size (rule of thumb: 2-4x total cores).
    """
    ckpt = CheckpointManager(
        out_dir, params_fingerprint=f"b{n_buckets}"
    ) if out_dir else None
    metrics: List[dict] = []

    def stage(name, build):
        t0 = time.perf_counter()
        if ckpt is not None:
            ds = ckpt.run(name, build)
        else:
            ds = build().materialize()
        metrics.append(
            {
                "partition_id": -1,
                "stage": name,
                "rows_in": -1,
                "rows_out": ds.count() if ckpt is None else ckpt.manifest(name)["rows"],
                "matched_count": -1,
                "duration_ms": (time.perf_counter() - t0) * 1000,
            }
        )
        return ds

    turns_ds = _read_turns(turns, ["conv_id", "turn_idx", "text"])

    if extract_concurrency is None:
        import ray

        # actor pool sized to leave headroom for the read / shuffle stages
        total_cpus = int(ray.cluster_resources().get("CPU", 8))
        extract_concurrency = max(2, (total_cpus * 3) // 4)

    extraction = turns_ds.map_batches(
        RecordExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=extract_concurrency,
    )
    records_all = stage("records", lambda: assemble_records(extraction, n_buckets))
    if records_all.count() == 0:
        # degenerate corpus (no extractable conversations): short-circuit with
        # empty-but-schema-stable outputs — joins downstream would otherwise
        # fail on schema-less empty datasets.
        import ray.data as rd

        from ..stages.graph import EDGES_SCHEMA, LINEAGE_SCHEMA, NODES_SCHEMA
        from ..stages.triples import TRIPLES_SCHEMA

        return KGResult(
            triples=rd.from_arrow(TRIPLES_SCHEMA.empty_table()),
            nodes=rd.from_arrow(NODES_SCHEMA.empty_table()),
            edges=rd.from_arrow(EDGES_SCHEMA.empty_table()),
            lineage=rd.from_arrow(LINEAGE_SCHEMA.empty_table()),
            metrics=metrics,
        )
    # J1 anti-join guard: only the first conversation per material identity
    # survives (reference drops duplicate-material documents wholesale).
    records = stage("records_dedup", lambda: dedup_records(records_all, n_buckets))

    triples = stage(
        "triples",
        lambda: records.map_batches(explode_triples, batch_format="pyarrow"),
    )
    chem_mentions = stage(
        "chem_mentions",
        lambda: records.map_batches(explode_chem_mentions, batch_format="pyarrow"),
    )
    mapping = stage(
        "chem_mapping", lambda: build_chemical_mapping(chem_mentions, n_buckets)
    )
    linked = stage(
        "linked",
        lambda: link_chem_mentions(chem_mentions, mapping, num_join_partitions),
    )
    chem_status = stage(
        "chem_status", lambda: fold_chemical_states(linked, n_buckets)
    )
    material_ids = stage(
        "material_ids", lambda: build_material_identities(records, n_buckets)
    )
    contains_edges = stage(
        "edges_contains", lambda: dedup_contains_edges(linked, n_buckets)
    )
    made_by_edges = stage("edges_made_by", lambda: dedup_made_by_edges(records))
    edges = stage("edges", lambda: contains_edges.union(made_by_edges))

    material_status = stage(
        "material_status",
        lambda: rollup_status(edges, chem_status, n_buckets, num_join_partitions),
    )
    manufacturers = stage("manufacturers", lambda: distinct_manufacturers(records))
    nodes = stage(
        "nodes",
        lambda: assemble_nodes(
            material_ids, material_status, mapping, chem_status, manufacturers,
            num_join_partitions,
        ),
    )
    lineage = stage(
        "lineage",
        lambda: linked.map_batches(
            lineage_rows, fn_kwargs={"n_buckets": n_buckets}, batch_format="pyarrow"
        ),
    )

    if ckpt is not None:
        metrics_out = [
            dict(m, partition_id=-1, rows_in=-1, matched_count=-1)
            for m in (
                {
                    "stage": sm["stage"],
                    "rows_out": sm["rows_out"],
                    "duration_ms": sm["duration_ms"],
                }
                for sm in ckpt.stage_metrics
            )
        ]
    else:
        metrics_out = metrics

    return KGResult(
        triples=triples, nodes=nodes, edges=edges, lineage=lineage, metrics=metrics_out
    )
