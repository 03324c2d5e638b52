"""Graph materialization + status rollup.

Produces the FIXTURES.md F2 golden tables:
  nodes (entity_id, name, node_type, cas_number, pfas_status,
         pfas_information_source)
  edges (src, dst, pred, weight) — exact-dedup on (src, dst, pred),
         last-weight-wins (reference J4 edge upsert,
         artifact_ingestor_service.py:1086-1106)
  lineage (entity_id, conv_id, turn_idx, extractor, partition_id)

Status rollup (A2/A3/A5): the reference recomputes every parent material's
PFAS resolution from its child chemicals after each write
(update_the_material_based_on_chemical_status_and_source,
artifact_ingestor_service.py:1259-1282, propagation loop :1131-1144). Here it
is one grouped aggregate: because parent_pfas_resolution depends only on the
MULTISET of child (status, source) pairs, we pre-count per
(parent, status, source) — an associative, skew-proof reduction — and resolve
each parent from its <=15 count rows. The reference hierarchy is depth-2
(MATERIAL -> CHEMICAL) so one pass reaches the fixed point; `rollup_status`
exposes the single pass and callers may iterate for deeper graphs.
"""

from __future__ import annotations

from typing import Dict, List

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.decision_tables import (
    NODE_CHEMICAL,
    NODE_MANUFACTURER,
    NODE_MATERIAL,
    SRC_NONE,
    parent_pfas_resolution,
)
from ..functions.textnorm import stable_id
from .linking import order_key_array
from .shuffle import bucket_group_apply, stable_bucket_array

NODES_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("name", pa.string()),
        ("node_type", pa.string()),
        ("cas_number", pa.string()),
        ("pfas_status", pa.string()),
        ("pfas_information_source", pa.string()),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("pred", pa.string()),
        ("weight", pa.string()),
    ]
)

LINEAGE_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("extractor", pa.string()),
        ("partition_id", pa.int32()),
    ]
)


# ------------------------------------------------------------------ materials

def material_key_rows(batch: pa.Table) -> pa.Table:
    """records -> (material_id, name, manufacturer, order_key) candidate rows."""
    from ..functions.decision_tables import normalize_name_key

    mat = batch.column("material_name").to_pylist()
    mfr = batch.column("manufacturer").to_pylist()
    ids = [
        stable_id("MATERIAL", normalize_name_key(m), f) for m, f in zip(mat, mfr)
    ]
    return pa.table(
        {
            "material_id": pa.array(ids, pa.string()),
            "name": batch.column("material_name"),
            "manufacturer": batch.column("manufacturer"),
            "order_key": order_key_array(batch),
        }
    )


def _material_pick_first(df: pd.DataFrame, bucket_id: int) -> pa.Table:
    """Per material_id keep the display name of the FIRST mention (the
    deterministic stand-in for the reference's first-created-node-wins)."""
    df = df.sort_values("min_order", kind="mergesort")
    firsts = df.drop_duplicates("material_id", keep="first")
    return pa.table(
        {
            "material_id": pa.array(firsts["material_id"].tolist(), pa.string()),
            "name": pa.array(firsts["name"].tolist(), pa.string()),
            "manufacturer": pa.array(firsts["manufacturer"].tolist(), pa.string()),
        }
    )


def build_material_identities(records_ds, n_buckets: int = 64):
    """records -> one row per canonical material (material_id, name, manufacturer)."""
    from ray.data.aggregate import Min

    rows = records_ds.map_batches(material_key_rows, batch_format="pyarrow")
    distinct = rows.groupby(["material_id", "name", "manufacturer"]).aggregate(
        Min("order_key", alias_name="min_order")
    )
    return bucket_group_apply(distinct, ["material_id"], _material_pick_first, n_buckets)


# ------------------------------------------------------------------ edges

def contains_edge_rows(linked_batch: pa.Table) -> pa.Table:
    """linked chem mentions -> CONTAINS edge candidates."""
    return pa.table(
        {
            "src": linked_batch.column("material_id"),
            "dst": linked_batch.column("entity_id"),
            "pred": pa.array(["CONTAINS"] * linked_batch.num_rows, pa.string()),
            "weight": linked_batch.column("composition"),
            "order_key": linked_batch.column("order_key"),
        }
    )


def _edge_pick_last(df: pd.DataFrame, bucket_id: int) -> pa.Table:
    """J4 upsert: per (src, dst, pred) the LAST-processed weight wins."""
    df = df.sort_values("max_order", kind="mergesort")
    lasts = df.drop_duplicates(["src", "dst", "pred"], keep="last")
    return pa.table(
        {
            "src": pa.array(lasts["src"].tolist(), pa.string()),
            "dst": pa.array(lasts["dst"].tolist(), pa.string()),
            "pred": pa.array(lasts["pred"].tolist(), pa.string()),
            "weight": pa.array(
                [None if pd.isna(w) else w for w in lasts["weight"].tolist()], pa.string()
            ),
        },
        schema=EDGES_SCHEMA,
    )


def dedup_contains_edges(linked_ds, n_buckets: int = 64):
    from ray.data.aggregate import Max

    cand = linked_ds.map_batches(contains_edge_rows, batch_format="pyarrow")
    distinct = cand.groupby(["src", "dst", "pred", "weight"]).aggregate(
        Max("order_key", alias_name="max_order")
    )
    return bucket_group_apply(distinct, ["src", "dst"], _edge_pick_last, n_buckets)


def made_by_edge_rows(records_batch: pa.Table) -> pa.Table:
    from ..functions.decision_tables import normalize_name_key

    mat = records_batch.column("material_name").to_pylist()
    mfr = records_batch.column("manufacturer").to_pylist()
    src = [stable_id("MATERIAL", normalize_name_key(m), f) for m, f in zip(mat, mfr)]
    dst = [stable_id("MANUFACTURER", f) for f in mfr]
    n = records_batch.num_rows
    return pa.table(
        {
            "src": pa.array(src, pa.string()),
            "dst": pa.array(dst, pa.string()),
            "pred": pa.array(["MADE_BY"] * n, pa.string()),
            "weight": pa.nulls(n, pa.string()),
        },
        schema=EDGES_SCHEMA,
    )


def dedup_made_by_edges(records_ds):
    """Distinct (src, dst) MADE_BY edges — weightless, so a plain groupby-count
    reduction (no argmax needed)."""
    cand = records_ds.map_batches(made_by_edge_rows, batch_format="pyarrow")
    distinct = cand.groupby(["src", "dst", "pred"]).count()
    return distinct.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "pred": t.column("pred"),
                "weight": pa.nulls(t.num_rows, pa.string()),
            },
            schema=EDGES_SCHEMA,
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------------ rollup

def _resolve_bucket(df: pd.DataFrame, bucket_id: int) -> pa.Table:
    """One hash bucket of (src, child status, child source) edge rows:
    per parent apply the reference lattice + source vote directly. The
    multiset reduction (value_counts) happens HERE, in-bucket — one
    int-keyed shuffle total, no separate grouped count."""
    ids, statuses, sources = [], [], []
    df = df.sort_values("src", kind="mergesort")
    src_arr = df["src"].to_numpy()
    st_arr = df["pfas_status"].to_numpy()
    so_arr = df["pfas_information_source"].to_numpy()
    n = len(src_arr)
    bounds = [0] + [i for i in range(1, n) if src_arr[i] != src_arr[i - 1]] + [n]
    for bi in range(len(bounds) - 1):
        lo, hi = bounds[bi], bounds[bi + 1]
        status, source = parent_pfas_resolution(
            list(zip(st_arr[lo:hi], so_arr[lo:hi]))
        )
        ids.append(src_arr[lo])
        statuses.append(status)
        sources.append(source if source is not None else SRC_NONE)
    return pa.table(
        {
            "entity_id": pa.array(ids, pa.string()),
            "pfas_status": pa.array(statuses, pa.string()),
            "pfas_information_source": pa.array(sources, pa.string()),
        }
    )


def rollup_status(edges_ds, child_status_ds, n_buckets: int = 64, num_partitions: int = 16):
    """One rollup pass: parent status from child (status, source) multisets.

    edges_ds: (src, dst, pred) with pred == CONTAINS rows used;
    child_status_ds: (entity_id, pfas_status, pfas_information_source).
    Returns (entity_id, pfas_status, pfas_information_source) for parents.
    """
    from .shuffle import lookup_join

    contains = edges_ds.filter(expr="pred == 'CONTAINS'").select_columns(["src", "dst"])
    child = child_status_ds.select_columns(
        ["entity_id", "pfas_status", "pfas_information_source"]
    )
    joined = lookup_join(contains, child, key="dst", right_key="entity_id",
                         n_buckets=num_partitions)
    # NB children-per-parent is bounded (distinct chemicals of one material),
    # so shipping the joined edge rows directly into the per-parent bucket is
    # skew-safe; a grouped pre-count would only matter for pathological
    # fan-outs and costs an extra multi-string-key shuffle.
    slim = joined.select_columns(["src", "pfas_status", "pfas_information_source"])
    return bucket_group_apply(slim, ["src"], _resolve_bucket, n_buckets)


# ------------------------------------------------------------------ nodes

def assemble_nodes(material_ids_ds, material_status_ds, chem_mapping_ds, chem_status_ds,
                   manufacturer_ds, num_partitions: int = 16):
    """Final nodes table: materials (identity ⋈ rolled-up status), chemicals
    (union-find NODE rows ⋈ folded status), manufacturers (no PFAS fields —
    the reference Manufacturer ORM has none, models/manufacturer.py:6-18)."""
    from .shuffle import lookup_join

    mat = lookup_join(
        material_ids_ds, material_status_ds, key="material_id",
        right_key="entity_id", how="left", n_buckets=num_partitions,
    )

    def mat_nodes(t: pa.Table) -> pa.Table:
        n = t.num_rows
        status = pc.fill_null(t.column("pfas_status"), "PENDING")
        source = pc.fill_null(t.column("pfas_information_source"), SRC_NONE)
        return pa.table(
            {
                "entity_id": t.column("material_id"),
                "name": t.column("name"),
                "node_type": pa.array([NODE_MATERIAL] * n, pa.string()),
                "cas_number": pa.nulls(n, pa.string()),
                "pfas_status": status,
                "pfas_information_source": source,
            },
            schema=NODES_SCHEMA,
        )

    mat_nodes_ds = mat.map_batches(mat_nodes, batch_format="pyarrow")

    chem_base = chem_mapping_ds.filter(expr="row_kind == 'NODE'").select_columns(
        ["entity_id", "name", "cas"]
    )
    chem = lookup_join(
        chem_base,
        chem_status_ds.select_columns(["entity_id", "pfas_status", "pfas_information_source"]),
        key="entity_id",
        n_buckets=num_partitions,
    )

    def chem_nodes(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "entity_id": t.column("entity_id"),
                "name": t.column("name"),
                "node_type": pa.array([NODE_CHEMICAL] * n, pa.string()),
                "cas_number": t.column("cas"),
                "pfas_status": t.column("pfas_status"),
                "pfas_information_source": t.column("pfas_information_source"),
            },
            schema=NODES_SCHEMA,
        )

    chem_nodes_ds = chem.map_batches(chem_nodes, batch_format="pyarrow")

    def mfr_nodes(t: pa.Table) -> pa.Table:
        names = t.column("manufacturer").to_pylist()
        ids = [stable_id("MANUFACTURER", f) for f in names]
        n = t.num_rows
        return pa.table(
            {
                "entity_id": pa.array(ids, pa.string()),
                "name": pa.array(names, pa.string()),
                "node_type": pa.array([NODE_MANUFACTURER] * n, pa.string()),
                "cas_number": pa.nulls(n, pa.string()),
                "pfas_status": pa.nulls(n, pa.string()),
                "pfas_information_source": pa.array([SRC_NONE] * n, pa.string()),
            },
            schema=NODES_SCHEMA,
        )

    mfr_nodes_ds = manufacturer_ds.map_batches(mfr_nodes, batch_format="pyarrow")
    return mat_nodes_ds.union(chem_nodes_ds).union(mfr_nodes_ds)


def distinct_manufacturers(records_ds):
    return records_ds.groupby("manufacturer").count().select_columns(["manufacturer"])


# ------------------------------------------------------------------ lineage

def lineage_rows(linked_batch: pa.Table, n_buckets: int = 64) -> pa.Table:
    """linked chem mentions -> lineage rows for chemical + material entities."""
    ids = linked_batch.column("entity_id").to_pylist()
    mat_ids = linked_batch.column("material_id").to_pylist()
    conv = linked_batch.column("conv_id").to_pylist()
    turn = linked_batch.column("turn_idx").to_pylist()
    part = stable_bucket_array(linked_batch, ["entity_id"], n_buckets)
    part_mat = stable_bucket_array(linked_batch, ["material_id"], n_buckets)
    n = linked_batch.num_rows
    return pa.table(
        {
            "entity_id": pa.array(ids + mat_ids, pa.string()),
            "conv_id": pa.array(conv + conv, pa.string()),
            "turn_idx": pa.array(turn + turn, pa.int32()),
            "extractor": pa.array(
                ["chemical_linker"] * n + ["material_linker"] * n, pa.string()
            ),
            "partition_id": pa.array(
                list(part.astype("int32")) + list(part_mat.astype("int32")), pa.int32()
            ),
        },
        schema=LINEAGE_SCHEMA,
    )
