"""Entity linking + canonicalization (the reference's J1-J3 re-expressed).

Reference semantics (/root/reference/app/modules/artifact_ingestor/...):
  * chemical linking is a 2-tier probe per mention against a mutable DB:
    by (cas_number, manufacturer_id), falling back to (name, manufacturer_id),
    create on miss (artifact_ingestor_service.py:1027-1084; exact-name SQL at
    global_node_repository.py:65-101);
  * material identity is (replace(lower(name),' ',''), manufacturer) —
    normalized-name + manufacturer equality (global_node_repository.py:139-158);
  * manufacturer identity is exact name (manufacturer_repository find_by_name).

A parallel engine can't probe a mutable shared index row-at-a-time
(SURVEY.md §7.5), so linking is re-expressed as blocking + union-find:

  1. pre-reduce mentions to DISTINCT (manufacturer, name, cas) keys — this
     collapses hot-entity skew before any wide operation;
  2. block by manufacturer and union-find within the block: members sharing
     a non-null CAS or sharing an exact name collapse into one cluster.
     Because every observed (name, cas) pair is itself a member that unions
     its name-key with its cas-key, MAPPING CONSISTENCY is preserved: a
     mention's CAS and name always resolve to the same cluster.

     DOCUMENTED DIVERGENCE (cluster granularity): union-find is coarser than
     the reference's order-dependent two-tier probe. In a chain
     (A,X), (B,X), (B,Y) the reference — probing a mutable store in arrival
     order — keeps TWO nodes (the (B,Y) mention probes CAS Y first, misses,
     then hits name B), while union-find transitively collapses all three
     keys into ONE cluster. The engine intentionally picks the
     order-independent transitive closure: it is deterministic under any
     parallel schedule, whereas the reference's granularity depends on
     ingestion order (a (B,Y)-before-(B,X) arrival produces different nodes).
     Pinned by tests/test_linking_chains.py;
  3. the cluster winner is the member with the MINIMUM (conv_id, turn_idx)
     order key — the deterministic stand-in for the reference's
     "first-created node wins" arrival-order semantics; canonical CAS is the
     LAST mention's cas (the reference overwrites node.cas_number on every
     re-link, :1081);
  4. mentions join the (probe_key -> entity_id) mapping with a distributed
     hash join; per-entity (status, source) state is folded in order with
     the A4 transition tables (functions/decision_tables.py).

Scale note: the status fold is order-dependent but its state space is tiny
(status x source); it composes as a finite-state transition function, so a
future optimization can pre-compose per-block transition functions instead
of shipping every mention row to one group. At current scale the fold groups
are bucket-balanced via bucket_group_apply.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.decision_tables import (
    fold_chemical_mentions_total,
    normalize_name_key,
)
from ..functions.textnorm import stable_id
from .shuffle import bucket_group_apply, stable_bucket_array

MAPPING_SCHEMA = pa.schema(
    [
        ("row_kind", pa.string()),  # PROBE | NODE
        ("probe_key", pa.int64()),  # stable 63-bit hash of (tier, mfr, key)
        ("entity_id", pa.string()),
        ("name", pa.string()),
        ("cas", pa.string()),
        ("manufacturer", pa.string()),
    ]
)


def probe_hash(tier: str, mfr: str, value: str) -> int:
    """Stable 63-bit probe key. Int keys keep the broadcast lookup index
    ~10x cheaper to build per worker than long composite strings; blake2
    collision odds at 2^63 are negligible for any realistic entity count."""
    from ..functions.textnorm import stable_hash64

    return stable_hash64(tier + "\x1f" + mfr + "\x1f" + value) >> 1

CHEM_NODE_STATE_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("pfas_status", pa.string()),
        ("pfas_information_source", pa.string()),
        ("n_mentions", pa.int64()),
        # errors side-channel: count of impossible (source, source) transitions
        # that were skipped during the fold (the reference RAISES and aborts
        # the document, artifact_ingestor_service.py:1244-1248; the engine
        # holds the existing state and reports the coercion)
        ("n_coerced", pa.int64()),
    ]
)


def order_key_array(batch: pa.Table) -> pa.Array:
    """Sortable string key '<conv_id>|<turn_idx zero-padded>' — the engine's
    deterministic replacement for the reference's arrival order."""
    turn = pc.cast(batch.column("turn_idx"), pa.string())
    padded = pc.utf8_lpad(turn, 8, "0")
    return pc.binary_join_element_wise(batch.column("conv_id"), padded, "|")


def chem_link_keys(batch: pa.Table) -> pa.Table:
    """chem mention rows -> (manufacturer, name, cas ["" if null], order_key)."""
    cas = pc.fill_null(batch.column("cas"), "")
    return pa.table(
        {
            "manufacturer": batch.column("manufacturer"),
            "name": batch.column("name"),
            "cas": cas,
            "order_key": order_key_array(batch),
        }
    )


def _union_find_bucket(df: pd.DataFrame, bucket_id: int) -> pa.Table:
    """One hash bucket of manufacturers; per manufacturer, union-find over the
    distinct (name, cas) members. df columns: manufacturer, name, cas,
    min_order, max_order."""
    out: Dict[str, List] = {n: [] for n in MAPPING_SCHEMA.names}

    def emit(kind, probe, entity, name=None, cas=None, mfr=None):
        out["row_kind"].append(kind)
        out["probe_key"].append(probe)
        out["entity_id"].append(entity)
        out["name"].append(name)
        out["cas"].append(cas)
        out["manufacturer"].append(mfr)

    # merge per-batch partials: same (mfr, name, cas) key from different
    # batches folds to global min/max order
    df = (
        df.groupby(["manufacturer", "name", "cas"], sort=False)
        .agg(min_order=("min_order", "min"), max_order=("max_order", "max"))
        .reset_index()
    )

    # FAST PATH: a cluster of size >= 2 requires a shared name or shared
    # non-empty cas within the manufacturer, so keys involved in neither
    # duplication are singleton clusters — emit them without union-find.
    dup_name = df.duplicated(["manufacturer", "name"], keep=False)
    cas_nonempty = df["cas"] != ""
    dup_cas = cas_nonempty & df.duplicated(["manufacturer", "cas"], keep=False)
    involved = dup_name | dup_cas
    singles = df[~involved]
    if not singles.empty:
        s_mfr = singles["manufacturer"].to_numpy()
        s_name = singles["name"].to_numpy()
        s_cas = singles["cas"].to_numpy()
        for i in range(len(s_mfr)):
            entity_id = stable_id("CHEMICAL", s_mfr[i], s_name[i])
            emit("NODE", None, entity_id, s_name[i], s_cas[i] or None, s_mfr[i])
            emit("PROBE", probe_hash("N", s_mfr[i], s_name[i]), entity_id)
            if s_cas[i]:
                emit("PROBE", probe_hash("C", s_mfr[i], s_cas[i]), entity_id)
    df = df[involved]

    for mfr, g in df.groupby("manufacturer", sort=False):
        names = g["name"].to_numpy()
        cass = g["cas"].to_numpy()
        min_orders = g["min_order"].to_numpy()
        max_orders = g["max_order"].to_numpy()
        n = len(names)
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra

        by_name: Dict[str, int] = {}
        by_cas: Dict[str, int] = {}
        for i in range(n):
            if names[i] in by_name:
                union(by_name[names[i]], i)
            else:
                by_name[names[i]] = i
            if cass[i]:
                if cass[i] in by_cas:
                    union(by_cas[cass[i]], i)
                else:
                    by_cas[cass[i]] = i

        clusters: Dict[int, List[int]] = {}
        for i in range(n):
            clusters.setdefault(find(i), []).append(i)

        for members in clusters.values():
            winner = min(members, key=lambda i: min_orders[i])
            last = max(members, key=lambda i: max_orders[i])
            entity_id = stable_id("CHEMICAL", mfr, names[winner])
            canon_cas = cass[last] if cass[last] else None
            emit("NODE", None, entity_id, names[winner], canon_cas, mfr)
            seen_probes = set()
            for i in members:
                nk = probe_hash("N", mfr, names[i])
                if nk not in seen_probes:
                    seen_probes.add(nk)
                    emit("PROBE", nk, entity_id)
                if cass[i]:
                    ck = probe_hash("C", mfr, cass[i])
                    if ck not in seen_probes:
                        seen_probes.add(ck)
                        emit("PROBE", ck, entity_id)

    return pa.table(
        {name: pa.array(out[name], MAPPING_SCHEMA.field(name).type) for name in MAPPING_SCHEMA.names},
        schema=MAPPING_SCHEMA,
    )


def _local_distinct_keys(batch: pa.Table) -> pa.Table:
    """Map-side combiner: per-batch (manufacturer, name, cas) distinct with
    min/max order fold — hot entities collapse to one row per batch BEFORE
    the shuffle, so skew never amplifies exchange volume."""
    df = batch.to_pandas()
    agg = (
        df.groupby(["manufacturer", "name", "cas"], sort=False)["order_key"]
        .agg(["min", "max"])
        .reset_index()
    )
    return pa.table(
        {
            "manufacturer": pa.array(agg["manufacturer"], pa.string()),
            "name": pa.array(agg["name"], pa.string()),
            "cas": pa.array(agg["cas"], pa.string()),
            "min_order": pa.array(agg["min"], pa.string()),
            "max_order": pa.array(agg["max"], pa.string()),
        }
    )


def build_chemical_mapping(chem_mentions_ds, n_buckets: int = 64):
    """chem mention rows -> union-find mapping table (MAPPING_SCHEMA).

    Shuffle profile: map-side combine to per-batch distinct keys, then ONE
    bucket shuffle keyed on manufacturer; cross-batch duplicates merge
    in-bucket before union-find."""
    keys = chem_mentions_ds.map_batches(chem_link_keys, batch_format="pyarrow")
    partial = keys.map_batches(_local_distinct_keys, batch_format="pyarrow")
    return bucket_group_apply(partial, ["manufacturer"], _union_find_bucket, n_buckets)


def add_probe_and_material_keys(batch: pa.Table) -> pa.Table:
    """Per chem-mention row: the 2-tier probe key (CAS first, else name) plus
    the deterministic material/manufacturer entity ids (computable without a
    join: material id = hash(MATERIAL, norm_name, manufacturer) per J1;
    manufacturer id = hash(MANUFACTURER, name) per J3)."""
    mfr = batch.column("manufacturer").to_pylist()
    name = batch.column("name").to_pylist()
    cas = batch.column("cas").to_pylist()
    mat = batch.column("material_name").to_pylist()
    n = batch.num_rows
    probe = [
        probe_hash("C", mfr[i], cas[i]) if cas[i] else probe_hash("N", mfr[i], name[i])
        for i in range(n)
    ]
    mat_ids = [stable_id("MATERIAL", normalize_name_key(mat[i]), mfr[i]) for i in range(n)]
    mfr_ids = [stable_id("MANUFACTURER", mfr[i]) for i in range(n)]
    t = batch.append_column("probe_key", pa.array(probe, pa.int64()))
    t = t.append_column("material_id", pa.array(mat_ids, pa.string()))
    t = t.append_column("manufacturer_id", pa.array(mfr_ids, pa.string()))
    return t.append_column("order_key", order_key_array(batch))


def link_chem_mentions(chem_mentions_ds, mapping_ds, num_partitions: int = 16):
    """Distributed hash join: mention probe_key -> canonical entity_id.
    Task-based bucket join (see shuffle.bucket_hash_join) — no per-join actor
    pool; probe keys are pre-hashed uniform so no salting needed."""
    from .shuffle import lookup_join

    probes = chem_mentions_ds.map_batches(add_probe_and_material_keys, batch_format="pyarrow")
    probe_map = (
        mapping_ds.filter(expr="row_kind == 'PROBE'")
        .select_columns(["probe_key", "entity_id"])
    )
    return lookup_join(probes, probe_map, key="probe_key",
                       n_buckets=num_partitions)


def _fold_bucket(df: pd.DataFrame, bucket_id: int) -> pa.Table:
    """Per-entity ordered fold of (tag, source) mention streams into the
    final (status, source) — fold_chemical_mentions over (conv, turn) order."""
    df = df.sort_values("order_key", kind="mergesort")
    ids, statuses, sources, counts, coerced = [], [], [], [], []
    for entity_id, g in df.groupby("entity_id", sort=False):
        status, source, n_coerced = fold_chemical_mentions_total(
            list(zip(g["tag"].to_numpy(), g["source"].to_numpy()))
        )
        ids.append(entity_id)
        statuses.append(status)
        sources.append(source)
        counts.append(len(g))
        coerced.append(n_coerced)
    return pa.table(
        {
            "entity_id": pa.array(ids, pa.string()),
            "pfas_status": pa.array(statuses, pa.string()),
            "pfas_information_source": pa.array(sources, pa.string()),
            "n_mentions": pa.array(counts, pa.int64()),
            "n_coerced": pa.array(coerced, pa.int64()),
        },
        schema=CHEM_NODE_STATE_SCHEMA,
    )


def fold_chemical_states(linked_ds, n_buckets: int = 64):
    """linked mention rows -> per-entity folded (status, source)."""
    slim = linked_ds.select_columns(["entity_id", "order_key", "tag", "source"])
    return bucket_group_apply(slim, ["entity_id"], _fold_bucket, n_buckets)
