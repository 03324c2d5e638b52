"""Serial reference-semantics oracle.

A deliberately SLOW, row-at-a-time, mutable-store re-implementation of the
reference's ingest path (artifact_ingestor_service.py save_msds flow), used
only by tests to validate the distributed engine:

  * conversations processed in ascending (conv_id) order — the deterministic
    stand-in for the reference's queue arrival order;
  * the same extraction rules as stages/extract.py, run with plain `re`;
  * a dict-backed global store probed row-at-a-time exactly like the
    reference's MySQL repositories (J1-J3), including the
    MATERIAL_ALREADY_INGESTED guard dropping whole conversations;
  * A1 chemical dedup, A2/A3 rollup, A4 transition fold, A5 propagation
    after every chemical write.

Divergences from the reference, shared with the engine (SURVEY.md §7.5):
  * the impossible-transition raise is replaced by the total extension in
    functions/decision_tables.final_source (a raise would abort a whole
    conversation nondeterministically under parallelism);
  * find_materials_by_chemical_id uses the INTENDED semantics (parents of
    the chemical), not the reference's copy-paste bug that returns children.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from .functions.decision_tables import (
    combine_material_name,
    fold_chemical_state_total,
    normalize_name_key,
    normalize_cas,
    parent_pfas_resolution,
    pfas_status_from_tag,
)
from .functions.textnorm import stable_id
from .stages.extract import (
    CHEMICAL_PATTERN,
    GEO_FIELDS,
    MATERIAL_PATTERN,
    PRODUCT_PATTERN,
    SUPPLIER_PATTERN,
    UPC_PATTERN,
)

_MAT_RE = re.compile(MATERIAL_PATTERN)
_PROD_RE = re.compile(PRODUCT_PATTERN)
_UPC_RE = re.compile(UPC_PATTERN)
_CHEM_RE = re.compile(CHEMICAL_PATTERN)
_SUPPLIER_RE = re.compile(SUPPLIER_PATTERN)


class OracleStore:
    def __init__(self):
        self.manufacturers: Dict[str, dict] = {}  # name -> node
        self.materials: Dict[Tuple[str, str], dict] = {}  # (norm_name, mfr) -> node
        # chemicals are per-manufacturer, probed by cas then exact name
        self.chem_by_cas: Dict[Tuple[str, str], dict] = {}
        self.chem_by_name: Dict[Tuple[str, str], dict] = {}
        self.chem_nodes: List[dict] = []
        self.edges: Dict[Tuple[str, str, str], Optional[str]] = {}  # (src,dst,pred)->weight
        self.triples: List[tuple] = []
        self.lineage: List[tuple] = []
        # errors side-channel (run-state FAILED rows of the reference):
        # (stage, key, reason) — assemble drops, J1 duplicate drops,
        # impossible-transition coercions
        self.errors: List[tuple] = []


def extract_record(turns: List[Tuple[int, str]]) -> Optional[dict]:
    """turns: [(turn_idx, text)] sorted. Returns the MSDSAnalysis-like record
    or None when the conversation has no material / no chemicals."""
    material = None
    mfr = None
    mat_turn = None
    product_no = None
    upc = None
    geo = None
    chems: List[dict] = []
    for tidx, text in turns:
        if not text:
            continue
        if material is None:
            m = _MAT_RE.search(text)
            if m:
                material, mfr, mat_turn = m.group("material"), m.group("manufacturer"), tidx
        if geo is None:
            m = _SUPPLIER_RE.search(text)
            if m:
                geo = {f: m.group(f) for f in GEO_FIELDS}
        if product_no is None:
            m = _PROD_RE.search(text)
            if m:
                product_no = m.group("product_no")
        if upc is None:
            m = _UPC_RE.search(text)
            if m:
                upc = m.group("upc")
        # ALL chemical sentences of a turn count (finditer, not search):
        # the reference's LLM extraction returns every chemical on the page
        # (artifact_ingestor_service.py:798-802 expects a LIST), so a turn
        # carrying two chemical sentences contributes two mentions
        for m in _CHEM_RE.finditer(text):
            chems.append(
                {
                    "chemical_name": m.group("name"),
                    "cas": m.group("cas"),  # None when absent
                    "composition": m.group("pct"),
                    "tag": m.group("tag"),
                    "source": m.group("source"),
                    "turn_idx": tidx,
                }
            )
    if material is None or not chems:
        # classify the drop for the errors channel — but only when the
        # conversation produced ANY extraction signal (pure-filler
        # conversations are not failed documents, they are non-documents)
        found_any = (
            material is not None or product_no is not None
            or upc is not None or bool(chems)
        )
        if not found_any:
            return None
        return {"__drop_reason": "EMPTY_MATERIAL" if material is None else "EMPTY_CHEMICALS"}
    # A1 dedup: dict keyed on chemical_name — first-key order, last value wins
    dedup = {c["chemical_name"]: c for c in chems}
    return {
        "material_name": combine_material_name(material, product_no, upc),
        "manufacturer": mfr,
        "turn_idx": mat_turn,
        "geo": geo,  # None when the conversation carried no supplier turn
        "chemicals": list(dedup.values()),
    }


def ingest(store: OracleStore, conv_id: str, record: dict) -> None:
    mat_name = record["material_name"]
    mfr_name = record["manufacturer"]
    mat_key = (normalize_name_key(mat_name), mfr_name)

    # J1 anti-join guard: duplicate material -> whole conversation dropped
    if mat_key in store.materials:
        store.errors.append(("dedup", conv_id, "MATERIAL_ALREADY_INGESTED"))
        return

    # J3 manufacturer link-or-create (exact name). The CREATING record's geo
    # is kept forever — save_manufacturer never updates an existing row
    # (artifact_ingestor_service.py:992-1008), so a later record with
    # different/better geo changes nothing.
    if mfr_name not in store.manufacturers:
        geo = record.get("geo") or {}
        store.manufacturers[mfr_name] = {
            "entity_id": stable_id("MANUFACTURER", mfr_name),
            "name": mfr_name,
            **{f: geo.get(f) for f in GEO_FIELDS},
        }
    mfr_id = store.manufacturers[mfr_name]["entity_id"]

    material = {
        "entity_id": stable_id("MATERIAL", mat_key[0], mfr_name),
        "name": mat_name,
        "node_type": "MATERIAL",
        "cas_number": None,
        "pfas_status": "PENDING",
        "pfas_information_source": "NONE",
        "manufacturer": mfr_name,
    }
    store.materials[mat_key] = material
    store.edges[(material["entity_id"], mfr_id, "MADE_BY")] = None

    # triples (surface level)
    store.triples.append((conv_id, mat_name, "MADE_BY", mfr_name))

    for chem in record["chemicals"]:
        cas = normalize_cas(chem["cas"])
        name = chem["chemical_name"]
        store.triples.append((conv_id, mat_name, "CONTAINS", name))
        if cas:
            store.triples.append((conv_id, name, "HAS_CAS", cas))
        store.triples.append((conv_id, name, "HAS_TAG", chem["tag"]))

        # J2 two-tier probe
        node = None
        if cas and (mfr_name, cas) in store.chem_by_cas:
            node = store.chem_by_cas[(mfr_name, cas)]
        if node is None:
            node = store.chem_by_name.get((mfr_name, name))
        if node is None:
            node = {
                "entity_id": stable_id("CHEMICAL", mfr_name, name),
                "name": name,
                "node_type": "CHEMICAL",
                "cas_number": cas,
                "pfas_status": pfas_status_from_tag(chem["tag"]),
                "pfas_information_source": chem["source"],
                "manufacturer": mfr_name,
            }
            store.chem_nodes.append(node)
            store.chem_by_name[(mfr_name, name)] = node
        else:
            status, source, coerced = fold_chemical_state_total(
                node["pfas_status"], node["pfas_information_source"],
                chem["tag"], chem["source"],
            )
            if coerced:
                store.errors.append(
                    ("status_fold", node["entity_id"], "IMPOSSIBLE_TRANSITION")
                )
            node["pfas_status"] = status
            node["pfas_information_source"] = source
            node["cas_number"] = cas  # reference overwrites on every link (:1081)
        if cas:
            store.chem_by_cas[(mfr_name, cas)] = node

        # J4 edge upsert (weight: last write wins)
        store.edges[(material["entity_id"], node["entity_id"], "CONTAINS")] = chem[
            "composition"
        ]
        store.lineage.append((node["entity_id"], conv_id, chem["turn_idx"]))

        # A5 propagation: recompute every material containing this chemical
        parents = [
            m for m in store.materials.values()
            if (m["entity_id"], node["entity_id"], "CONTAINS") in store.edges
        ]
        for parent in parents:
            children = [
                c for c in store.chem_nodes
                if (parent["entity_id"], c["entity_id"], "CONTAINS") in store.edges
            ]
            status, source = parent_pfas_resolution(
                [(c["pfas_status"], c["pfas_information_source"]) for c in children]
            )
            parent["pfas_status"] = status
            parent["pfas_information_source"] = source if source else "NONE"


def run_oracle(turns_table: pa.Table) -> OracleStore:
    import pandas as pd

    df = turns_table.select(["conv_id", "turn_idx", "text"]).to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    store = OracleStore()
    # M14 ingest validation: rows missing a grouping key fail as INVALID_ROW
    # (engine counterpart: kg_build.validate_turns)
    bad = df["conv_id"].isna() | df["turn_idx"].isna()
    if bad.any():
        for cid in df.loc[bad, "conv_id"]:
            store.errors.append(
                ("ingest", cid if pd.notna(cid) else "<null-conv>", "INVALID_ROW")
            )
        df = df[~bad]
    for conv_id, g in df.groupby("conv_id", sort=True):
        record = extract_record(list(zip(g["turn_idx"], g["text"])))
        if record is None:
            continue
        if "__drop_reason" in record:
            store.errors.append(("assemble", conv_id, record["__drop_reason"]))
            continue
        ingest(store, conv_id, record)
    return store


def oracle_errors(store: OracleStore) -> List[dict]:
    """Errors side-channel as (stage, key, reason) dicts — the serial
    counterpart of KGResult.errors (reference run-state FAILED rows,
    file_analysis_service.py:190-207)."""
    return [{"stage": s, "key": k, "reason": r} for s, k, r in store.errors]


def oracle_nodes(store: OracleStore) -> List[dict]:
    out = []
    for m in store.materials.values():
        out.append({k: m[k] for k in (
            "entity_id", "name", "node_type", "cas_number", "pfas_status",
            "pfas_information_source")})
    for c in store.chem_nodes:
        out.append({k: c[k] for k in (
            "entity_id", "name", "node_type", "cas_number", "pfas_status",
            "pfas_information_source")})
    for f in store.manufacturers.values():
        out.append({
            "entity_id": f["entity_id"], "name": f["name"],
            "node_type": "MANUFACTURER", "cas_number": None,
            "pfas_status": None, "pfas_information_source": "NONE",
        })
    return out


def oracle_manufacturers(store: OracleStore) -> List[dict]:
    """The reference's `manufacturer` table rows (MANUFACTURERS_SCHEMA):
    entity_id, name, and the creating record's geo attributes."""
    return [
        {"entity_id": f["entity_id"], "name": f["name"],
         **{k: f.get(k) for k in GEO_FIELDS}}
        for f in store.manufacturers.values()
    ]


def oracle_edges(store: OracleStore) -> List[dict]:
    return [
        {"src": src, "dst": dst, "pred": pred, "weight": w}
        for (src, dst, pred), w in store.edges.items()
    ]
