"""Triple emission: assembled conversation records -> (subj, pred, obj) rows.

Surface-level triples (entity surface forms, pre-canonicalization) are the
P/R comparison target vs the reference-semantics oracle (BASELINE.json:
"emitted (subj, pred, obj) triples must hit P/R>=0.95"). Predicates:

  (material, MADE_BY,  manufacturer)                 one per record
  (material, CONTAINS, chemical)  qualifier=composition, per deduped chemical
  (chemical, HAS_CAS,  cas)       when a CAS was extracted
  (chemical, HAS_TAG,  tag)       qualifier=source

This mirrors what the reference persists from one MSDSAnalysis: the
material->manufacturer link (save_material, artifact_ingestor_service.py:
1010-1025), the material->chemical hierarchy with weight (get_node_hierarchy,
:1086-1106) and the chemical's CAS / PFAS-tag attributes (get_chemical_node,
:1027-1084).
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

TRIPLES_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("qualifier", pa.string()),
    ]
)

CHEM_MENTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        # within-conversation PROCESSING order (A1 dict first-occurrence
        # position, assemble.CHEMICAL_STRUCT) — the linking/fold/edge order
        # key; turn_idx stays the LAST occurrence's turn (lineage surface)
        ("pos", pa.int32()),
        ("manufacturer", pa.string()),
        ("material_name", pa.string()),
        ("name", pa.string()),
        ("cas", pa.string()),
        ("composition", pa.string()),
        ("tag", pa.string()),
        ("source", pa.string()),
    ]
)


def explode_triples(batch: pa.Table) -> pa.Table:
    conv = batch.column("conv_id").to_pylist()
    tidx = batch.column("turn_idx").to_pylist()
    mat = batch.column("material_name").to_pylist()
    mfr = batch.column("manufacturer").to_pylist()
    chems = batch.column("chemicals").to_pylist()

    cols: List[list] = [[], [], [], [], [], []]  # conv, turn, subj, pred, obj, qual

    def emit(c, t, s, p, o, q=None):
        cols[0].append(c)
        cols[1].append(t)
        cols[2].append(s)
        cols[3].append(p)
        cols[4].append(o)
        cols[5].append(q)

    for c, t, m, f, chem_list in zip(conv, tidx, mat, mfr, chems):
        emit(c, t, m, "MADE_BY", f)
        for chem in chem_list:
            ct = chem["turn_idx"]
            emit(c, ct, m, "CONTAINS", chem["name"], chem["composition"])
            if chem["cas"]:
                emit(c, ct, chem["name"], "HAS_CAS", chem["cas"])
            emit(c, ct, chem["name"], "HAS_TAG", chem["tag"], chem["source"])

    return pa.table(
        {
            "conv_id": pa.array(cols[0], pa.string()),
            "turn_idx": pa.array(cols[1], pa.int32()),
            "subj": pa.array(cols[2], pa.string()),
            "pred": pa.array(cols[3], pa.string()),
            "obj": pa.array(cols[4], pa.string()),
            "qualifier": pa.array(cols[5], pa.string()),
        },
        schema=TRIPLES_SCHEMA,
    )


def explode_chem_mentions(batch: pa.Table) -> pa.Table:
    """records -> one row per (conversation, deduped chemical) for linking."""
    conv = batch.column("conv_id").to_pylist()
    mat = batch.column("material_name").to_pylist()
    mfr = batch.column("manufacturer").to_pylist()
    chems = batch.column("chemicals").to_pylist()

    out = {name: [] for name in CHEM_MENTION_SCHEMA.names}
    for c, m, f, chem_list in zip(conv, mat, mfr, chems):
        for chem in chem_list:
            out["conv_id"].append(c)
            out["turn_idx"].append(chem["turn_idx"])
            out["pos"].append(chem["pos"])
            out["manufacturer"].append(f)
            out["material_name"].append(m)
            out["name"].append(chem["name"])
            out["cas"].append(chem["cas"])
            out["composition"].append(chem["composition"])
            out["tag"].append(chem["tag"])
            out["source"].append(chem["source"])

    return pa.table(
        {n: pa.array(out[n], CHEM_MENTION_SCHEMA.field(n).type) for n in CHEM_MENTION_SCHEMA.names},
        schema=CHEM_MENTION_SCHEMA,
    )
