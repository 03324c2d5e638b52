"""Deterministic synthetic transcript corpus (FIXTURES.md F1).

Schema (BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
    ts:timestamp[us]

Each conversation "discusses" one material, one manufacturer and 1-8
chemicals with CAS numbers, composition percentages and PFAS tags —
mirroring the reference's extraction record (MSDSAnalysis,
/root/reference/app/modules/artifact_ingestor/dto/msds_openai_response.py:7-25).
A controlled fraction of mentions use alias variants (case changes, inserted
spaces — normalization M7), some conversations carry product-number / UPC
turns (combine_material_name, artifact_ingestor_service.py:725-742), and a
few "hot" entities appear in >20% of conversations to exercise skew salting.

Everything is seeded (numpy RandomState keyed by (seed, conv index)); no
wall-clock, no external data. Rows are written SHUFFLED across multiple
files so pipelines must re-establish (conv_id, turn_idx) order.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_BASE_US = 1_700_000_000 * 1_000_000  # fixed epoch base, microseconds

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "python", "browser")

_CHEM_PREFIXES = (
    "Perfluoro Alkanoate",
    "Fluorotelomer",
    "Polymer Resin",
    "Surfactant Blend",
    "Stabilizer",
    "Solvent",
)
_MAT_PREFIXES = ("Coating", "Sealant", "Foam", "Laminate", "Lubricant", "Textile Finish")
_MFR_SUFFIXES = ("Industries", "Chemical Co", "Materials Group", "Corp", "Labs")

FILLER_TEXTS = (
    "Thanks, let me look into the compliance requirements next.",
    "Could you summarize the findings so far?",
    "The safety data sheet has several sections to review.",
    "I will check the regulatory database for updates.",
    "That matches what the supplier declared earlier.",
    "Noted. Proceeding with the next item on the list.",
)

TOOL_TEXTS = (
    "",
    "",
    "status: ok, 3 results returned",
    "lookup complete",
)


@dataclasses.dataclass
class TurnCorpusSpec:
    n_convs: int = 500
    seed: int = 42
    n_manufacturers: int = 0  # 0 -> derived
    n_chemicals: int = 0  # 0 -> derived
    hot_fraction: float = 0.22  # fraction of convs that mention the hot entities

    def __post_init__(self):
        if self.n_manufacturers <= 0:
            self.n_manufacturers = max(5, self.n_convs // 20)
        if self.n_chemicals <= 0:
            self.n_chemicals = max(12, self.n_convs // 5)


def _chem_vocab(spec: TurnCorpusSpec):
    """Deterministic chemical pool: name, cas (15% missing), fixed tag+source."""
    rng = np.random.RandomState(spec.seed + 101)
    chems = []
    for i in range(spec.n_chemicals):
        prefix = _CHEM_PREFIXES[i % len(_CHEM_PREFIXES)]
        name = f"{prefix} {i:04d}"
        has_cas = rng.rand() > 0.15
        cas = f"{1000 + i}-{i % 96 + 1:02d}-{i % 10}" if has_cas else None
        tag = ("PFAS", "NO_PFAS", "PENDING", "UNKNOWN")[int(rng.randint(0, 4))]
        source = ("OPENAI", "OECD", "MANUAL", "NONE")[int(rng.randint(0, 4))]
        chems.append({"name": name, "cas": cas, "tag": tag, "source": source})
    return chems


def _mfr_vocab(spec: TurnCorpusSpec):
    rng = np.random.RandomState(spec.seed + 202)
    out = []
    for i in range(spec.n_manufacturers):
        suffix = _MFR_SUFFIXES[int(rng.randint(0, len(_MFR_SUFFIXES)))]
        out.append(f"Vendor {i:03d} {suffix}")
    return out


_GEO_CITIES = ("Brookfield", "Harlow", "Kestrel Bay", "Mirefield", "Ostend Park")
_GEO_STATES = ("NS", "VT", "QL", "BR")
_GEO_COUNTRIES = ("Freedonia", "Sylvania", "Arendelle")
_GEO_REGIONS = ("EMEA", "APAC", "AMER")
_GEO_STREETS = ("Alder St", "Birch Ave", "Cedar Rd", "Dunmore Ln")


def _mfr_geo_vocab(spec: TurnCorpusSpec):
    """Canonical geo attributes per manufacturer (reference Manufacturer ORM
    columns, models/manufacturer.py:6-18). A separate RandomState keeps the
    name stream untouched; ~12% of manufacturers carry no geo at all (their
    conversations emit no supplier-location turn)."""
    rng = np.random.RandomState(spec.seed + 203)
    out = []
    for _ in range(spec.n_manufacturers):
        if rng.rand() < 0.12:
            out.append(None)
            continue
        out.append(
            {
                "address": f"{int(rng.randint(10, 999))} "
                f"{_GEO_STREETS[int(rng.randint(0, len(_GEO_STREETS)))]}",
                "postal_code": f"{int(rng.randint(10000, 99999))}",
                "city": _GEO_CITIES[int(rng.randint(0, len(_GEO_CITIES)))],
                "state": _GEO_STATES[int(rng.randint(0, len(_GEO_STATES)))],
                "country": _GEO_COUNTRIES[int(rng.randint(0, len(_GEO_COUNTRIES)))],
                "region": _GEO_REGIONS[int(rng.randint(0, len(_GEO_REGIONS)))],
            }
        )
    return out


def supplier_geo_text(mfr: str, geo: dict) -> str:
    """The supplier-location utterance (the grammar SUPPLIER_PATTERN in
    stages/extract.py parses)."""
    return (
        f'Supplier "{mfr}" is based at "{geo["address"]}", '
        f'postal code "{geo["postal_code"]}", city "{geo["city"]}", '
        f'state "{geo["state"]}", country "{geo["country"]}", '
        f'region "{geo["region"]}".'
    )


def _alias_variant(name: str, rng: np.random.RandomState) -> str:
    """Case change or inserted space — collapses under normalize_name_key (M7)."""
    choice = rng.randint(0, 3)
    if choice == 0:
        return name.upper()
    if choice == 1:
        return name.lower()
    # insert a space after the first 3 chars (stays same after space-stripping)
    return name[:3] + " " + name[3:]


def generate_turns(spec: TurnCorpusSpec, conv_range: Optional[tuple] = None) -> pa.Table:
    """Generate turns for conversations in ``conv_range`` (default: all).
    Each conversation is seeded independently by (seed, conv index), so
    sharded generation produces byte-identical rows to a single pass."""
    chems = _chem_vocab(spec)
    mfrs = _mfr_vocab(spec)
    geos = _mfr_geo_vocab(spec)
    n_hot_chem = max(1, len(chems) // 50)
    lo, hi = conv_range if conv_range is not None else (0, spec.n_convs)

    conv_ids: List[str] = []
    turn_idxs: List[int] = []
    roles: List[str] = []
    texts: List[str] = []
    tools: List[str] = []
    tss: List[int] = []

    for ci in range(lo, hi):
        rng = np.random.RandomState((spec.seed * 1_000_003 + ci) % (2**31 - 1))
        conv_id = f"conv{ci:06d}"
        is_hot = rng.rand() < spec.hot_fraction
        mfr_idx = 0 if is_hot else int(rng.randint(0, len(mfrs)))
        mfr = mfrs[mfr_idx]
        mat_prefix = _MAT_PREFIXES[int(rng.randint(0, len(_MAT_PREFIXES)))]
        mat_base_idx = int(rng.randint(0, max(2, spec.n_convs // 3)))
        material = f"{mat_prefix} {mat_base_idx:05d}"
        if rng.rand() < 0.2:  # material alias variant (normalizes to same key)
            material = _alias_variant(material, rng)
        product_no = f"P-{rng.randint(100, 9999)}" if rng.rand() < 0.3 else None
        upc = f"{rng.randint(10**11, 10**12 - 1)}" if rng.rand() < 0.2 else None

        n_chem = int(rng.randint(1, 9))
        picked = []
        if is_hot:
            picked.append(chems[int(rng.randint(0, n_hot_chem))])
        while len(picked) < n_chem:
            picked.append(chems[int(rng.randint(0, len(chems)))])
        if rng.rand() < 0.25 and picked:  # duplicate mention -> last-wins dedup (A1)
            picked.append(picked[int(rng.randint(0, len(picked)))])

        # --- build the turn texts for this conversation
        turn_texts: List[tuple] = []  # (role, text, tool)
        turn_texts.append(
            (
                "user",
                f'We are reviewing material "{material}" supplied by "{mfr}".',
                "",
            )
        )
        if product_no or upc:
            bits = []
            if product_no:
                bits.append(f"product number {product_no}")
            if upc:
                bits.append(f"UPC {upc}")
            turn_texts.append(("assistant", "Recorded " + " and ".join(bits) + ".", ""))
        for chem in picked:
            cname = chem["name"]
            if chem["cas"] is not None and rng.rand() < 0.2:
                # alias of a CAS-bearing chemical: unifies via the CAS probe (J2 tier 1)
                cname = _alias_variant(cname, rng)
            pct = round(float(rng.rand()) * 60 + 0.5, 1)
            tag = chem["tag"]
            if rng.rand() < 0.1:  # occasional tag flip exercises the status whitelist
                tag = ("PFAS", "NO_PFAS", "PENDING")[int(rng.randint(0, 3))]
            if chem["cas"] is not None:
                text = (
                    f'It contains ingredient "{cname}" with CAS {chem["cas"]} '
                    f"at {pct}% tagged {tag} (source {chem['source']})."
                )
            else:
                text = (
                    f'It contains ingredient "{cname}" '
                    f"at {pct}% tagged {tag} (source {chem['source']})."
                )
            turn_texts.append(("assistant", text, ""))
            if rng.rand() < 0.25:
                tool = TOOLS[int(rng.randint(0, len(TOOLS)))]
                turn_texts.append(
                    ("tool", TOOL_TEXTS[int(rng.randint(0, len(TOOL_TEXTS)))], tool)
                )
        n_filler = int(rng.randint(1, 5))
        for _ in range(n_filler):
            turn_texts.append(
                ("user" if rng.rand() < 0.5 else "assistant",
                 FILLER_TEXTS[int(rng.randint(0, len(FILLER_TEXTS)))], "")
            )

        # supplier-location turn (geo attributes, reference Manufacturer ORM):
        # drawn from its OWN per-conv stream so the pre-existing turn content
        # above stays byte-identical across corpus versions. ~25% of geo-
        # bearing convs omit the turn (record then has null geo — if such a
        # conv CREATES the manufacturer, the node keeps null geo: the
        # reference never back-fills, artifact_ingestor_service.py:992-1008);
        # ~15% report a variant street number, exercising first-record-wins.
        geo = geos[mfr_idx]
        if geo is not None:
            grng = np.random.RandomState(
                (spec.seed * 2_000_003 + ci * 7 + 31) % (2**31 - 1)
            )
            if grng.rand() < 0.75:
                if grng.rand() < 0.15:
                    geo = dict(geo, address=f"{int(grng.randint(10, 999))} "
                               + geo["address"].split(" ", 1)[1])
                turn_texts.append(("assistant", supplier_geo_text(mfr, geo), ""))

        for ti, (role, text, tool) in enumerate(turn_texts):
            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(EPOCH_BASE_US + ci * 3_600_000_000 + ti * 7_000_000)

    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    return table


def write_turns(
    out_dir: str,
    spec: Optional[TurnCorpusSpec] = None,
    num_files: int = 4,
    shuffle: bool = True,
) -> str:
    """Write the corpus as `num_files` parquet files with rows shuffled across
    files (exercises the sort-within-partition ordering invariant). Idempotent:
    skips generation when a _SPEC marker with the same parameters exists."""
    spec = spec or TurnCorpusSpec()
    marker = os.path.join(out_dir, "_SPEC")
    stamp = (
        f"n_convs={spec.n_convs} seed={spec.seed} files={num_files} "
        f"shuffle={shuffle} v=2"  # v2: supplier-location (geo) turns
    )
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == stamp:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    parallel = False
    if spec.n_convs >= 20_000:
        try:
            import ray

            parallel = ray.is_initialized()
        except ImportError:
            parallel = False

    if parallel:
        import ray

        @ray.remote
        def gen_shard(shard: int) -> str:
            convs_per_file = (spec.n_convs + num_files - 1) // num_files
            lo = shard * convs_per_file
            hi = min(spec.n_convs, lo + convs_per_file)
            if lo >= hi:
                return ""
            table = generate_turns(spec, (lo, hi))
            if shuffle:  # local shard shuffle (per-shard seeded, deterministic)
                perm = np.random.RandomState(spec.seed + 9 + shard).permutation(
                    table.num_rows
                )
                table = table.take(pa.array(perm))
            path = os.path.join(out_dir, f"turns_{shard:04d}.parquet")
            pq.write_table(table, path, row_group_size=max(1024, table.num_rows // 4))
            return path

        ray.get([gen_shard.remote(i) for i in range(num_files)])
    else:
        table = generate_turns(spec)
        if shuffle:
            perm = np.random.RandomState(spec.seed + 9).permutation(table.num_rows)
            table = table.take(pa.array(perm))
        rows_per_file = (table.num_rows + num_files - 1) // num_files
        for i in range(num_files):
            chunk = table.slice(i * rows_per_file, rows_per_file)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(out_dir, f"turns_{i:04d}.parquet"),
                               row_group_size=max(1024, rows_per_file // 4))
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out_dir
