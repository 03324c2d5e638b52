"""Pure decision-table kernels fixing the reference's merge / rollup semantics.

These are the semantic contracts of the reference engine, re-implemented as
pure functions so they can be unit-tested exhaustively and then applied
vectorized / inside grouped folds by the Ray Data stages.

Reference citations (file:line into /root/reference):
  - tag -> status map:            app/modules/artifact_ingestor/services/artifact_ingestor_service.py:881-887
  - parent status lattice + vote: artifact_ingestor_service.py:819-879
  - source transition map:        artifact_ingestor_service.py:1207-1235 (raise at 1244-1248)
  - status-update whitelist:      artifact_ingestor_service.py:1171-1205
  - name normalization key:       app/modules/artifact_ingestor/repositories/global_node_repository.py:29,147
  - material name combine:        artifact_ingestor_service.py:725-742
  - CAS normalization:            artifact_ingestor_service.py:1035-1039
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Optional, Sequence, Tuple

# ---------------------------------------------------------------- vocabularies

STATUS_YES = "YES"
STATUS_NO = "NO"
STATUS_PENDING = "PENDING"
STATUSES = (STATUS_YES, STATUS_NO, STATUS_PENDING)

SRC_OPENAI = "OPENAI"
SRC_MANUAL = "MANUAL"
SRC_OECD = "OECD"
SRC_NONE = "NONE"
SRC_VAI = "VAI"
# the transition map's *input* alphabet (existing/new) is {OPENAI,MANUAL,OECD,NONE};
# its output alphabet additionally contains VAI.
TRANSITION_INPUT_SOURCES = (SRC_OPENAI, SRC_MANUAL, SRC_OECD, SRC_NONE)

TAG_PFAS = "PFAS"
TAG_NO_PFAS = "NO_PFAS"
TAG_PENDING = "PENDING"

NODE_MATERIAL = "MATERIAL"
NODE_CHEMICAL = "CHEMICAL"
NODE_MANUFACTURER = "MANUFACTURER"


class TransitionError(ValueError):
    """Raised for the two impossible source transitions (OECD_MANUAL, MANUAL_OECD).

    Mirrors the reference's CommonException("TRANSITION_FROM_0_TO_1_IS_NOT_POSSIBLE")
    at artifact_ingestor_service.py:1244-1248.
    """


# ------------------------------------------------------------------- tag map

def pfas_status_from_tag(tag: Optional[str]) -> str:
    """{PFAS -> YES, NO_PFAS -> NO, anything else (incl. None) -> PENDING}."""
    if tag == TAG_PFAS:
        return STATUS_YES
    if tag == TAG_NO_PFAS:
        return STATUS_NO
    return STATUS_PENDING


# ------------------------------------------------- parent rollup (lattice + vote)

def parent_pfas_resolution(
    children: Sequence[Tuple[str, str]],
) -> Tuple[str, Optional[str]]:
    """Fold child (status, source) pairs into the parent (status, source).

    Status lattice: any child YES -> YES; else no child PENDING -> NO
    (empty set -> NO); else PENDING.

    Source vote: among children whose status equals the resolved parent
    status, count occurrences per source; walk the preference order and
    pick the first source with count > 0 (None if no voter). Preference is
    [OECD, VAI, MANUAL] when the parent status is PENDING, else
    [VAI, OECD, MANUAL].
    """
    has_yes = False
    has_pending = False
    for status, _src in children:
        if status == STATUS_YES:
            has_yes = True
            break
        if status == STATUS_PENDING:
            has_pending = True

    if has_yes:
        parent_status = STATUS_YES
    elif not has_pending:
        parent_status = STATUS_NO
    else:
        parent_status = STATUS_PENDING

    if parent_status == STATUS_PENDING:
        preference = (SRC_OECD, SRC_VAI, SRC_MANUAL)
    else:
        preference = (SRC_VAI, SRC_OECD, SRC_MANUAL)

    counts = Counter(src for status, src in children if status == parent_status)
    parent_source = None
    for source in preference:
        if counts.get(source, 0) > 0:
            parent_source = source
            break
    return parent_status, parent_source


# ------------------------------------------------------ source transition map

_TRANSITION_MAP = {
    ("OPENAI", "OPENAI"): SRC_VAI,
    ("MANUAL", "OPENAI"): SRC_MANUAL,
    ("OECD", "OPENAI"): SRC_OECD,
    ("NONE", "OPENAI"): SRC_VAI,
    ("OPENAI", "MANUAL"): SRC_MANUAL,
    ("MANUAL", "MANUAL"): SRC_MANUAL,
    ("OECD", "MANUAL"): None,  # impossible transition
    ("NONE", "MANUAL"): SRC_MANUAL,
    ("OPENAI", "OECD"): SRC_OECD,
    ("MANUAL", "OECD"): None,  # impossible transition
    ("OECD", "OECD"): SRC_OECD,
    ("NONE", "OECD"): SRC_OECD,
    ("OPENAI", "NONE"): SRC_VAI,
    ("MANUAL", "NONE"): SRC_MANUAL,
    ("OECD", "NONE"): SRC_OECD,
    ("NONE", "NONE"): SRC_NONE,
}


def final_source(existing_source: str, new_source: str) -> str:
    """16-entry {existing}_{new} transition map; raises TransitionError on the
    two impossible pairs. Unknown pairs (e.g. existing already folded to VAI)
    keep the existing source — the reference would KeyError->None there, but
    in this engine a fold can legitimately see VAI as the accumulated state,
    and holding the existing value is the only total extension that preserves
    every reference-reachable trajectory (VAI never appears as `existing` in
    the reference because its stored nodes start from NONE and the map's
    outputs feed `new` only on the next ingest's *request* source, which is
    always in the input alphabet)."""
    key = (existing_source, new_source)
    if key in _TRANSITION_MAP:
        result = _TRANSITION_MAP[key]
        if result is None:
            raise TransitionError(f"TRANSITION_{existing_source}_TO_{new_source}_IS_NOT_POSSIBLE")
        return result
    # total extension for accumulated states outside the input alphabet (VAI)
    if existing_source == SRC_VAI and new_source in (SRC_OPENAI, SRC_NONE, SRC_VAI):
        return SRC_VAI
    if existing_source == SRC_VAI and new_source == SRC_MANUAL:
        return SRC_MANUAL
    if existing_source == SRC_VAI and new_source == SRC_OECD:
        return SRC_OECD
    return existing_source


# --------------------------------------------------- status-update whitelist

_STATUS_UPDATE_WHITELIST = {
    ("OECD", "VAI"),
    ("VAI", "VAI"),
    ("NONE", "VAI"),
    ("VAI", "MANUAL"),
    ("NONE", "MANUAL"),
    ("VAI", "OECD"),
    ("NONE", "OECD"),
}


def final_status(
    existing_source: str,
    new_source: str,
    existing_status: str,
    new_status: str,
) -> str:
    """Status update allowed only on 7 whitelisted (existing_source, new_source)
    transitions (artifact_ingestor_service.py:1171-1205); otherwise the
    existing status wins."""
    if (existing_source, new_source) in _STATUS_UPDATE_WHITELIST:
        return new_status
    return existing_status


def fold_chemical_state(
    existing_status: str,
    existing_source: str,
    new_tag: str,
    new_source: str,
) -> Tuple[str, str]:
    """One linking step: combine an existing chemical node's (status, source)
    with a newly extracted mention's (tag, source), reference order —
    status first (against the PRE-update sources), then source
    (determine_and_set_the_chemical_pfas_info_source_and_status,
    artifact_ingestor_service.py:1259-1282)."""
    src = final_source(existing_source, new_source)
    status = final_status(
        existing_source, new_source, existing_status, pfas_status_from_tag(new_tag)
    )
    return status, src


def fold_chemical_state_total(
    existing_status: str,
    existing_source: str,
    new_tag: str,
    new_source: str,
) -> Tuple[str, str, bool]:
    """Total variant of fold_chemical_state for the errors side-channel: an
    impossible transition (the reference RAISES and aborts the whole document,
    artifact_ingestor_service.py:1244-1248) keeps the existing (status,
    source) unchanged and reports coerced=True so the pipeline can emit an
    error row instead of crashing a 10-hour job."""
    try:
        status, src = fold_chemical_state(
            existing_status, existing_source, new_tag, new_source
        )
        return status, src, False
    except TransitionError:
        return existing_status, existing_source, True


def fold_chemical_mentions_total(
    mentions: Iterable[Tuple[str, str]],
) -> Tuple[str, str, int]:
    """fold_chemical_mentions with the total extension: returns
    (status, source, n_coerced) where n_coerced counts impossible
    transitions that were skipped (reference raise -> engine error row)."""
    it = iter(mentions)
    try:
        tag, source = next(it)
    except StopIteration:
        raise ValueError("fold_chemical_mentions needs at least one mention")
    status = pfas_status_from_tag(tag)
    n_coerced = 0
    for tag, new_source in it:
        status, source, coerced = fold_chemical_state_total(
            status, source, tag, new_source
        )
        n_coerced += int(coerced)
    return status, source, n_coerced


def fold_chemical_mentions(
    mentions: Iterable[Tuple[str, str]],
) -> Tuple[str, str]:
    """Fold an ordered sequence of (tag, source) mentions into the final
    (status, source) of a canonical chemical node.

    The first mention CREATES the node (status = tag map, source = mention
    source verbatim, artifact_ingestor_service.py:1063-1076); each subsequent
    mention applies fold_chemical_state. Callers must present mentions in a
    deterministic order — (conv_id, turn_idx, position) — replacing the
    reference's arrival-order DB mutation (§7.5 of SURVEY.md).
    """
    it = iter(mentions)
    try:
        tag, source = next(it)
    except StopIteration:
        raise ValueError("fold_chemical_mentions needs at least one mention")
    status = pfas_status_from_tag(tag)
    for tag, new_source in it:
        status, source = fold_chemical_state(status, source, tag, new_source)
    return status, source


# --------------------------------------------------------------- name keys

def normalize_name_key(name: Optional[str]) -> str:
    """The reference's SQL identity key: replace(lower(name), ' ', '')
    (global_node_repository.py:29,147). Blank-after-trim names are excluded
    from identity probes (`trim(gn.name) != ''`); callers filter on
    `is_blank_name` first."""
    if name is None:
        return ""
    return name.lower().replace(" ", "")


def is_blank_name(name: Optional[str]) -> bool:
    return name is None or name.strip() == ""


def combine_material_name(
    material_name: str,
    product_no: Optional[str],
    upc_number: Optional[str],
) -> str:
    """material_name + " (product_no)" + " (upc_number)", each part only when
    non-blank (artifact_ingestor_service.py:725-742)."""
    product_part = f" ({product_no})" if product_no and product_no.strip() else ""
    upc_part = f" ({upc_number})" if upc_number and upc_number.strip() else ""
    return f"{material_name}{product_part}{upc_part}"


def normalize_cas(cas_no: Optional[str]) -> Optional[str]:
    """cas.strip() else None (artifact_ingestor_service.py:1035-1039); an
    all-whitespace CAS strips to '' which is falsy in the reference's probe,
    normalize it to None too."""
    if cas_no is None:
        return None
    stripped = cas_no.strip()
    return stripped if stripped else None


def dedup_chemicals_last_wins(chemicals: Sequence[dict]) -> list:
    """Within one extraction record, dedup chemicals keyed on chemical_name,
    LAST occurrence wins (dict comprehension at artifact_ingestor_service.py:788-791)."""
    distinct = {chem["chemical_name"]: chem for chem in chemicals}
    return list(distinct.values())
