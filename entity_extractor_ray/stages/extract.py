"""Per-turn extraction stages: mention detection + structured record extraction.

These are the Ray-Data re-expression of the reference's per-page LLM analysis
(`analyze_msds_using_openai`, /root/reference/app/modules/artifact_ingestor/
services/artifact_ingestor_service.py:759-817): instead of a remote LLM the
actor hosts a warm, deterministic rule/pattern model (compiled RE2 via
pyarrow.compute — vectorized over the whole Arrow batch, zero-copy in).

Stage shape: callable classes for ``map_batches(Cls, batch_format="pyarrow",
concurrency=N)`` — patterns compiled once per actor in ``__init__`` (the
reference's client construction in FileAnalysisService.__init__ /
LLMInvoker.__init__, SURVEY.md §2.3), work per batch in ``__call__``.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# The rigid utterance grammar of the synthetic transcript corpus
# (sources/transcripts.py). One pattern per extraction rule — the analog of
# the reference's prompt sections (entity_extractor/constants.py:115-117).
MATERIAL_PATTERN = (
    r'We are reviewing material "(?P<material>[^"]+)" supplied by "(?P<manufacturer>[^"]+)"\.'
)
PRODUCT_PATTERN = r"product number (?P<product_no>[A-Za-z0-9\-]+)"
UPC_PATTERN = r"UPC (?P<upc>[0-9]+)"
CHEMICAL_PATTERN = (
    r'It contains ingredient "(?P<name>[^"]+)"(?: with CAS (?P<cas>[0-9\-]+))?'
    r" at (?P<pct>[0-9.]+)% tagged (?P<tag>[A-Z_]+) \(source (?P<source>[A-Z]+)\)\."
)
# manufacturer geo attributes (reference Manufacturer ORM columns,
# models/manufacturer.py:6-18, populated from the per-document MSDS analysis
# at artifact_ingestor_service.py:996-1005)
SUPPLIER_PATTERN = (
    r'Supplier "(?P<supplier>[^"]+)" is based at "(?P<address>[^"]+)", '
    r'postal code "(?P<postal_code>[^"]*)", city "(?P<city>[^"]*)", '
    r'state "(?P<state>[^"]*)", country "(?P<country>[^"]*)", '
    r'region "(?P<region>[^"]*)"\.'
)

GEO_FIELDS = ("address", "postal_code", "city", "state", "country", "region")
GEO_TYPE = pa.struct([(f, pa.string()) for f in GEO_FIELDS])

MENTIONS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("mention", pa.string()),
        ("label", pa.string()),
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
        ("confidence", pa.float64()),
    ]
)

# ---- packed extraction exchange format (round 5, VERDICT r4 #3) --------
# The extraction output exists ONLY to cross the conv_id assemble shuffle;
# as a 10-column wide table its string-offset arrays alone were ~1/3 of the
# exchange (7 string columns + a 6-string sparse geo struct allocate
# offsets for EVERY row even when null). The packed form ships 4 columns:
# the two keys, an int8 kind code, and ONE payload string holding the
# kind's fields \x1f-joined (fields are \x1e-escaped first, so arbitrary
# input text round-trips exactly). Measured at 20k convs: 16.6 MB -> 8.5
# MB on the conv_id exchange. ``unpack_extraction`` restores the legacy
# wide table for tests/diagnostics.

FIELD_SEP = "\x1f"
_ESC = "\x1e"

KINDS = ("MATERIAL", "PRODUCT_NO", "UPC", "CHEMICAL", "SUPPLIER_GEO")
KIND_CODE = {k: np.int8(i) for i, k in enumerate(KINDS)}
KIND_FIELDS = {
    "MATERIAL": ("name", "manufacturer"),
    "PRODUCT_NO": ("name",),
    "UPC": ("name",),
    # cas travels as "" when absent; decode restores None (M9 strip-to-None)
    "CHEMICAL": ("name", "cas", "composition", "tag", "source"),
    "SUPPLIER_GEO": ("manufacturer",) + GEO_FIELDS,
}

EXTRACTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("kind", pa.int8()),  # index into KINDS
        ("payload", pa.string()),  # kind's fields, escaped + \x1f-joined
    ]
)


def _escape_arr(col):
    """Vectorized field escaping: \\x1e -> \\x1e0, \\x1f -> \\x1e1 (nulls
    become empty fields)."""
    col = pc.fill_null(col, "")
    col = pc.replace_substring(col, pattern=_ESC, replacement=_ESC + "0")
    return pc.replace_substring(col, pattern=FIELD_SEP, replacement=_ESC + "1")


def pack_payload(cols):
    """Escape + join the kind's field columns into one payload column."""
    esc = [_escape_arr(c) for c in cols]
    return esc[0] if len(esc) == 1 else pc.binary_join_element_wise(*esc, FIELD_SEP)


def _escape_str(s) -> str:
    s = s or ""
    return s.replace(_ESC, _ESC + "0").replace(FIELD_SEP, _ESC + "1")


def pack_payload_str(fields) -> str:
    return FIELD_SEP.join(_escape_str(f) for f in fields)


def _unescape_str(s: str) -> str:
    if _ESC not in s:
        return s
    return s.replace(_ESC + "1", FIELD_SEP).replace(_ESC + "0", _ESC)


def unpack_payload_str(s: str):
    """payload -> list of field strings (escaping reversed)."""
    return [_unescape_str(p) for p in s.split(FIELD_SEP)]


def unpack_extraction(t: pa.Table) -> pa.Table:
    """Packed extraction rows -> the legacy wide table (kind as string,
    per-kind fields as columns, geo as a struct, cas '' -> null). For
    tests and diagnostics — the pipeline itself consumes the packed form."""
    kinds = t.column("kind").to_pylist()
    payloads = t.column("payload").to_pylist()
    wide = {k: [] for k in ("kind", "name", "manufacturer", "cas",
                            "composition", "tag", "source", "geo")}
    for code, pay in zip(kinds, payloads):
        kind = KINDS[code]
        fields = dict(zip(KIND_FIELDS[kind], unpack_payload_str(pay)))
        wide["kind"].append(kind)
        wide["name"].append(fields.get("name"))
        wide["manufacturer"].append(fields.get("manufacturer"))
        wide["cas"].append(fields.get("cas") or None)
        wide["composition"].append(fields.get("composition"))
        wide["tag"].append(fields.get("tag"))
        wide["source"].append(fields.get("source"))
        wide["geo"].append(
            {g: fields[g] for g in GEO_FIELDS} if kind == "SUPPLIER_GEO" else None
        )
    return pa.table(
        {
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "kind": pa.array(wide["kind"], pa.string()),
            "name": pa.array(wide["name"], pa.string()),
            "manufacturer": pa.array(wide["manufacturer"], pa.string()),
            "cas": pa.array(wide["cas"], pa.string()),
            "composition": pa.array(wide["composition"], pa.string()),
            "tag": pa.array(wide["tag"], pa.string()),
            "source": pa.array(wide["source"], pa.string()),
            "geo": pa.array(wide["geo"], GEO_TYPE),
        }
    )


def _extract_rows(
    batch: pa.Table, pattern: str, builder
) -> List[pa.Table]:
    """Run one extract_regex rule over the text column; `builder` maps the
    (filtered batch, struct columns dict) to a list of output columns."""
    text = batch.column("text")
    res = pc.extract_regex(text, pattern=pattern)
    mask = pc.is_valid(res)
    if pc.sum(mask).as_py() in (None, 0):
        return []
    idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    taken = batch.take(idx)
    struct = res.take(idx)
    fields = {f.name: pc.struct_field(struct, f.name) for f in struct.type}
    return [builder(taken, fields)]


class RecordExtractor:
    """turns batch -> structured extraction rows (EXTRACTION_SCHEMA).

    Vectorized: one RE2 pass per rule over the whole batch. Rows with no
    match produce no output (filler / tool turns)."""

    def __init__(self) -> None:
        # patterns are module constants; pyarrow compiles RE2 internally and
        # caches per pattern — nothing heavier to warm here, but the actor
        # form keeps the stage shape uniform with model-backed extractors.
        self._empty = EXTRACTION_SCHEMA.empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_all = batch.num_rows
        if n_all == 0:
            return self._empty
        out: List[pa.Table] = []

        def mk(taken: pa.Table, kind: str, field_cols) -> pa.Table:
            n = taken.num_rows
            return pa.table(
                {
                    "conv_id": taken.column("conv_id"),
                    "turn_idx": taken.column("turn_idx"),
                    "kind": pa.array(
                        np.full(n, KIND_CODE[kind], dtype=np.int8)
                    ),
                    "payload": pack_payload(field_cols),
                },
                schema=EXTRACTION_SCHEMA,
            )

        out += _extract_rows(
            batch,
            MATERIAL_PATTERN,
            lambda t, f: mk(t, "MATERIAL", [f["material"], f["manufacturer"]]),
        )
        out += _extract_rows(
            batch, PRODUCT_PATTERN, lambda t, f: mk(t, "PRODUCT_NO", [f["product_no"]])
        )
        out += _extract_rows(batch, UPC_PATTERN, lambda t, f: mk(t, "UPC", [f["upc"]]))

        def supplier_builder(t: pa.Table, f) -> pa.Table:
            return mk(t, "SUPPLIER_GEO",
                      [f["supplier"]] + [f[name] for name in GEO_FIELDS])

        out += _extract_rows(batch, SUPPLIER_PATTERN, supplier_builder)

        def chem_builder(t: pa.Table, f) -> pa.Table:
            # optional CAS rides as "" (decode restores None — M9)
            return mk(t, "CHEMICAL",
                      [f["name"], f["cas"], f["pct"], f["tag"], f["source"]])

        # pc.extract_regex yields only the FIRST match per turn. Turns with a
        # single chemical sentence (the overwhelming case) stay on that
        # vectorized path; turns carrying SEVERAL chemical sentences take a
        # finditer side-path so no mention is silently lost (the reference's
        # LLM extraction returns every chemical on the page,
        # artifact_ingestor_service.py:798-802).
        n_chem = pc.count_substring(
            pc.fill_null(batch.column("text"), ""), 'It contains ingredient "'
        )
        multi_mask = pc.greater(n_chem, 1)
        n_multi = pc.sum(multi_mask).as_py() or 0
        if n_multi == 0:
            out += _extract_rows(batch, CHEMICAL_PATTERN, chem_builder)
        else:
            single = batch.filter(pc.invert(multi_mask))
            out += _extract_rows(single, CHEMICAL_PATTERN, chem_builder)
            out.append(self._chem_finditer(batch.filter(multi_mask)))
        if not out:
            return self._empty
        return pa.concat_tables(out).combine_chunks()

    def _chem_finditer(self, batch: pa.Table) -> pa.Table:
        """Rare path: every chemical-sentence match of every turn (Python
        finditer over the few multi-chemical rows only)."""
        import re

        cre = re.compile(CHEMICAL_PATTERN)
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        rows = {k: [] for k in ("conv_id", "turn_idx", "payload")}
        for c, t, text in zip(conv, tidx, texts):
            for m in cre.finditer(text or ""):
                rows["conv_id"].append(c)
                rows["turn_idx"].append(t)
                rows["payload"].append(
                    pack_payload_str(
                        [m.group("name"), m.group("cas") or "",
                         m.group("pct"), m.group("tag"), m.group("source")]
                    )
                )
        n = len(rows["conv_id"])
        return pa.table(
            {
                "conv_id": pa.array(rows["conv_id"], pa.string()),
                "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
                "kind": pa.array(np.full(n, KIND_CODE["CHEMICAL"], np.int8)),
                "payload": pa.array(rows["payload"], pa.string()),
            },
            schema=EXTRACTION_SCHEMA,
        )


_MENTION_DETECTOR: "MentionDetector | None" = None


def detect_mentions(batch: pa.Table) -> pa.Table:
    """Task-pool form of MentionDetector (per-process singleton) — safe at
    any num_cpus; an actor pool sized >= the CPU count can starve the other
    operators in small sessions."""
    global _MENTION_DETECTOR
    if _MENTION_DETECTOR is None:
        _MENTION_DETECTOR = MentionDetector()
    return _MENTION_DETECTOR(batch)


_RECORD_EXTRACTOR: "RecordExtractor | None" = None


def extract_records(batch: pa.Table) -> pa.Table:
    """Task-pool form of RecordExtractor: a module-level singleton per worker
    process gives the same warm-once behavior with no actor-pool startup —
    use this when the extractor state is cheap (compiled patterns); use the
    class + ``concurrency=`` when it holds a real model."""
    global _RECORD_EXTRACTOR
    if _RECORD_EXTRACTOR is None:
        _RECORD_EXTRACTOR = RecordExtractor()
    return _RECORD_EXTRACTOR(batch)


class MentionDetector:
    """turns batch -> mention rows (MENTIONS_SCHEMA): surface span + label.

    The driver-facing analog of the reference's keyword/regex search stage
    (search_keywords_in_extracted_text, file_analysis_service.py:68-121):
    every quoted-entity / CAS / percent / tag occurrence becomes one mention
    row with its span. confidence is 1.0 for rule matches (the reference
    rounds OCR confidence ×100 to 2dp; rules are certain)."""

    LABEL_PATTERNS = (
        ("MATERIAL", r'We are reviewing material "([^"]+)"'),
        ("MANUFACTURER", r'supplied by "([^"]+)"'),
        ("CHEMICAL", r'It contains ingredient "([^"]+)"'),
        ("CAS", r"CAS ([0-9]{2,7}-[0-9]{2}-[0-9])"),
        ("PERCENT", r"at ([0-9.]+)%"),
        ("TAG", r"tagged ([A-Z_]+)"),
    )

    # Joins every text of the batch into ONE corpus string with this
    # separator and runs each pattern's finditer ONCE over it — the Python
    # loop becomes output-sized (per match) instead of input-sized (per
    # row x per pattern). Why `"\x00"` is safe: the quoted-capture patterns
    # ([^"]+) cannot cross the quote chars, the numeric/uppercase captures
    # cannot match '"' or NUL, and no literal prefix contains either — so a
    # match can never span two rows; the only separator artifact is a
    # capture equal to "\x00", dropped by the NUL filter below.
    SEP = '"\x00"'

    def __init__(self) -> None:
        import re

        self._compiled = [(label, re.compile(pat)) for label, pat in self.LABEL_PATTERNS]
        self._empty = MENTIONS_SCHEMA.empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._empty
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = [t or "" for t in batch.column("text").to_pylist()]
        sep_len = len(self.SEP)
        # starts[i] = offset of row i's text in the joined corpus
        lengths = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lengths[:-1] + sep_len, out=starts[1:])
        corpus = self.SEP.join(texts)

        rows_conv, rows_tidx, rows_mention, rows_label = [], [], [], []
        rows_s, rows_e = [], []
        for label, cre in self._compiled:
            for m in cre.finditer(corpus):
                g = m.group(1)
                if "\x00" in g:
                    continue  # separator artifact
                row = int(np.searchsorted(starts, m.start(1), side="right")) - 1
                # the FULL match (not just the capture) must lie inside the
                # capture's row: a row ending in an unterminated quote (e.g.
                # 'material "Foo') would otherwise close against the
                # separator's leading '"' — a NUL-free false positive the
                # per-row path never produces
                if m.start() < starts[row] or m.end() > starts[row] + lengths[row]:
                    continue
                rows_conv.append(conv[row])
                rows_tidx.append(tidx[row])
                rows_mention.append(g)
                rows_label.append(label)
                rows_s.append(m.start(1) - starts[row])
                rows_e.append(m.end(1) - starts[row])
        n = len(rows_conv)
        return pa.table(
            {
                "conv_id": pa.array(rows_conv, pa.string()),
                "turn_idx": pa.array(rows_tidx, pa.int32()),
                "mention": pa.array(rows_mention, pa.string()),
                "label": pa.array(rows_label, pa.string()),
                "span_start": pa.array(rows_s, pa.int32()),
                "span_end": pa.array(rows_e, pa.int32()),
                "confidence": pa.array([1.0] * n, pa.float64()),
            },
            schema=MENTIONS_SCHEMA,
        )
