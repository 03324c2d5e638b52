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

EXTRACTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("kind", pa.string()),  # MATERIAL | PRODUCT_NO | UPC | CHEMICAL
        ("name", pa.string()),
        ("manufacturer", pa.string()),
        ("cas", pa.string()),
        ("composition", pa.string()),
        ("tag", pa.string()),
        ("source", pa.string()),
        ("geo", GEO_TYPE),  # SUPPLIER_GEO rows only; null elsewhere
    ]
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

        def mk(taken: pa.Table, kind: str, **cols) -> pa.Table:
            n = taken.num_rows
            data = {
                "conv_id": taken.column("conv_id"),
                "turn_idx": taken.column("turn_idx"),
                "kind": pa.array([kind] * n, pa.string()),
                "name": cols.get("name", pa.nulls(n, pa.string())),
                "manufacturer": cols.get("manufacturer", pa.nulls(n, pa.string())),
                "cas": cols.get("cas", pa.nulls(n, pa.string())),
                "composition": cols.get("composition", pa.nulls(n, pa.string())),
                "tag": cols.get("tag", pa.nulls(n, pa.string())),
                "source": cols.get("source", pa.nulls(n, pa.string())),
                "geo": cols.get("geo", pa.nulls(n, GEO_TYPE)),
            }
            return pa.table(data, schema=EXTRACTION_SCHEMA)

        out += _extract_rows(
            batch,
            MATERIAL_PATTERN,
            lambda t, f: mk(t, "MATERIAL", name=f["material"], manufacturer=f["manufacturer"]),
        )
        out += _extract_rows(
            batch, PRODUCT_PATTERN, lambda t, f: mk(t, "PRODUCT_NO", name=f["product_no"])
        )
        out += _extract_rows(batch, UPC_PATTERN, lambda t, f: mk(t, "UPC", name=f["upc"]))

        def supplier_builder(t: pa.Table, f) -> pa.Table:
            arrs = [
                f[name].combine_chunks()
                if isinstance(f[name], pa.ChunkedArray) else f[name]
                for name in GEO_FIELDS
            ]
            geo = pa.StructArray.from_arrays(arrs, fields=list(GEO_TYPE))
            return mk(t, "SUPPLIER_GEO", manufacturer=f["supplier"], geo=geo)

        out += _extract_rows(batch, SUPPLIER_PATTERN, supplier_builder)

        def chem_builder(t: pa.Table, f) -> pa.Table:
            # unmatched optional CAS group comes back as "" -> null (M9 strip-to-None)
            cas = pc.if_else(pc.equal(f["cas"], ""), pa.nulls(len(f["cas"]), pa.string()), f["cas"])
            return mk(t, "CHEMICAL", name=f["name"], cas=cas,
                      composition=f["pct"], tag=f["tag"], source=f["source"])

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
        rows = {k: [] for k in ("conv_id", "turn_idx", "name", "cas", "composition", "tag", "source")}
        for c, t, text in zip(conv, tidx, texts):
            for m in cre.finditer(text or ""):
                rows["conv_id"].append(c)
                rows["turn_idx"].append(t)
                rows["name"].append(m.group("name"))
                rows["cas"].append(m.group("cas") or None)
                rows["composition"].append(m.group("pct"))
                rows["tag"].append(m.group("tag"))
                rows["source"].append(m.group("source"))
        n = len(rows["conv_id"])
        return pa.table(
            {
                "conv_id": pa.array(rows["conv_id"], pa.string()),
                "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
                "kind": pa.array(["CHEMICAL"] * n, pa.string()),
                "name": pa.array(rows["name"], pa.string()),
                "manufacturer": pa.nulls(n, pa.string()),
                "cas": pa.array(rows["cas"], pa.string()),
                "composition": pa.array(rows["composition"], pa.string()),
                "tag": pa.array(rows["tag"], pa.string()),
                "source": pa.array(rows["source"], pa.string()),
                "geo": pa.nulls(n, GEO_TYPE),
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
