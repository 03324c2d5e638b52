"""CSV / JSONL source connectors with ingest-time schema casting.

The reference ingests from whatever lands in the folder (PDF/DOC via S3/S5,
MIME-gated at file_analysis_service.py:300-307) and validates the request
shape before work starts (M14, processors/queue.py:43-51). The engine's
tabular analog: every non-Parquet source streams through
``ray.data.read_csv`` / ``read_json`` (block-parallel, predicate/column
pruning at the read where the format allows) and is CAST to the declared
Arrow schema before any stage sees it — a loud failure at the boundary
instead of a type surprise ten stages later.

The deterministic exporters exist for tests/queries only (they derive the
fixture from the driver's parquet tables — no external data); a real
deployment points the readers at its own files.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def cast_to_schema(ds, schema: pa.Schema):
    """Strict ingest cast (M14 analog): reorder + cast every batch to the
    declared schema; raises loudly on incompatible values/columns."""

    def cast(t: pa.Table) -> pa.Table:
        return t.select(schema.names).cast(schema)

    return ds.map_batches(cast, batch_format="pyarrow")


# ------------------------------------------------------------ deterministic fixtures

def export_documents_csv(sf_dir: str, out_path: str) -> str:
    """Write <sf_dir>/documents.parquet as ONE deterministic RFC-4180 CSV
    (sorted by doc_id, quotes doubled by the Arrow writer) — idempotent per
    (tier, path)."""
    if not os.path.exists(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        t = pq.read_table(f"{sf_dir}/documents.parquet")
        t = t.sort_by("doc_id")
        tmp = out_path + ".tmp"
        pacsv.write_csv(t, tmp)
        os.rename(tmp, out_path)
    return out_path


def export_documents_jsonl(sf_dir: str, out_path: str) -> str:
    """Write documents.parquet as deterministic JSON-lines (sorted by
    doc_id, non-ASCII preserved)."""
    if not os.path.exists(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        t = pq.read_table(f"{sf_dir}/documents.parquet").sort_by("doc_id")
        tmp = out_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for row in t.to_pylist():
                f.write(json.dumps(row, ensure_ascii=False) + "\n")
        os.rename(tmp, out_path)
    return out_path


# ------------------------------------------------------------ readers

def read_documents_csv(path: str):
    """documents over CSV: explicit column types (never schema inference on
    a 100-TB corpus — a late file with an all-null column must not flip the
    type), newline-in-quotes enabled, cast to the canonical schema."""
    import ray.data as rd

    convert = pacsv.ConvertOptions(
        column_types={f.name: f.type for f in DOCUMENTS_SCHEMA}
    )
    parse = pacsv.ParseOptions(newlines_in_values=True)
    ds = rd.read_csv(path, convert_options=convert, parse_options=parse)
    return cast_to_schema(ds, DOCUMENTS_SCHEMA)


def read_documents_jsonl(path: str):
    import ray.data as rd

    ds = rd.read_json(path)
    return cast_to_schema(ds, DOCUMENTS_SCHEMA)
