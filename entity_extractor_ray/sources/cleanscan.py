"""Metadata-clean parquet scans.

Parquet files written through pandas embed a ``b'pandas'`` schema-metadata
blob (the driver-generated testdata tables carry it). A ``pa.Schema`` whose
metadata is non-empty is UNHASHABLE (``hash()`` raises ``unhashable type:
'dict'``), which defeats Ray Data's schema-dedup fast path inside every
downstream sort/hash exchange — the ``Failed to hash the schemas (for
deduplication)`` warnings in the round-3 bench tail came from
``HashShuffleAggregator`` and sort-reduce workers concatenating scan blocks
that still carried the blob. Stripping it at the scan is a zero-copy schema
swap that fuses into the read task.
"""

from __future__ import annotations

import pyarrow as pa


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(paths, **kwargs):
    """ray.data.read_parquet with file-embedded schema metadata stripped.
    Accepts the same kwargs (columns=, filter=, ... — pushdowns are applied
    by read_parquet itself, before the strip map fuses onto the read)."""
    import ray.data as rd

    return rd.read_parquet(paths, **kwargs).map_batches(
        strip_schema_metadata, batch_format="pyarrow"
    )
