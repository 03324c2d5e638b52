"""Metadata-clean parquet scans.

Parquet files written through pandas embed a ``b'pandas'`` schema-metadata
blob (the driver-generated testdata tables carry it). A ``pa.Schema`` whose
metadata is non-empty is UNHASHABLE (``hash()`` raises ``unhashable type:
'dict'``), which defeats Ray Data's schema-dedup fast path inside every
downstream sort/hash exchange — the ``Failed to hash the schemas (for
deduplication)`` warnings in the round-3 bench tail came from
``HashShuffleAggregator`` and sort-reduce workers concatenating scan blocks
that still carried the blob.

Round 4: stripping INSIDE the read matters too — when Ray splits a
single-file read (``ReadParquet->SplitBlocks(n)``), the split path unifies
the raw fragment schemas BEFORE any fused map runs, so the strip map alone
still left one warning per read task. The fix is to hand ``read_parquet``
an explicit metadata-free ``schema`` (projected to ``columns`` when given)
for SINGLE-FILE paths — the case the warnings came from, and the only case
where one footer is authoritative. Multi-file dirs keep the bare read (its
fragment-schema unification is a feature) + the fused strip map.
"""

from __future__ import annotations

import pyarrow as pa

_FALLBACK_LOGGED = False  # log the schema-derivation fallback once per proc


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def _single_parquet(paths) -> str | None:
    """The one case where deriving an explicit schema is SOUND: a single
    .parquet file path. Multi-file dirs/lists keep the bare read (fragment
    schemas may legitimately disagree and read_parquet unifies them; the
    fused strip map still cleans the metadata — review finding: an
    explicit first-footer schema would turn a benign disagreement into a
    read-time failure)."""
    if isinstance(paths, (list, tuple)):
        if len(paths) != 1:
            return None
        paths = paths[0]
    if not isinstance(paths, str):
        return None
    import os

    return paths if paths.endswith(".parquet") and os.path.isfile(paths) else None


def read_parquet_clean(paths, **kwargs):
    """ray.data.read_parquet with file-embedded schema metadata stripped.
    Accepts the same kwargs (columns=, filter=, ... — pushdowns are applied
    by read_parquet itself). When the caller gave no ``schema``, a clean one
    is derived from the first footer so even the intra-read SplitBlocks
    schema unification sees hashable schemas."""
    import ray.data as rd

    if "schema" not in kwargs:
        try:
            import pyarrow.parquet as pq

            f = _single_parquet(paths)
            if f is not None:
                full = pq.read_schema(f).remove_metadata()
                cols = kwargs.get("columns")
                kwargs["schema"] = (
                    pa.schema([full.field(c) for c in cols]) if cols else full
                )
        except (KeyError, pa.ArrowInvalid, OSError):
            # expected footer/projection failures only (ADVICE r4: a blanket
            # except would hide genuine schema-derivation bugs): KeyError =
            # a `columns` name absent from the footer, ArrowInvalid/OSError =
            # unreadable/corrupt footer. Fall back to the bare read + fused
            # strip (correct, just noisier) — and say so once.
            global _FALLBACK_LOGGED
            if not _FALLBACK_LOGGED:
                import logging

                logging.getLogger("entity_extractor_ray.cleanscan").warning(
                    "read_parquet_clean: explicit-schema derivation failed for"
                    " %s; falling back to bare read + strip map", paths,
                )
                _FALLBACK_LOGGED = True
            kwargs.pop("schema", None)

    return rd.read_parquet(paths, **kwargs).map_batches(
        strip_schema_metadata, batch_format="pyarrow"
    )
