"""Targeted suppression of one content-free Ray Data log line.

Ray's sort-based ``groupby``/``map_groups``/``sort`` emits a ZERO-COLUMN
empty block for every reduce partition that received no rows (with K hash
buckets distributed over N>K sort partitions, N-K partitions are empty by
construction), and map operators forward empty blocks WITHOUT invoking the
UDF — verified against ray 2.49.2 sources: ``grouped_data.map_groups`` is
``sort + _map_batches_without_batch_size_validation`` whose batcher yields
no batch for a zero-row block, so no user kernel can ever give these filler
blocks a schema. The streaming executor then warns::

    Operator produced a RefBundle with a different schema than the previous
    one. Previous schema: <cols>, new schema: . This may lead to ...

for every such filler bundle. Every kernel in this repo returns its declared
schema on the empty path (typed ``pa.table``/``schema.empty_table()``), so
the only remaining source of the warning is Ray's own filler blocks; this
filter drops EXACTLY that variant — the message where the NEW schema prints
empty — and keeps any real divergence (two non-empty schemas) loud.

The sibling warning ``Failed to hash the schemas (for deduplication)`` is
fixed for real, not filtered: parquet-embedded pandas metadata made
``pa.Schema`` unhashable, and ``shuffle._add_bucket`` now strips schema
metadata before every bucket exchange.
"""

from __future__ import annotations

import logging

_EXECUTOR_LOGGER = "ray.data._internal.execution.streaming_executor_state"


class EmptyFillerSchemaFilter(logging.Filter):
    """Drop the 'different schema' warning ONLY when the new schema is the
    empty filler (prints as nothing: 'new schema: . This may lead')."""

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        if "produced a RefBundle with a different schema" not in msg:
            return True
        return not (
            # arrow filler: zero-column schema prints as nothing
            "new schema: . This may lead" in msg
            # pandas filler: empty PandasBlockSchema
            or "new schema: PandasBlockSchema(names=[], types=[]). This may lead"
            in msg
        )


def install_empty_schema_filter() -> None:
    """Idempotent install on the streaming-executor logger (driver side)."""
    lg = logging.getLogger(_EXECUTOR_LOGGER)
    if not any(isinstance(f, EmptyFillerSchemaFilter) for f in lg.filters):
        lg.addFilter(EmptyFillerSchemaFilter())
