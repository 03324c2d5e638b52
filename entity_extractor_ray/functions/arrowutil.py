"""Small Arrow helpers shared across stages and pipelines.

``rename_agg`` exists because ``pa.TableGroupBy(...).aggregate(...)
.rename_columns([...])`` silently assumes the aggregate emits group keys
FIRST (true in pyarrow 16.1, but this ordering has differed across pyarrow
versions — ADVICE r4): a pyarrow upgrade could mislabel columns and corrupt
a rollup without erroring. Selecting BY NAME is version-proof and also
fixes the output column order explicitly.
"""

from __future__ import annotations

import pyarrow as pa


def rename_agg(agg: pa.Table, mapping: dict) -> pa.Table:
    """Rebuild an aggregate output table BY NAME: ``mapping`` is an ordered
    ``{source_column: output_name}`` dict; raises KeyError loudly if the
    aggregate did not produce a named column (instead of silently
    mislabeling it, as a positional rename would)."""
    return pa.table({out: agg.column(src) for src, out in mapping.items()})
