"""Small Arrow helpers shared across stages and pipelines.

``rename_agg`` exists because ``pa.TableGroupBy(...).aggregate(...)
.rename_columns([...])`` silently assumes the aggregate emits group keys
FIRST (true in pyarrow 16.1, but this ordering has differed across pyarrow
versions — ADVICE r4): a pyarrow upgrade could mislabel columns and corrupt
a rollup without erroring. Selecting BY NAME is version-proof and also
fixes the output column order explicitly.
"""

from __future__ import annotations

import binascii

import numpy as np
import pyarrow as pa


def hex_to_bin(col) -> pa.Array:
    """32-char-hex stable_id column -> 16-byte binary column.

    Exchange-payload codec (round-5 scaling work): a stable_id column is the
    dominant payload of the edges / rollup / status-fold shuffles; its binary
    form is 20 bytes/row (16 data + 4 offset) vs 36 as hex string. Vectorized:
    one unhexlify over the concatenated values buffer — no per-row Python.
    Raises on nulls or any value that is not exactly 32 hex chars (the
    stable_id invariant), so a mis-routed column fails loudly."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.array([], pa.binary())
    if col.null_count:
        raise ValueError("hex_to_bin: nulls in stable-id column")
    off = np.frombuffer(col.buffers()[1], np.int32)[col.offset : col.offset + n + 1]
    if not ((off[1:] - off[:-1]) == 32).all():
        raise ValueError("hex_to_bin: non-32-char value in stable-id column")
    data = col.buffers()[2].to_pybytes()[off[0] : off[-1]]
    raw = binascii.unhexlify(data)
    new_off = pa.py_buffer(np.arange(0, 16 * (n + 1), 16, dtype=np.int32).tobytes())
    return pa.Array.from_buffers(pa.binary(), n, [None, new_off, pa.py_buffer(raw)])


def try_hex_to_bin(col):
    """hex_to_bin when the column is a pure stable-id column, else None (the
    caller keeps the string form). For stages whose id columns are stable
    ids in every engine pipeline but whose public API accepts arbitrary
    string ids (the status fold, the rollup). The decision is per batch but
    content-homogeneous sources (every real dataset) decide uniformly; a
    genuinely mixed id column would produce divergent batch schemas and fail
    loudly in the downstream sort/union rather than corrupt anything."""
    try:
        return hex_to_bin(col)
    except (ValueError, binascii.Error):
        return None


def bin_to_hex(col) -> pa.Array:
    """Inverse of hex_to_bin: 16-byte binary column -> 32-char-hex string
    column (the engine's public id form). Vectorized via one hexlify."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.array([], pa.string())
    if col.null_count:
        raise ValueError("bin_to_hex: nulls in stable-id column")
    off = np.frombuffer(col.buffers()[1], np.int32)[col.offset : col.offset + n + 1]
    if not ((off[1:] - off[:-1]) == 16).all():
        raise ValueError("bin_to_hex: non-16-byte value in stable-id column")
    data = col.buffers()[2].to_pybytes()[off[0] : off[-1]]
    hx = binascii.hexlify(data)
    new_off = pa.py_buffer(np.arange(0, 32 * (n + 1), 32, dtype=np.int32).tobytes())
    return pa.Array.from_buffers(
        pa.string(), n, [None, new_off, pa.py_buffer(hx)]
    )


def rename_agg(agg: pa.Table, mapping: dict) -> pa.Table:
    """Rebuild an aggregate output table BY NAME: ``mapping`` is an ordered
    ``{source_column: output_name}`` dict; raises KeyError loudly if the
    aggregate did not produce a named column (instead of silently
    mislabeling it, as a positional rename would)."""
    return pa.table({out: agg.column(src) for src, out in mapping.items()})
