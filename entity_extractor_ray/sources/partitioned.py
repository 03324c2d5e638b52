"""Hive-style column-partitioned Parquet layout: partitioned write,
partition-pruned read, and small-file compaction.

The data-lake layout discipline the task contract's "resumable output"
rule implies, as USER-facing operators (the KG sinks already shard
internally — state/checkpoint.py): one directory per partition value
(``col=value/``), so a reader that wants one partition touches ONLY that
directory's files — pruning happens at the PATH level, before any footer
or row group is opened, which at 100 TB is the difference between
listing one directory and scanning a corpus. Each partition commits a
``_SUCCESS`` manifest LAST (tmp + rename, the checkpoint.py discipline),
so a killed write resumes by rewriting only partitions without one.

``compact_dir`` is the maintenance half: streaming pipelines and
resumable shards accumulate many small files whose per-file footer +
task overhead eventually dominates reads; compaction rewrites a
directory into ~target_rows files (a read + repartition + write — no
driver materialization) and commits last.

Reference parity note: the reference's blob writer commits one artifact
per document with no layout management (artifact_ingestor_service.py);
partition layout/compaction has no analog there — this is the Ray-Data
engine's own storage hygiene surface.
"""

from __future__ import annotations

import glob as _glob
import os

import pyarrow as pa
import pyarrow.compute as pc

from .cleanscan import read_parquet_clean


def _partition_values(ds, col: str) -> list:
    """Distinct partition values via a per-batch distinct pre-reduce (one
    tiny row set per batch crosses to the driver — dimension-sized)."""
    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(t.column(col))})

    rows = ds.map_batches(uniq, batch_format="pyarrow").take_all()
    return sorted({r[col] for r in rows})


def write_partitioned_by(ds, col: str, out_dir: str) -> list:
    """Write ``ds`` as ``out_dir/col=value/*.parquet`` with a per-partition
    ``_SUCCESS`` committed last; partitions that already carry one are
    SKIPPED (resume). Returns the partition values written or found.

    Each partition's rows are selected by a map-side filter over the
    source — k partitions cost k filtered passes, the price of exact
    directory layout without a shuffle; for high-cardinality partition
    columns use the engine's hash-sharded sinks instead (the same rule
    Hive tables follow: partition columns are LOW-cardinality)."""
    values = _partition_values(ds, col)
    for v in values:
        pdir = os.path.join(out_dir, f"{col}={v}")
        if os.path.exists(os.path.join(pdir, "_SUCCESS")):
            continue
        # uncommitted partition: clear stale files from the killed attempt
        # first — write_parquet appends new files, it does not replace
        for f in _glob.glob(os.path.join(pdir, "*.parquet")):
            os.remove(f)
        part = ds.filter(expr=f"{col} == {v!r}" if isinstance(v, str)
                         else f"{col} == {v}")
        part.write_parquet(pdir)
        tmp = os.path.join(pdir, "_SUCCESS.tmp")
        with open(tmp, "w") as f:
            f.write("")
        os.replace(tmp, os.path.join(pdir, "_SUCCESS"))
    return values


def read_partition(out_dir: str, col: str, value, columns=None):
    """Read ONE partition by path — no other directory is listed or
    opened. Refuses to read an uncommitted (no ``_SUCCESS``) partition."""
    pdir = os.path.join(out_dir, f"{col}={value}")
    if not os.path.exists(os.path.join(pdir, "_SUCCESS")):
        raise FileNotFoundError(
            f"partition {col}={value} has no _SUCCESS manifest in {out_dir}"
        )
    files = sorted(_glob.glob(os.path.join(pdir, "*.parquet")))
    return read_parquet_clean(files, columns=columns)


def compact_dir(in_dir: str, out_dir: str, target_rows: int = 1_000_000) -> int:
    """Rewrite a directory of (many, small) Parquet files into
    ~``target_rows``-row files: read -> repartition to the computed file
    count -> write, committed by a _SUCCESS last. Streaming end to end —
    only per-file row counts (metadata) cross the driver. Returns the
    output file count."""
    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(in_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {in_dir}")
    n_rows = sum(pq.read_metadata(f).num_rows for f in files)
    n_out = max(1, -(-n_rows // target_rows))
    ds = read_parquet_clean(files)
    ds.repartition(n_out).write_parquet(out_dir)
    tmp = os.path.join(out_dir, "_SUCCESS.tmp")
    with open(tmp, "w") as f:
        f.write("")
    os.replace(tmp, os.path.join(out_dir, "_SUCCESS"))
    return len(sorted(_glob.glob(os.path.join(out_dir, "*.parquet"))))
