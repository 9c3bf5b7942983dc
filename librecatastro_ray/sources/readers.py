"""Shared Ray Data parquet read helper.

The driver's testdata parquet files carry ``pandas`` schema metadata whose
dict-valued entries make ``pa.Schema`` UNHASHABLE — Ray Data's per-batch
schema deduplication (``unify_schemas``) then logs a warning and falls back
to full unification on every batch of every stage that reads them.  Passing
an explicit, metadata-stripped schema to ``read_parquet`` restores hashable
schemas (and kills the log noise) at zero cost.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def _one_parquet_file(path) -> str | None:
    if isinstance(path, (list, tuple)):
        return path[0] if path else None
    if not os.path.isdir(path):
        return path
    for root, _dirs, files in sorted(os.walk(path)):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    return None


def read_parquet_clean(
    path: str, columns: list[str] | None = None, **kwargs
) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with a metadata-stripped explicit schema
    (restricted to ``columns`` when given — the pushdown still prunes at the
    read)."""
    import pyarrow.parquet as pq

    f = _one_parquet_file(path)
    schema = None
    if f is not None and os.path.exists(f):
        full = pq.read_schema(f)
        names = columns if columns is not None else full.names
        schema = pa.schema([pa.field(c, full.field(c).type) for c in names])
    return ray.data.read_parquet(path, columns=columns, schema=schema, **kwargs)
