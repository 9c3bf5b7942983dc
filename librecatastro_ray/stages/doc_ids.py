"""Upsert-by-key dedup + deterministic dense doc-id assignment.

Dedup reproduces the reference's upsert-by-primary-key semantics ("last writer
wins" per doc, reference: src/librecatastro/domain/cadaster_entry/
cadaster_entry.py:53 — ``es.index(..., id=self.cadaster)``).  A static Parquet
corpus has no arrival order, so the winner per (repo, path) key is pinned to a
deterministic total order: the row with the lexicographically greatest
sha256(content).  Implemented as bucketed groupby (hash(repo,path) % B) so no
single group is the whole dataset.

Doc ids are dense int64 assigned from the global sort order of (repo, path)
— the engine's one global sort (SURVEY.md §2.F F2: the reference's
deterministic alphabetical iteration order).  The assignment depends only on
the data, never on parallelism: after the sort, each block's first key is
fetched (metadata-sized work), blocks are ordered by first key, and per-block
offsets are the cumulative row counts.  Ids are attached by per-block Ray
tasks; the driver only ever handles per-block metadata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from librecatastro_ray.functions.hashing import key_bucket, sha256_batch


class AddShaAndBucket:
    """map_batches: append sha256(content) and the dedup bucket."""

    def __init__(self, n_buckets: int):
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        sha = sha256_batch(batch["content"])
        bucket = key_bucket(batch["repo"], batch["path"], self.n_buckets)
        return batch.append_column("sha256", sha).append_column(
            "_bucket", pa.array(bucket, pa.int64())
        )


def _dedup_group(group: pa.Table) -> pa.Table:
    """Within one bucket: keep exactly one row per (repo, path) — the row with
    the greatest sha256 (deterministic winner)."""
    order = pa.compute.sort_indices(
        group,
        sort_keys=[("repo", "ascending"), ("path", "ascending"), ("sha256", "ascending")],
    )
    g = group.take(order)
    repo = np.asarray(g["repo"])
    path = np.asarray(g["path"])
    n = len(g)
    if n == 0:
        return g
    # last row of each (repo, path) run wins (sha ascending → last = max sha)
    is_last = np.ones(n, dtype=bool)
    same = (repo[:-1] == repo[1:]) & (path[:-1] == path[1:])
    is_last[:-1] = ~same
    return g.filter(pa.array(is_last))


def dedup_latest(ds: ray.data.Dataset, n_buckets: int = 64) -> ray.data.Dataset:
    """keep-one-per-(repo,path) over the whole corpus (G1 in SURVEY.md §2.G)."""
    ds = ds.map_batches(
        AddShaAndBucket,
        fn_constructor_kwargs={"n_buckets": n_buckets},
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 8),
    )
    ds = ds.groupby("_bucket").map_groups(_dedup_group, batch_format="pyarrow")
    return ds.drop_columns(["_bucket"])


@ray.remote
def _block_first_key(block: pa.Table) -> tuple[str, str, int]:
    if len(block) == 0:
        return ("", "", 0)
    return (block["repo"][0].as_py(), block["path"][0].as_py(), len(block))


@ray.remote
def _attach_ids(block: pa.Table, offset: int) -> pa.Table:
    ids = pa.array(np.arange(offset, offset + len(block), dtype=np.int64), pa.int64())
    return block.append_column("doc_id", ids)


def assign_doc_ids(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Global sort on (repo, path), then dense doc_id per row.

    Returns a new Dataset with a ``doc_id`` int64 column.  Deterministic for a
    given corpus regardless of block layout or parallelism.
    """
    ds = ds.sort(["repo", "path"])
    mat = ds.materialize()
    block_refs: list = []
    for bundle in mat.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    if not block_refs:
        return mat
    keys = ray.get([_block_first_key.remote(r) for r in block_refs])
    # order blocks by their first (repo, path); sort output blocks are key
    # ranges, so this reconstructs the global order without moving data
    order = sorted(range(len(block_refs)), key=lambda i: (keys[i][0], keys[i][1]))
    counts = [keys[i][2] for i in order]
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    new_refs = [
        _attach_ids.remote(block_refs[i], int(off)) for i, off in zip(order, offsets)
    ]
    return ray.data.from_arrow_refs(new_refs)
