"""Upsert-by-key dedup + deterministic dense doc-id assignment — one shuffle.

Dedup reproduces the reference's upsert-by-primary-key semantics ("last writer
wins" per doc, reference: src/librecatastro/domain/cadaster_entry/
cadaster_entry.py:53 — ``es.index(..., id=self.cadaster)``).  A static Parquet
corpus has no arrival order, so the winner per (repo, path) key is pinned to a
deterministic total order: the row with the lexicographically greatest
sha256(content).

Both dedup and id assignment ride ONE global sort on (repo, path, sha256) —
after the sort, duplicate keys are adjacent, so dedup is a per-block
keep-last-of-run filter (with the next block's first key resolving runs that
span a block boundary).  Ids are dense int64 in sorted (repo, path) order
(SURVEY.md §2.F F2: the reference's deterministic alphabetical iteration) and
depend only on the data, never on parallelism: the driver handles only
per-block metadata (first keys + kept counts); blocks are filtered and
id-stamped by per-block Ray tasks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from librecatastro_ray.functions.hashing import sha256_batch


class AddSha:
    """map_batches: append sha256(content) (the row-invariant column)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column("sha256", sha256_batch(batch["content"]))


@ray.remote
def _block_first_key(block: pa.Table) -> tuple[str, str, str, int]:
    if len(block) == 0:
        return ("", "", "", 0)
    return (
        block["repo"][0].as_py(),
        block["path"][0].as_py(),
        block["sha256"][0].as_py(),
        len(block),
    )


@ray.remote(num_returns=2)
def _dedup_block(block: pa.Table, next_key: tuple[str, str] | None):
    """Keep the last row of each (repo, path) run (sha asc → last = max sha).
    The run that reaches the end of the block also loses its last row when the
    NEXT block starts with the same key."""
    n = len(block)
    if n == 0:
        return block, 0
    repo = np.asarray(block["repo"])
    path = np.asarray(block["path"])
    keep = np.ones(n, dtype=bool)
    same = (repo[:-1] == repo[1:]) & (path[:-1] == path[1:])
    keep[:-1] = ~same
    if next_key is not None and repo[-1] == next_key[0] and path[-1] == next_key[1]:
        keep[-1] = False
    out = block.filter(pa.array(keep))
    return out, len(out)


@ray.remote
def _attach_ids(block: pa.Table, offset: int) -> pa.Table:
    ids = pa.array(np.arange(offset, offset + len(block), dtype=np.int64), pa.int64())
    return block.append_column("doc_id", ids)


def dedup_and_assign_ids(ds: ray.data.Dataset) -> tuple[ray.data.Dataset, int]:
    """sha256 → one global sort (repo, path, sha256) → per-block dedup +
    dense doc_id.  Returns ``(dataset, n_docs)``; the dataset has sha256 and
    doc_id columns and at most one row per (repo, path)."""
    ds = ds.map_batches(AddSha, batch_format="pyarrow", batch_size=512, concurrency=(1, 8))
    ds = ds.sort(["repo", "path", "sha256"])
    mat = ds.materialize()
    block_refs: list = []
    for bundle in mat.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    if not block_refs:
        return mat, 0
    keys = ray.get([_block_first_key.remote(r) for r in block_refs])
    # order blocks by first (repo, path, sha) — sort output blocks are key
    # ranges, so this reconstructs the global order from metadata alone
    order = [i for i in sorted(range(len(block_refs)), key=lambda i: keys[i][:3]) if keys[i][3] > 0]
    # next non-empty block's first (repo, path) resolves runs spanning blocks
    next_keys: list[tuple[str, str] | None] = []
    for j, i in enumerate(order):
        nk = None
        if j + 1 < len(order):
            k = keys[order[j + 1]]
            nk = (k[0], k[1])
        next_keys.append(nk)
    deduped, count_refs = [], []
    for i, nk in zip(order, next_keys):
        t_ref, c_ref = _dedup_block.remote(block_refs[i], nk)
        deduped.append(t_ref)
        count_refs.append(c_ref)
    counts = ray.get(count_refs)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    new_refs = [
        _attach_ids.remote(t, int(off)) for t, off in zip(deduped, offsets)
    ]
    return ray.data.from_arrow_refs(new_refs), int(sum(counts))
