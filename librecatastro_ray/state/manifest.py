"""Index manifest + per-partition checkpoints.

The index is files + a manifest; no daemons.  This reproduces the reference's
index lifecycle (create/delete DDL, reference: src/utils/elasticsearch_utils.py:20-98)
and its two resume mechanisms — upsert idempotence and the anti-join skip of
already-scraped work (reference: src/librecatastro/domain/cadaster_entry/
cadaster_entry.py:53; src/utils/elasticsearch_utils.py:100-136) — as:

- atomic per-partition outputs (write temp file + os.replace), so retried
  tasks never expose partial writes;
- one JSON checkpoint per term partition carrying lineage (input files + row
  counts) and build metrics (rows, terms, bytes, duration);
- resume = anti-join of the partition work list against completed checkpoints.

Layout of an index directory:
    manifest.json            global: config, N, avgdl, hot terms, partitions
    docs/*.parquet           doc_id, repo, path, commit, lang, content, sha256, dl
    shuffle/skey=*/          phase-1 partitioned flat postings (build scratch)
    parts/blocks-{p}-{s}.parquet   encoded posting blocks per (partition, salt)
    parts/dict-{p}-{s}.parquet     term dictionary per (partition, salt)
    checkpoints/part-{skey}.json   per-partition checkpoint
"""

from __future__ import annotations

# bumped whenever the on-disk index layout/schema changes; cached index
# directories from other versions must be rebuilt, not read
INDEX_FORMAT_VERSION = 2

import json
import os
import tempfile
from typing import Any

MANIFEST_NAME = "manifest.json"


def atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def atomic_write_bytes(path: str, data: bytes) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def checkpoint_path(index_dir: str, skey: int) -> str:
    return os.path.join(index_dir, "checkpoints", f"part-{skey:06d}.json")


def load_checkpoint(index_dir: str, skey: int) -> dict | None:
    p = checkpoint_path(index_dir, skey)
    if not os.path.exists(p):
        return None
    try:
        return read_json(p)
    except (json.JSONDecodeError, OSError):
        return None


def completed_partitions(index_dir: str) -> dict[int, dict]:
    """All valid per-partition checkpoints (the 'done' set for the resume
    anti-join)."""
    ckdir = os.path.join(index_dir, "checkpoints")
    out: dict[int, dict] = {}
    if not os.path.isdir(ckdir):
        return out
    for name in sorted(os.listdir(ckdir)):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        skey = int(name[len("part-") : -len(".json")])
        ck = load_checkpoint(index_dir, skey)
        if ck is None:
            continue
        # a checkpoint is valid only if its declared outputs exist
        ok = all(os.path.exists(os.path.join(index_dir, rel)) for rel in ck.get("outputs", []))
        if ok:
            out[skey] = ck
    return out


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST_NAME)


def load_manifest(index_dir: str) -> dict:
    return read_json(manifest_path(index_dir))


def save_manifest(index_dir: str, manifest: dict) -> None:
    atomic_write_json(manifest_path(index_dir), manifest)


def deleted_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deleted", "deleted.parquet")


def load_deleted(index_dir: str):
    """Sorted unique int64 array of tombstoned doc ids (empty if none)."""
    import numpy as np

    path = deleted_path(index_dir)
    if not os.path.exists(path):
        return np.zeros(0, dtype=np.int64)
    import pyarrow.parquet as pq

    return pq.read_table(path)["doc_id"].to_numpy().astype(np.int64)


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone documents by id (ES DELETE /index/_doc/{id} analogue,
    reference: the delete-ignoring-404 lifecycle in elasticsearch_utils.py:85-98).

    Lucene-faithful semantics: deleted docs stop appearing in ANY query
    result (hits, counts, hydrate) immediately, but corpus statistics
    (N, avgdl, per-term df) keep counting them until a rebuild — exactly
    Lucene's behavior for deletes before a segment merge.  Idempotent and
    accumulative; atomic tmp+rename write.  Returns the total tombstone
    count after the merge."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    merged = np.union1d(load_deleted(index_dir), ids)
    path = deleted_path(index_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(merged, pa.int64())}), tmp)
    os.replace(tmp, path)
    return int(len(merged))


def drop_index(index_dir: str) -> bool:
    """Idempotent index delete (the reference deletes ignoring 400/404,
    reference: src/utils/elasticsearch_utils.py:85-98)."""
    import shutil

    if not os.path.isdir(index_dir):
        return False
    shutil.rmtree(index_dir)
    return True
