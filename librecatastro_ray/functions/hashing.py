"""Stable hashing utilities.

- ``sha256_batch``: per-row content sha256 (the row invariant from
  BASELINE.json input_hint; analogue of the reference's canonical
  deterministic JSON serialization, reference:
  src/librecatastro/domain/cadaster_entry/cadaster_entry.py:37-44).
- ``term_hash``: stable 63-bit term hash used ONLY for term partitioning
  (never persisted as identity) — md5-based so it is stable across
  processes/machines (Python's builtin hash() is salted per process).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def sha256_hex(s: str | bytes) -> str:
    if isinstance(s, str):
        s = s.encode("utf-8")
    return hashlib.sha256(s).hexdigest()


def sha256_batch(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """sha256 hex of each string in a column (null → sha of empty string,
    matching DuckDB's sha256(coalesce(x, '')))."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = []
    for v in arr:
        s = v.as_py()
        out.append(hashlib.sha256(("" if s is None else s).encode("utf-8")).hexdigest())
    return pa.array(out, pa.string())


_TERM_HASH_CACHE: dict[str, int] = {}


def term_hash(term: str) -> int:
    """Stable 63-bit hash of a term (md5 prefix)."""
    h = _TERM_HASH_CACHE.get(term)
    if h is None:
        h = int.from_bytes(hashlib.md5(term.encode("utf-8")).digest()[:8], "little") & 0x7FFFFFFFFFFFFFFF
        if len(_TERM_HASH_CACHE) < 1_000_000:
            _TERM_HASH_CACHE[term] = h
    return h


def term_hashes(terms: np.ndarray) -> np.ndarray:
    """Vectorized-ish stable hash of an array of terms.

    Hashes each *unique* term once (Zipf vocabularies make uniques ≪ tokens)
    and broadcasts via inverse indices.
    """
    uniq, inv = np.unique(np.asarray(terms, dtype=object), return_inverse=True)
    hu = np.fromiter((term_hash(t) for t in uniq), dtype=np.int64, count=len(uniq))
    return hu[inv]
