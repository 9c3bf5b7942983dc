"""Delta + varbyte codec for posting blocks — vectorized numpy.

Varbyte convention: little-endian base-128; the high bit of a byte is set
when MORE bytes follow (so a value < 128 is a single byte with high bit 0).

Encode and decode are fully vectorized: the loops below iterate over *byte
positions* (<= 10 for uint64), never over values.
"""

from __future__ import annotations

import numpy as np


def varbyte_encode_with_lengths(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a 1-D array of non-negative ints; returns ``(bytes_u8, nbytes)``
    where ``bytes_u8`` is the concatenated uint8 stream and ``nbytes[i]`` is
    the encoded length of value i — the per-value lengths let a caller slice
    the stream at arbitrary value boundaries without re-encoding (used by the
    merge stage to cut per-term posting blocks out of one whole-partition
    encode pass)."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    # bytes needed per value
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    cur = v.copy()
    remaining = nbytes.copy()
    offset = np.zeros(n, dtype=np.int64)
    while True:
        mask = remaining > 0
        if not mask.any():
            break
        payload = (cur[mask] & np.uint64(0x7F)).astype(np.uint8)
        more = (remaining[mask] > 1).astype(np.uint8)
        out[starts[mask] + offset[mask]] = payload | (more << 7)
        cur[mask] >>= np.uint64(7)
        offset[mask] += 1
        remaining[mask] -= 1
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints to varbyte bytes."""
    out, _ = varbyte_encode_with_lengths(values)
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    n = len(ends)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (b & np.uint8(0x7F)).astype(np.uint64)
    vals = np.zeros(n, dtype=np.uint64)
    maxlen = int((ends - starts).max()) + 1
    for k in range(maxlen):
        idx = starts + k
        mask = idx <= ends
        vals[mask] |= payload[idx[mask]] << np.uint64(7 * k)
    return vals


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """Gaps of a strictly-increasing int array (first element kept as-is)."""
    v = np.asarray(sorted_values, dtype=np.int64)
    if len(v) == 0:
        return v.astype(np.uint64)
    out = np.empty(len(v), dtype=np.uint64)
    out[0] = np.uint64(v[0])
    if len(v) > 1:
        out[1:] = np.diff(v).astype(np.uint64)
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode → int64 strictly-increasing array."""
    g = np.asarray(gaps, dtype=np.uint64)
    if len(g) == 0:
        return g.astype(np.int64)
    return np.cumsum(g.astype(np.int64))


def encode_doc_block(doc_ids: np.ndarray) -> bytes:
    """delta + varbyte for one sorted doc-id block."""
    return varbyte_encode(delta_encode(doc_ids))


def decode_doc_block(buf: bytes) -> np.ndarray:
    return delta_decode(varbyte_decode(buf))


def binary_column_payload(col) -> np.ndarray:
    """Concatenated cell payloads of an Arrow binary/string column as a uint8
    view — zero copy per chunk.  By the Arrow layout, cell i occupies
    ``data[offsets[i]:offsets[i+1]]``, so the row-order concatenation of all
    cells is exactly ``data[offsets[0]:offsets[n]]`` (no per-cell Python
    objects, unlike ``b"".join(col.to_pylist())``).  Used by the posting
    block decoder and the resume fingerprints."""
    import pyarrow as pa

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts: list[np.ndarray] = []
    for c in chunks:
        if len(c) == 0:
            continue
        offs = np.frombuffer(c.buffers()[1], dtype=np.int32, count=c.offset + len(c) + 1)
        data = (
            np.frombuffer(c.buffers()[2], dtype=np.uint8)
            if c.buffers()[2] is not None
            else np.zeros(0, np.uint8)
        )
        parts.append(data[offs[c.offset] : offs[c.offset + len(c)]])
    if not parts:
        return np.zeros(0, dtype=np.uint8)
    return parts[0] if len(parts) == 1 else np.concatenate(parts)
