"""REAL multimodal decode over opaque binary columns (SURVEY §2 A5).

PPM (P6) images and WAV (RIFF/PCM16) audio are container-free formats a
numpy-only environment can genuinely decode — no codec library needed — so
unlike the honestly-gated ``training.DecodeStub`` (which stands in for
PNG/JPEG/H.264, whose codecs are absent here), everything in this module is
a REAL decoder: byte-level header parsing, ``np.frombuffer`` payload
decode, and numeric feature kernels over the DECODED pixel / sample arrays.

Pipeline shape (the 100 TB design): binary payloads are an opaque
``binary`` column with typed metadata riding next to it; decode /
feature-extract / resize run as actor-pool ``map_batches`` stages with
SMALL batch sizes (payload bytes × batch_size × concurrency must fit a
worker heap — the same sizing rule a real image corpus needs).  Per-row
Python is confined to variable-length header parsing; all per-payload math
(channel sums, luma, nearest-neighbor resize, RMS energy, zero crossings)
is numpy over the decoded arrays.

The in-container stand-in for a real blob source (there is no binary column
in the driver's testdata) is :func:`multimodal_payloads`: a DETERMINISTIC
synthesizer keyed only on ``doc_id``, which is what lets the driver's
DuckDB oracle replay every decoded feature EXACTLY (integer generation rule
→ integer features; see ``__ray_entry__.oracle_sql``) — the same
replay-the-rule strategy the IVF oracle uses.

Reference analogue: ``scrapper.py:152-174`` (the base64 PNG picture
side-fetch attached to each cadaster record).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

# ---------------------------------------------------------------------------
# codecs (REAL, container-free)
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: np.ndarray) -> bytes:
    """Binary P6 PPM: ASCII header + raw interleaved RGB bytes."""
    if rgb.dtype != np.uint8 or rgb.size != width * height * 3:
        raise ValueError("rgb must be uint8 of size w*h*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb.tobytes()


def decode_ppm(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary P6 PPM → (width, height, (h, w, 3) uint8 array).
    Whitespace-tolerant header scan per the netpbm spec (no comments —
    loudly rejected rather than silently mis-parsed)."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval tokens separated by whitespace;
    # payload starts after the single whitespace byte following maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            raise ValueError("PPM comments not supported")
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    if width <= 0 or height <= 0:
        raise ValueError("non-positive PPM dimensions")
    n = width * height * 3
    if len(buf) - pos < n:
        raise ValueError("truncated PPM payload")
    pix = np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos)
    return width, height, pix.reshape(height, width, 3)


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """Minimal mono PCM16 RIFF/WAVE container."""
    if samples.dtype != np.int16:
        raise ValueError("samples must be int16")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE container → (sample_rate, int16 sample array).
    Walks the chunk list properly (fmt before data not assumed)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        chunk = buf[pos + 8 : pos + 8 + size]
        if len(chunk) < size:
            raise ValueError(f"truncated RIFF chunk {cid!r}")
        if cid == b"fmt ":
            if len(chunk) < 16:
                raise ValueError("torn fmt chunk")
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", chunk[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only mono PCM16 supported")
        elif cid == b"data":
            if size % 2:
                raise ValueError("odd-length PCM16 data chunk")
            data = chunk
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return rate, np.frombuffer(data, dtype=np.int16)


# PNG (REAL: stdlib zlib inflate + numpy per-scanline unfiltering — the one
# "codec" format that needs no codec library).  Reference analogue: the
# base64 PNG plan pictures the crawler side-fetches per record
# (reference: src/librecatastro/scrapping/scrapper.py:163-174).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized (ties resolve a, then b, per spec)."""
    p = a + b - c
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal real PNG writer: 8-bit RGB/RGBA, non-interlaced, one IDAT.
    ``filters`` picks the per-scanline filter type (0–4, default cycling
    r % 5 so every filter path is exercised); filtering is whole-row numpy
    (the reconstructed bytes are known, so every predictor vectorizes)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("img must be uint8 (h, w, 3|4)")
    h, w, c = img.shape
    if filters is None:
        filters = [r % 5 for r in range(h)]
    rows = img.astype(np.int32).reshape(h, w * c)
    prev = np.zeros(w * c, np.int32)
    lines = []
    for r in range(h):
        cur = rows[r]
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        upleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        ft = int(filters[r])
        if ft == 0:
            raw = cur
        elif ft == 1:  # Sub
            raw = cur - left
        elif ft == 2:  # Up
            raw = cur - prev
        elif ft == 3:  # Average
            raw = cur - ((left + prev) >> 1)
        elif ft == 4:  # Paeth
            raw = cur - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        lines.append(bytes([ft]) + (raw % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if c == 3 else 6, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))


def decode_png(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a real PNG → (width, height, channels, (h, w, c) uint8 array).

    Scope (loudly rejected otherwise): 8-bit depth, color types 2 (RGB) and
    6 (RGBA), non-interlaced — the shape the reference's plan pictures use.
    Chunk walk verifies every CRC; IDAT chunks are concatenated before the
    single zlib inflate (the spec allows any split).  Unfiltering: None/Up
    are whole-row numpy, Sub is a per-lane cumsum, Average/Paeth carry a
    genuine left-to-right dependency so they walk pixels (vectorized across
    channels) — per-row Python confined to the decode, as with the PPM/WAV
    decoders."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, meta, idat = 8, None, []
    while pos + 12 <= len(buf):
        (size,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + size]
        if len(data) != size or pos + 12 + size > len(buf):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", buf[pos + 8 + size : pos + 12 + size])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if depth != 8 or color not in (2, 6) or comp or filt or inter:
                raise ValueError("only 8-bit non-interlaced RGB/RGBA PNG supported")
            meta = (w, h, 3 if color == 2 else 4)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if meta is None or not idat:
        raise ValueError("missing IHDR or IDAT chunk")
    w, h, c = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline payload size mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for r in range(h):
        cur = rows[r, 1:].astype(np.int32)
        ft = int(rows[r, 0])
        if ft == 0:
            recon = cur
        elif ft == 1:  # Sub: recon[x] = raw[x] + recon[x-c]  → per-lane cumsum
            recon = (np.cumsum(cur.reshape(w, c).astype(np.int64), axis=0)
                     % 256).reshape(stride).astype(np.int32)
        elif ft == 2:  # Up
            recon = (cur + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: sequential in x, vector in c
            px = cur.reshape(w, c)
            up = prev.reshape(w, c)
            rec = np.zeros((w, c), np.int32)
            left = np.zeros(c, np.int32)
            zero = np.zeros(c, np.int32)
            for x in range(w):
                upleft = up[x - 1] if x else zero
                pred = ((left + up[x]) >> 1) if ft == 3 else _paeth(left, up[x], upleft)
                left = (px[x] + pred) % 256
                rec[x] = left
            recon = rec.reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[r] = recon.astype(np.uint8)
        prev = recon
    return w, h, c, out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# deterministic payload synthesis (the blob-source stand-in)
# ---------------------------------------------------------------------------
#
# Integer generation rules, replayed verbatim by the SQL oracle:
#   image: w = 4 + doc_id % 13, h = 3 + doc_id % 7,
#          byte[i] = (doc_id*131 + i*17) % 256      (i over w*h*3, RGB order)
#   audio: rate = 8000 + (doc_id % 3) * 4000, n = 50 + doc_id % 200,
#          sample[i] = (doc_id*7919 + i*12347) % 65536 - 32768


def _synth_image(doc_id: int) -> bytes:
    w, h = 4 + doc_id % 13, 3 + doc_id % 7
    i = np.arange(w * h * 3, dtype=np.int64)
    return encode_ppm(w, h, ((doc_id * 131 + i * 17) % 256).astype(np.uint8))


def _synth_audio(doc_id: int) -> bytes:
    rate, n = 8000 + (doc_id % 3) * 4000, 50 + doc_id % 200
    i = np.arange(n, dtype=np.int64)
    return encode_wav(rate, ((doc_id * 7919 + i * 12347) % 65536 - 32768).astype(np.int16))


def _payload_batch(t: pa.Table) -> pa.Table:
    ids = t["doc_id"].to_numpy()
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "image_ppm": pa.array([_synth_image(int(d)) for d in ids], pa.binary()),
            "audio_wav": pa.array([_synth_audio(int(d)) for d in ids], pa.binary()),
        }
    )


# PNG rule (replayed by the _MM_PNG_SQL oracle):
#   w = 5 + doc_id % 11, h = 4 + doc_id % 6, channels = 3 + doc_id % 2,
#   byte[i] = (doc_id*197 + i*23) % 256   (i over w*h*c, row-major RGB[A]),
#   scanline filter of row r = (doc_id + r) % 5  (every filter path used)


def _synth_png(doc_id: int) -> bytes:
    w, h, c = 5 + doc_id % 11, 4 + doc_id % 6, 3 + doc_id % 2
    i = np.arange(w * h * c, dtype=np.int64)
    img = ((doc_id * 197 + i * 23) % 256).astype(np.uint8).reshape(h, w, c)
    return encode_png(img, filters=[(doc_id + r) % 5 for r in range(h)])


def png_payloads(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, image_png) binary-column source for the PNG decode stage."""
    from librecatastro_ray.sources.readers import read_parquet_clean

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "image_png": pa.array(
                [_synth_png(int(d)) for d in t["doc_id"].to_numpy()], pa.binary()),
        })

    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(fn, batch_format="pyarrow", batch_size=256)


def multimodal_payloads(sf_dir: str) -> ray.data.Dataset:
    """The binary-column source: (doc_id, image_ppm, audio_wav).  Small
    batches — payloads, not text, dominate block size from here on."""
    from librecatastro_ray.sources.readers import read_parquet_clean

    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(_payload_batch, batch_format="pyarrow", batch_size=256)


# ---------------------------------------------------------------------------
# decode + feature stages (actor pools)
# ---------------------------------------------------------------------------


class ImageFeatures:
    """Actor-pool decode stage: P6 parse → per-channel integer sums over the
    DECODED pixels → 8×8 nearest-neighbor resize → 64-bit average-hash.

    Integer-exact outputs (sums instead of float means; luma in integer
    millis) so the oracle can replay them without float drift.  The aHash
    top bit is masked (% 2^63) to stay in signed int64 range — the same
    convention as the SimHash signatures."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in
               ("width", "height", "sum_r", "sum_g", "sum_b", "ahash")}
        for buf in batch["image_ppm"]:
            w, h, rgb = decode_ppm(buf.as_py())
            px = rgb.astype(np.int64)
            out["width"].append(w)
            out["height"].append(h)
            out["sum_r"].append(int(px[:, :, 0].sum()))
            out["sum_g"].append(int(px[:, :, 1].sum()))
            out["sum_b"].append(int(px[:, :, 2].sum()))
            # nearest-neighbor resize to 8×8: src = (dst * src_dim) // 8
            sy = (np.arange(8) * h) // 8
            sx = (np.arange(8) * w) // 8
            small = px[sy][:, sx]  # (8, 8, 3)
            luma = (small[:, :, 0] * 299 + small[:, :, 1] * 587
                    + small[:, :, 2] * 114).reshape(-1)  # integer millis
            bits = (64 * luma > luma.sum()).astype(np.uint64)
            ahash = int((bits << np.arange(64, dtype=np.uint64)).sum())
            out["ahash"].append(ahash % (1 << 63))
        return pa.table(
            {"doc_id": batch["doc_id"],
             **{k: pa.array(v, pa.int64()) for k, v in out.items()}}
        )


class AudioFeatures:
    """Actor-pool decode stage: RIFF walk → PCM16 ``frombuffer`` → integer
    energy (sum of squares) and strict-sign-change zero-crossing count over
    the DECODED samples."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("sample_rate", "n_samples", "sum_sq", "n_zero_cross")}
        for buf in batch["audio_wav"]:
            rate, s = decode_wav(buf.as_py())
            v = s.astype(np.int64)
            out["sample_rate"].append(rate)
            out["n_samples"].append(len(v))
            out["sum_sq"].append(int((v * v).sum()))
            out["n_zero_cross"].append(int((v[:-1] * v[1:] < 0).sum()))
        return pa.table(
            {"doc_id": batch["doc_id"],
             **{k: pa.array(v, pa.int64()) for k, v in out.items()}}
        )


class PngFeatures:
    """Actor-pool decode stage over REAL PNGs: chunk walk + CRC verify +
    zlib inflate + per-scanline unfilter (decode_png), then the same
    integer-exact features as ImageFeatures (per-channel sums; 8×8
    nearest-neighbor average-hash over the RGB luma; sum_a = 0 for RGB)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("width", "height", "channels",
                               "sum_r", "sum_g", "sum_b", "sum_a", "ahash")}
        for buf in batch["image_png"]:
            w, h, c, img = decode_png(buf.as_py())
            px = img.astype(np.int64)
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(c)
            out["sum_r"].append(int(px[:, :, 0].sum()))
            out["sum_g"].append(int(px[:, :, 1].sum()))
            out["sum_b"].append(int(px[:, :, 2].sum()))
            out["sum_a"].append(int(px[:, :, 3].sum()) if c == 4 else 0)
            sy = (np.arange(8) * h) // 8
            sx = (np.arange(8) * w) // 8
            small = px[sy][:, sx]
            luma = (small[:, :, 0] * 299 + small[:, :, 1] * 587
                    + small[:, :, 2] * 114).reshape(-1)
            bits = (64 * luma > luma.sum()).astype(np.uint64)
            ahash = int((bits << np.arange(64, dtype=np.uint64)).sum())
            out["ahash"].append(ahash % (1 << 63))
        return pa.table(
            {"doc_id": batch["doc_id"],
             **{k: pa.array(v, pa.int64()) for k, v in out.items()}}
        )


def png_features(sf_dir: str) -> ray.data.Dataset:
    return png_payloads(sf_dir).map_batches(
        PngFeatures, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def image_features(sf_dir: str) -> ray.data.Dataset:
    return multimodal_payloads(sf_dir).map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def audio_features(sf_dir: str) -> ray.data.Dataset:
    return multimodal_payloads(sf_dir).map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


class AudioFrameSampler:
    """Actor-pool frame-sample stage over REAL decoded audio (the video
    frame-sample analogue with an actual decoder): the PCM stream is cut
    into fixed ``frame_len``-sample windows (last partial window kept) and
    each frame's integer energy is reduced to count / max / argmax —
    integer-exact for the SQL replay."""

    def __init__(self, frame_len: int = 32):
        self.frame_len = int(frame_len)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("n_frames", "max_frame_energy", "peak_frame")}
        for buf in batch["audio_wav"]:
            _rate, s = decode_wav(buf.as_py())
            v = (s.astype(np.int64)) ** 2
            n = len(v)
            if n == 0:
                out["n_frames"].append(0)
                out["max_frame_energy"].append(0)
                out["peak_frame"].append(-1)
                continue
            n_frames = -(-n // self.frame_len)
            pad = n_frames * self.frame_len - n
            e = np.concatenate([v, np.zeros(pad, np.int64)]).reshape(n_frames, -1).sum(axis=1)
            out["n_frames"].append(n_frames)
            out["max_frame_energy"].append(int(e.max()))
            out["peak_frame"].append(int(e.argmax()))  # first max wins
        return pa.table(
            {"doc_id": batch["doc_id"],
             **{k: pa.array(val, pa.int64()) for k, val in out.items()}}
        )


def audio_frames(sf_dir: str, frame_len: int = 32) -> ray.data.Dataset:
    return multimodal_payloads(sf_dir).map_batches(
        AudioFrameSampler, fn_constructor_kwargs={"frame_len": frame_len},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4),
    )
