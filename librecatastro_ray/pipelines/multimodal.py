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
# JPEG (REAL: baseline sequential DCT, ITU-T81) — numpy FDCT/IDCT + stdlib
# bit twiddling; no codec library.  Scope (loudly rejected otherwise):
# 8-bit baseline, grayscale (1 component) or YCbCr 4:4:4 (3 components,
# no subsampling), no restart intervals, no progressive — the H.264 video
# case stays honestly gated in training.DecodeStub.
# Reference analogue: the record-attached picture side-fetch
# (src/librecatastro/scrapping/scrapper.py:163-174).
# ---------------------------------------------------------------------------

# standard Annex-K luminance quantization table (row-major); the DECODER
# never assumes it — it reads DQT from the stream — so the codec stays
# self-consistent even against foreign baseline files
_JPEG_QTAB = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

# standard Annex-K Huffman specs as (BITS[1..16], HUFFVAL) — again only the
# ENCODER pins these; the decoder builds its tables from the DHT segment
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_zigzag() -> np.ndarray:
    """The 64-entry zigzag index order, generated (not typed): anti-diagonals
    by (r+c), even diagonals walked bottom-up, odd top-down."""
    idx = []
    for s in range(15):
        d = [(r, s - r) for r in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            d.reverse()  # up-right: row decreasing
        idx.extend(r * 8 + c for r, c in d)
    return np.array(idx, dtype=np.int64)


_ZIGZAG = _jpeg_zigzag()


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: M @ block @ M.T is exactly the
    JPEG FDCT (T.81 A.3.3), M.T @ coef @ M the IDCT."""
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0] /= np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2 canonical code assignment: {symbol: (length, code)}."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1-bits
        return bytes(self.buf)


def _jpeg_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(out: _BitWriter, zz: np.ndarray, pred: int,
                  dc: dict, ac: dict) -> int:
    """Huffman-encode one quantized zigzag block; returns its DC for the
    next block's predictor."""
    diff = int(zz[0]) - pred
    size = _jpeg_category(diff)
    length, code = dc[size]
    out.put(code, length)
    if size:
        out.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            length, code = ac[0xF0]  # ZRL
            out.put(code, length)
            run -= 16
        size = _jpeg_category(v)
        length, code = ac[(run << 4) | size]
        out.put(code, length)
        out.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        length, code = ac[0x00]  # EOB
        out.put(code, length)
    return int(zz[0])


def _fdct_quant(plane: np.ndarray) -> np.ndarray:
    """Pad to 8×8 multiples (edge-replicate), level-shift, FDCT, quantize
    with floor(F/Q + 0.5) (deterministic half-up).  Returns the per-block
    zigzag arrays, blocks in raster order: (n_blocks, 64) int64."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,byxz,vz->byuv", _DCT_M, blocks, _DCT_M)
    q = np.floor(coef / _JPEG_QTAB.reshape(8, 8) + 0.5).astype(np.int64)
    return q.reshape(bh * bw, 64)[:, _ZIGZAG]


def _jpeg_dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(img: np.ndarray) -> bytes:
    """Minimal REAL baseline JPEG writer: 8-bit grayscale ``(h, w)`` or
    YCbCr-converted RGB ``(h, w, 3)`` at 4:4:4, standard Annex-K luminance
    quant + Huffman tables for every component (valid per T.81; simple on
    purpose — the decoder reads the tables from the stream anyway)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("img must be uint8 (h, w) or (h, w, 3)")
    if img.ndim == 3:
        if img.shape[2] != 3:
            raise ValueError("color img must have 3 channels")
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        planes = [np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)
                  for p in (y, cb, cr)]
    else:
        planes = [img]
    h, w = planes[0].shape
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
            + bytes(int(v) for v in _JPEG_QTAB[_ZIGZAG]))  # DQT (zigzag order)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])  # no subsampling, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof  # SOF0
    out += _jpeg_dht(0, 0, _JPEG_DC_BITS, _JPEG_DC_VALS)
    out += _jpeg_dht(1, 0, _JPEG_AC_BITS, _JPEG_AC_VALS)
    sos = bytes([ncomp]) + b"".join(bytes([cid, 0x00]) for cid in range(1, ncomp + 1))
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos  # SOS
    dc_tab = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_tab = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    comp_zz = [_fdct_quant(p) for p in planes]
    writer = _BitWriter()
    preds = [0] * ncomp
    n_blocks = comp_zz[0].shape[0]
    for bi in range(n_blocks):  # MCU order = raster blocks; comps interleaved
        for ci in range(ncomp):
            preds[ci] = _encode_block(writer, comp_zz[ci][bi], preds[ci],
                                      dc_tab, ac_tab)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Reads MSB-first bits from de-stuffed entropy data."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bits(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bits(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a REAL baseline JPEG → ``(width, height, channels, pixels)``
    with pixels ``(h, w)`` uint8 (grayscale) or ``(h, w, 3)`` uint8 (RGB
    from YCbCr 4:4:4).

    Full entropy decode: marker walk (DQT/DHT/SOF0/SOS parsed from the
    stream — nothing about the encoder's table choice is assumed), byte
    de-stuffing, canonical-Huffman symbol decode, DC prediction chain,
    run-length AC fill, dequantize, float IDCT, half-up round, clamp,
    crop the 8×8 padding.  Loudly rejects progressive (SOF2), subsampled,
    12-bit and restart-interval streams rather than mis-decoding them."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = buf[pos + 1]
        if marker in (0xD8, 0xD9):
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        seg = buf[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                z = np.frombuffer(seg[o + 1 : o + 65], np.uint8).astype(np.int64)
                t = np.zeros(64, np.int64)
                t[_ZIGZAG] = z
                qtabs[tq] = t.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                cls, tid = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                inv = {(ln, code): sym
                       for sym, (ln, code) in _huff_codes(bits, vals).items()}
                htabs[(cls, tid)] = inv
                o += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG not supported (4:4:4 only)")
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) JPEG supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                    for i in range(ns)]
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    w, h, comps = frame
    if len(scan) != len(comps):
        raise ValueError("scan/frame component mismatch")
    # de-stuff entropy bytes up to EOI
    raw = bytearray()
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0xFF:
            b1 = buf[pos + 1] if pos + 1 < len(buf) else 0xD9
            if b1 == 0x00:
                raw.append(0xFF)
                pos += 2
                continue
            if b1 == 0xD9:
                break
            raise ValueError(f"unexpected marker 0xFF{b1:02X} in entropy data")
        raw.append(b0)
        pos += 1
    reader = _BitReader(bytes(raw))
    bh, bw = -(-h // 8), -(-w // 8)
    ncomp = len(comps)
    coefs = [np.zeros((bh * bw, 64), np.int64) for _ in range(ncomp)]
    preds = [0] * ncomp
    tabsel = {cid: (td, ta) for cid, td, ta in scan}
    for bi in range(bh * bw):
        for ci, (cid, _tq) in enumerate(comps):
            td, ta = tabsel[cid]
            dc_tab, ac_tab = htabs[(0, td)], htabs[(1, ta)]
            zz = coefs[ci][bi]
            size = _huff_decode(reader, dc_tab)
            diff = _extend(reader.bits(size), size) if size else 0
            preds[ci] += diff
            zz[0] = preds[ci]
            k = 1
            while k < 64:
                sym = _huff_decode(reader, ac_tab)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError("invalid JPEG AC symbol")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("JPEG AC run overflows block")
                zz[k] = _extend(reader.bits(size), size)
                k += 1
    planes = []
    for ci, (_cid, tq) in enumerate(comps):
        q = qtabs[tq]
        blk = np.zeros((bh * bw, 64), np.float64)
        blk[:, _ZIGZAG] = coefs[ci]
        blk = blk.reshape(bh * bw, 8, 8) * q
        pix = np.einsum("xu,buv,vz->bxz", _DCT_M.T, blk, _DCT_M) + 128.0
        pix = np.clip(np.floor(pix + 0.5), 0, 255)
        plane = pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        planes.append(plane[:h, :w])
    if ncomp == 1:
        return w, h, 1, planes[0].astype(np.uint8)
    if ncomp != 3:
        raise ValueError("only 1- or 3-component JPEG supported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([np.clip(np.floor(c + 0.5), 0, 255) for c in (r, g, b)], axis=2)
    return w, h, 3, rgb.astype(np.uint8)


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


# JPEG rule (replayed by the jpeg leg of _MM_IMAGE_SQL): grayscale, block
# dims nbx = 2 + doc_id % 3, nby = 2 + doc_id % 2 (w = 8*nbx, h = 8*nby),
# each 8×8 block a constant EVEN value v(bi) = 2*((doc_id*37 + bi*41) % 128)
# for bi = by*nbx + bx.  Even constant blocks make the Annex-K DCT
# round-trip provably LOSSLESS (DC = (v-128)/2 integer survives
# quant/dequant bit-exactly; AC quantize to 0), so the oracle replays the
# generation rule directly while the engine runs the full real entropy
# decode + IDCT — any decoder bug breaks the hash match.


def _synth_jpeg(doc_id: int) -> bytes:
    nbx, nby = 2 + doc_id % 3, 2 + doc_id % 2
    bi = np.arange(nby * nbx, dtype=np.int64)
    vals = (2 * ((doc_id * 37 + bi * 41) % 128)).astype(np.uint8).reshape(nby, nbx)
    return encode_jpeg(np.kron(vals, np.ones((8, 8), np.uint8)))


def jpeg_payloads(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, image_jpeg) binary-column source for the JPEG decode stage."""
    from librecatastro_ray.sources.readers import read_parquet_clean

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "image_jpeg": pa.array(
                [_synth_jpeg(int(d)) for d in t["doc_id"].to_numpy()], pa.binary()),
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


class JpegFeatures:
    """Actor-pool decode stage over REAL baseline JPEGs: full marker walk,
    Huffman entropy decode, dequant + IDCT (decode_jpeg), then the shared
    integer-exact image features.  Grayscale convention: the single plane
    stands in for all three channels (sum_r = sum_g = sum_b = Σ pixels,
    channels = 1, sum_a = 0; aHash luma = v*1000 — the RGB weights collapse
    on an equal-channel image)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("width", "height", "channels",
                               "sum_r", "sum_g", "sum_b", "sum_a", "ahash")}
        for buf in batch["image_jpeg"]:
            w, h, c, img = decode_jpeg(buf.as_py())
            px = img.astype(np.int64)
            if c == 1:
                px = np.stack([px, px, px], axis=2)
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(c)
            out["sum_r"].append(int(px[:, :, 0].sum()))
            out["sum_g"].append(int(px[:, :, 1].sum()))
            out["sum_b"].append(int(px[:, :, 2].sum()))
            out["sum_a"].append(0)
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


def jpeg_features(sf_dir: str) -> ray.data.Dataset:
    return jpeg_payloads(sf_dir).map_batches(
        JpegFeatures, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


_SUITE_COLS = ["doc_id", "fmt", "width", "height", "channels",
               "sum_r", "sum_g", "sum_b", "sum_a", "ahash"]


def image_feature_suite(sf_dir: str) -> ray.data.Dataset:
    """All four REAL image decoders (PPM, PNG, baseline JPEG, GIF-LZW) as one
    case-tagged suite with a harmonized schema — the single driver-facing
    entry for SURVEY §2 A5 image decode.  PPM rows: channels = 3,
    sum_a = 0; JPEG (grayscale) rows: channels = 1,
    sum_r = sum_g = sum_b = Σ pixels."""

    def tag(fmt: str, defaults: dict[str, int]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {"doc_id": t["doc_id"],
                    "fmt": pa.array([fmt] * len(t), pa.string())}
            for name in _SUITE_COLS[2:]:
                cols[name] = (t[name] if name in t.column_names
                              else pa.array([defaults[name]] * len(t), pa.int64()))
            return pa.table(cols)
        return fn

    ppm = image_features(sf_dir).map_batches(
        tag("ppm", {"channels": 3, "sum_a": 0}), batch_format="pyarrow")
    png = png_features(sf_dir).map_batches(
        tag("png", {}), batch_format="pyarrow")
    jpg = jpeg_features(sf_dir).map_batches(
        tag("jpeg", {}), batch_format="pyarrow")
    gif = gif_features(sf_dir).map_batches(
        tag("gif", {"channels": 3, "sum_a": 0}), batch_format="pyarrow")
    return ppm.union(png).union(jpg).union(gif)


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


class AudioSuite:
    """Whole-stream features AND frame-level stats from ONE decode pass:
    the registry's audio entry decodes each WAV once and emits the union of
    the :class:`AudioFeatures` and :class:`AudioFrameSampler` columns —
    at 100 TB the decode dominates, so fusing the two scans halves the
    stage's byte reads and CPU."""

    _COLS = ("sample_rate", "n_samples", "sum_sq", "n_zero_cross",
             "n_frames", "max_frame_energy", "peak_frame")

    def __init__(self, frame_len: int = 32):
        self.frame_len = int(frame_len)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in self._COLS}
        for buf in batch["audio_wav"]:
            rate, s = decode_wav(buf.as_py())
            v = s.astype(np.int64)
            n = len(v)
            out["sample_rate"].append(rate)
            out["n_samples"].append(n)
            out["sum_sq"].append(int((v * v).sum()))
            out["n_zero_cross"].append(int((v[:-1] * v[1:] < 0).sum()))
            if n == 0:
                out["n_frames"].append(0)
                out["max_frame_energy"].append(0)
                out["peak_frame"].append(-1)
                continue
            sq = v * v
            n_frames = -(-n // self.frame_len)
            pad = n_frames * self.frame_len - n
            e = np.concatenate(
                [sq, np.zeros(pad, np.int64)]
            ).reshape(n_frames, -1).sum(axis=1)
            out["n_frames"].append(n_frames)
            out["max_frame_energy"].append(int(e.max()))
            out["peak_frame"].append(int(e.argmax()))  # first max wins
        return pa.table(
            {"doc_id": batch["doc_id"],
             **{k: pa.array(val, pa.int64()) for k, val in out.items()}}
        )


def audio_suite(sf_dir: str, frame_len: int = 32) -> ray.data.Dataset:
    return multimodal_payloads(sf_dir).map_batches(
        AudioSuite, fn_constructor_kwargs={"frame_len": frame_len},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# GIF (GIF89a, palette + REAL LZW) — the fourth real image codec.
# Reference analogue: the base64 plan pictures the scrapper fetches
# (reference: src/librecatastro/scrapping/scrapper.py:163-171); GIF87a/89a is
# the other classic web image format next to PNG/JPEG.  Variable-width LSB-
# first LZW per the GIF89a spec: initial width = mcs+1, CLEAR = 2^mcs,
# EOI = CLEAR+1, table capped at 4096 (CLEAR emitted on overflow), decoder
# handles the KwKwK case.
# ---------------------------------------------------------------------------


def _lzw_compress(indices: np.ndarray, mcs: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = mcs + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w: tuple = ()
    for k in indices.tolist():
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        w = (k,)
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, mcs: int) -> np.ndarray:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    pos = 0
    width = mcs + 1
    table: list[tuple] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    prev: tuple | None = None

    def read() -> int:
        nonlocal pos
        if pos + width > len(bits):
            raise ValueError("truncated LZW stream")
        v = int((bits[pos : pos + width] << np.arange(width, dtype=np.uint32)).sum())
        pos += width
        return v

    while True:
        code = read()
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # KwKwK
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return np.array(out, dtype=np.int64)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """GIF89a: (h, w) palette indices + (n, 3) palette → file bytes.
    Palette padded to a power of two (min 4 entries, GIF's 2-bit floor)."""
    h, w = indices.shape
    n = len(palette)
    bpp = max(2, int(np.ceil(np.log2(max(n, 2)))))
    pal = np.zeros((1 << bpp, 3), dtype=np.uint8)
    pal[:n] = palette
    head = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0x80 | ((bpp - 1) << 4) | (bpp - 1), 0, 0
    ) + pal.tobytes()
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _lzw_compress(indices.reshape(-1), bpp)
    blocks = bytearray([bpp])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return head + img + bytes(blocks) + b"\x3b"


def decode_gif(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Full GIF parse: header, logical screen descriptor, global color
    table, extension skip, image descriptor, sub-block reassembly, LZW
    decode, palette mapping → (w, h, rgb uint8 (h, w, 3))."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        gct = np.frombuffer(buf[pos : pos + 3 * ncol], np.uint8).reshape(ncol, 3)
        pos += 3 * ncol
    def _at(i: int) -> int:
        if i >= len(buf):
            raise ValueError("truncated GIF")
        return buf[i]

    while pos < len(buf):
        b0 = buf[pos]
        pos += 1
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            while _at(pos) != 0:
                pos += 1 + buf[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack("<HHHHB", buf[pos : pos + 9])
            pos += 9
            pal = gct
            if ipacked & 0x80:
                ncol = 2 << (ipacked & 0x07)
                pal = np.frombuffer(buf[pos : pos + 3 * ncol], np.uint8).reshape(ncol, 3)
                pos += 3 * ncol
            if pal is None:
                raise ValueError("no color table")
            mcs = _at(pos)
            pos += 1
            data = bytearray()
            while _at(pos) != 0:
                ln = buf[pos]
                if pos + 1 + ln > len(buf):
                    raise ValueError("truncated GIF sub-block")
                data += buf[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decompress(bytes(data), mcs)
            if len(idx) < w * h:
                raise ValueError(f"GIF pixel underrun: {len(idx)} < {w * h}")
            idx = idx[: w * h].reshape(h, w)
            if idx.max(initial=0) >= len(pal):
                raise ValueError("palette index out of range")
            return w, h, pal[idx]
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("no image data in GIF")


# GIF rule (replayed by the gif leg of the image-suite oracle): w = 8 +
# doc_id % 9, h = 6 + doc_id % 5, 16-entry palette (r, g, b) =
# (17*i, (29*i) % 256, (53*i) % 256), pixel index at (x, y) =
# (doc_id*7 + x//3 + y) % 16 — horizontal runs of 3 give the LZW real
# matches, and the oracle recomputes the features from this rule while the
# engine runs the full parse + LZW decode: any codec bug breaks the hash.


def _synth_gif(doc_id: int) -> bytes:
    w, h = 8 + doc_id % 9, 6 + doc_id % 5
    i = np.arange(16, dtype=np.int64)
    palette = np.stack([17 * i, (29 * i) % 256, (53 * i) % 256], axis=1).astype(np.uint8)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    idx = (doc_id * 7 + x // 3 + y) % 16
    return encode_gif(idx, palette)


def gif_payloads(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, image_gif) binary-column source for the GIF decode stage."""
    from librecatastro_ray.sources.readers import read_parquet_clean

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "image_gif": pa.array(
                [_synth_gif(int(d)) for d in t["doc_id"].to_numpy()], pa.binary()),
        })

    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(fn, batch_format="pyarrow", batch_size=256)


class GifFeatures:
    """Actor-pool decode stage over REAL GIFs: full parse + variable-width
    LZW decode + palette mapping (decode_gif), then the shared integer-exact
    image features (channels = 3, sum_a = 0)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("width", "height",
                               "sum_r", "sum_g", "sum_b", "ahash")}
        for buf in batch["image_gif"]:
            w, h, rgb = decode_gif(buf.as_py())
            px = rgb.astype(np.int64)
            out["width"].append(w)
            out["height"].append(h)
            out["sum_r"].append(int(px[:, :, 0].sum()))
            out["sum_g"].append(int(px[:, :, 1].sum()))
            out["sum_b"].append(int(px[:, :, 2].sum()))
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


def gif_features(sf_dir: str) -> ray.data.Dataset:
    return gif_payloads(sf_dir).map_batches(
        GifFeatures, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


# ---------------------------------------------------------------------------
# MJPEG-in-AVI video (round-5 gate-closer: a REAL container codec — RIFF
# walk + per-frame baseline-JPEG decode — so the video decode gate narrows
# to true inter-frame codecs like H.264).  Reference analogue: the binary
# side-fetch of scrapper.py:152-174 generalized to a multi-frame payload.
# ---------------------------------------------------------------------------


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal standards-shaped AVI writer (RIFF 'AVI ' / LIST hdrl with
    avih + one 'vids'/'MJPG' stream / LIST movi of '00dc' chunks / idx1):
    each frame is an already-encoded baseline JPEG.  Layout follows the
    public VFW AVI RIFF form; chunks are even-padded per RIFF rules."""
    import struct

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    n = len(frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        0, 0,
        0x10,                      # AVIF_HASINDEX
        n, 0, 1, 0,                # frames, initial, streams, sugg. buffer
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<I2HI", 0, 0, 0, 0)       # flags, prio, lang, initial
        + struct.pack("<4I", 1, max(fps, 1), 0, n)  # scale, rate, start, len
        + struct.pack("<3I", 0, 10_000, 0)       # sugg. buffer, quality, sampsz
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<I2i2H", 40, width, height, 1, 24
    ) + b"MJPG" + struct.pack("<I2i2I", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_payload))  # offset of the '00dc' fourcc
        movi_payload += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_payload)
    import struct as _s

    idx = b"".join(
        b"00dc" + _s.pack("<3I", 0x10, off, len(f))
        for off, f in zip(offsets, frames)
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(buf: bytes) -> tuple[int, int, int, list[bytes]]:
    """Real RIFF/AVI container walk: validates the RIFF/'AVI ' form, reads
    (width, height, total frames) from avih, and collects every '00dc' /
    '00db' chunk in LIST movi as one JPEG payload.  Returns ``(width,
    height, n_frames, frames)``; raises ValueError on malformed input."""
    import struct

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    riff_size = struct.unpack("<I", buf[4:8])[0]
    if 8 + riff_size > len(buf):
        raise ValueError("truncated RIFF payload")
    width = height = n_frames = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, n_frames
        pos = lo
        while pos + 8 <= hi:
            fourcc = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            data_lo, data_hi = pos + 8, pos + 8 + size
            if data_hi > hi:
                raise ValueError(f"chunk {fourcc!r} overruns its parent")
            if fourcc == b"LIST":
                walk(data_lo + 4, data_hi)  # skip the list-type fourcc
            elif fourcc == b"avih":
                f = struct.unpack("<14I", buf[data_lo:data_lo + 56])
                n_frames, width, height = f[4], f[8], f[9]
            elif fourcc in (b"00dc", b"00db"):
                frames.append(buf[data_lo:data_hi])
            pos = data_hi + (size % 2)  # even padding

    walk(12, 8 + riff_size)
    if width is None:
        raise ValueError("no avih header in AVI stream")
    if n_frames != len(frames):
        raise ValueError(
            f"avih declares {n_frames} frames, movi carries {len(frames)}"
        )
    return int(width), int(height), int(n_frames), frames


# MJPEG-AVI rule (replayed by the _MM_VIDEO_SQL oracle): nf = 2 + doc_id % 4
# frames, all the same grayscale block dims as the JPEG rule (nbx = 2 +
# doc_id % 3, nby = 2 + doc_id % 2), frame f's block bi value
# v = 2*((doc_id*37 + f*53 + bi*41) % 128) — even constant blocks, so every
# frame's Annex-K DCT round-trip is lossless and the oracle replays the rule
# while the engine runs the container walk + full entropy decode per frame.


def _synth_avi(doc_id: int) -> bytes:
    nbx, nby, nf = 2 + doc_id % 3, 2 + doc_id % 2, 2 + doc_id % 4
    bi = np.arange(nby * nbx, dtype=np.int64)
    frames = []
    for f in range(nf):
        vals = (2 * ((doc_id * 37 + f * 53 + bi * 41) % 128)).astype(
            np.uint8).reshape(nby, nbx)
        frames.append(encode_jpeg(np.kron(vals, np.ones((8, 8), np.uint8))))
    return encode_avi_mjpeg(frames, nbx * 8, nby * 8)


def video_payloads(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, video_avi) binary-column source for the video decode stage."""
    from librecatastro_ray.sources.readers import read_parquet_clean

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "video_avi": pa.array(
                [_synth_avi(int(d)) for d in t["doc_id"].to_numpy()], pa.binary()),
        })

    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(fn, batch_format="pyarrow", batch_size=128)


class VideoFeatures:
    """Actor-pool decode stage over REAL MJPEG-AVI videos: RIFF container
    walk (decode_avi_mjpeg) + full baseline-JPEG entropy decode per frame
    (decode_jpeg), then integer-exact per-video features: luma sums of the
    first / last / all frames and the first frame's 8×8 average-hash (the
    keyframe-thumbnail convention).  Small batches — multi-frame payloads
    dominate block size."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("n_frames", "width", "height", "sum_first",
                               "sum_last", "sum_all", "ahash_first")}
        for buf in batch["video_avi"]:
            w, h, nf, frames = decode_avi_mjpeg(buf.as_py())
            sums = []
            first_px = None
            for f in frames:
                fw, fh, _c, img = decode_jpeg(f)
                if (fw, fh) != (w, h):
                    raise ValueError("frame dims disagree with avih")
                px = img.astype(np.int64)
                if first_px is None:
                    first_px = px
                sums.append(int(px.sum()))
            out["n_frames"].append(nf)
            out["width"].append(w)
            out["height"].append(h)
            out["sum_first"].append(sums[0] if sums else 0)
            out["sum_last"].append(sums[-1] if sums else 0)
            out["sum_all"].append(sum(sums))
            if first_px is None:
                out["ahash_first"].append(0)
            else:
                sy = (np.arange(8) * h) // 8
                sx = (np.arange(8) * w) // 8
                small = first_px[sy][:, sx]
                luma = (small * 1000).reshape(-1)  # grayscale: RGB collapses
                bits = (64 * luma > luma.sum()).astype(np.uint64)
                ahash = int((bits << np.arange(64, dtype=np.uint64)).sum())
                out["ahash_first"].append(ahash % (1 << 63))
        return pa.table(
            {"doc_id": batch["doc_id"],
             **{k: pa.array(v, pa.int64()) for k, v in out.items()}}
        )


def video_features(sf_dir: str) -> ray.data.Dataset:
    return video_payloads(sf_dir).map_batches(
        VideoFeatures, batch_format="pyarrow", batch_size=128, concurrency=(1, 4)
    )
