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
    n = width * height * 3
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
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", chunk[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only mono PCM16 supported")
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return rate, np.frombuffer(data, dtype=np.int16)


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
