"""Real-decoder multimodal tests: golden-byte decode (hand-built binary,
independent of the payload synthesizer), round-trips, malformed-input
guards, and the end-to-end actor-pool feature stages."""

import numpy as np
import pyarrow as pa
import pytest

from librecatastro_ray.pipelines.multimodal import (
    AudioFeatures,
    ImageFeatures,
    _payload_batch,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
)


def test_ppm_golden_bytes():
    """Decode a hand-assembled P6 byte string (not produced by our encoder)."""
    buf = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    w, h, rgb = decode_ppm(buf)
    assert (w, h) == (2, 1)
    assert rgb.tolist() == [[[10, 20, 30], [40, 50, 60]]]


def test_ppm_whitespace_tolerant_header():
    buf = b"P6 3\t1\n255 " + bytes(range(9))
    w, h, rgb = decode_ppm(buf)
    assert (w, h) == (3, 1)
    assert rgb.reshape(-1).tolist() == list(range(9))


def test_ppm_roundtrip_and_guards():
    rgb = (np.arange(5 * 4 * 3) % 256).astype(np.uint8)
    w, h, arr = decode_ppm(encode_ppm(5, 4, rgb))
    assert (w, h) == (5, 4) and (arr.reshape(-1) == rgb).all()
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n# c\n1 1\n255\n" + bytes(3))


def test_wav_golden_bytes():
    """Decode a hand-assembled RIFF file with the data chunk BEFORE fmt
    (chunk walking, not offset arithmetic) and an odd-sized padded chunk."""
    import struct

    data = np.array([100, -200, 32767], np.int16).tobytes()
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size → pad
    fmt = struct.pack("<HHIIHH", 1, 1, 22050, 44100, 2, 16)
    body = (b"WAVE" + junk + b"data" + struct.pack("<I", len(data)) + data
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, s = decode_wav(buf)
    assert rate == 22050
    assert s.tolist() == [100, -200, 32767]


def test_wav_roundtrip_and_guards():
    s = np.array([0, 1, -1, 32767, -32768], np.int16)
    rate, out = decode_wav(encode_wav(8000, s))
    assert rate == 8000 and (out == s).all()
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + bytes(20))
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data chunks


def test_png_golden_bytes():
    """Decode a hand-assembled PNG byte string (chunks, CRCs and a filter-0
    scanline built by hand in the test — not produced by our encoder)."""
    import struct
    import zlib

    from librecatastro_ray.pipelines.multimodal import decode_png

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    # 2x1 RGB, one scanline: filter 0 + pixels (10,20,30) (40,50,60)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    idat = zlib.compress(bytes([0, 10, 20, 30, 40, 50, 60]))
    buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
    w, h, c, img = decode_png(buf)
    assert (w, h, c) == (2, 1, 3)
    assert img.tolist() == [[[10, 20, 30], [40, 50, 60]]]


def test_png_each_filter_type_golden():
    """One image per scanline filter type (0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth): decode(encode) must reproduce the pixels exactly — each filter
    path is exercised in isolation on a 2-row image (row 2 depends on the
    reconstructed row 1)."""
    from librecatastro_ray.pipelines.multimodal import decode_png, encode_png

    img = (np.arange(2 * 4 * 3, dtype=np.int64) * 37 % 256).astype(
        np.uint8).reshape(2, 4, 3)
    for ft in range(5):
        w, h, c, out = decode_png(encode_png(img, filters=[0, ft]))
        assert (w, h, c) == (4, 2, 3) and (out == img).all(), ft
        # and as the first row too (prev = zeros path)
        _, _, _, out2 = decode_png(encode_png(img, filters=[ft, ft]))
        assert (out2 == img).all(), ft


def test_png_roundtrip_property():
    """Random shapes / channels / per-row filters: encode → decode identity
    (zlib, chunk CRCs, and all five unfilter paths under random data)."""
    from librecatastro_ray.pipelines.multimodal import decode_png, encode_png

    rng = np.random.RandomState(0)
    for trial in range(60):
        h, w = int(rng.randint(1, 11)), int(rng.randint(1, 11))
        c = int(rng.choice([3, 4]))
        img = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
        filters = rng.randint(0, 5, h).tolist()
        w2, h2, c2, out = decode_png(encode_png(img, filters))
        assert (w2, h2, c2) == (w, h, c) and (out == img).all(), (trial, filters)


def test_png_guards():
    import struct
    import zlib

    from librecatastro_ray.pipelines.multimodal import decode_png, encode_png

    img = np.zeros((2, 2, 3), np.uint8)
    buf = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF" + bytes(buf[4:]))
    # corrupt one IDAT payload byte → CRC mismatch, loud
    idat_at = bytes(buf).index(b"IDAT")
    corrupted = bytearray(buf)
    corrupted[idat_at + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(corrupted))
    # 16-bit depth rejected
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    bad_ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", bad_ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(7))) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="only 8-bit"):
        decode_png(bad)
    # truncated file (IEND missing, last chunk torn)
    with pytest.raises(ValueError):
        decode_png(bytes(buf[: idat_at + 2]))


def test_png_feature_stage_matches_independent_recompute():
    from librecatastro_ray.pipelines.multimodal import (
        PngFeatures,
        _synth_png,
        decode_png,
    )

    ids = [0, 1, 36, 37, 499]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "image_png": pa.array([_synth_png(d) for d in ids], pa.binary())})
    got = PngFeatures()(t)
    for row, d in enumerate(ids):
        w, h, c, img = decode_png(_synth_png(d))
        assert (w, h, c) == (5 + d % 11, 4 + d % 6, 3 + d % 2)
        px = img.astype(np.int64)
        assert got["width"][row].as_py() == w
        assert got["channels"][row].as_py() == c
        assert got["sum_r"][row].as_py() == int(px[:, :, 0].sum())
        assert got["sum_a"][row].as_py() == (int(px[:, :, 3].sum()) if c == 4 else 0)
        sy, sx = (np.arange(8) * h) // 8, (np.arange(8) * w) // 8
        small = px[sy][:, sx]
        luma = (small[:, :, 0] * 299 + small[:, :, 1] * 587
                + small[:, :, 2] * 114).reshape(-1)
        bits = (64 * luma > luma.sum()).astype(np.uint64)
        expect = int((bits << np.arange(64, dtype=np.uint64)).sum()) % (1 << 63)
        assert got["ahash"][row].as_py() == expect


def test_feature_stages_decode_real_bytes():
    """ImageFeatures/AudioFeatures consume the BINARY column: features over
    decoded arrays match an independent recomputation from the same bytes."""
    t = _payload_batch(pa.table({"doc_id": pa.array([3, 44, 200], pa.int64())}))
    imf = ImageFeatures()(t)
    auf = AudioFeatures()(t)
    for row in range(3):
        w, h, rgb = decode_ppm(t["image_ppm"][row].as_py())
        assert imf["width"][row].as_py() == w
        assert imf["height"][row].as_py() == h
        assert imf["sum_r"][row].as_py() == int(rgb[:, :, 0].astype(np.int64).sum())
        rate, s = decode_wav(t["audio_wav"][row].as_py())
        assert auf["sample_rate"][row].as_py() == rate
        assert auf["n_samples"][row].as_py() == len(s)
        v = s.astype(np.int64)
        assert auf["sum_sq"][row].as_py() == int((v * v).sum())
        assert auf["n_zero_cross"][row].as_py() == int((v[:-1] * v[1:] < 0).sum())


def test_image_ahash_resize_identity():
    """An image whose 8x8 resize is constant-luma has ahash 0 (no pixel
    strictly above the mean); a half-bright image sets exactly the bright
    half's bits."""
    flat = np.full(8 * 8 * 3, 7, np.uint8)
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "image_ppm": pa.array([encode_ppm(8, 8, flat)], pa.binary()),
                  "audio_wav": pa.array([b""], pa.binary())})
    assert ImageFeatures()(t)["ahash"][0].as_py() == 0
    half = np.zeros((8, 8, 3), np.uint8)
    half[:, 4:, :] = 255  # right half bright → bits where x >= 4
    t2 = pa.table({"doc_id": pa.array([1], pa.int64()),
                   "image_ppm": pa.array([encode_ppm(8, 8, half.reshape(-1))], pa.binary()),
                   "audio_wav": pa.array([b""], pa.binary())})
    got = ImageFeatures()(t2)["ahash"][0].as_py()
    expect = sum(1 << (y * 8 + x) for y in range(8) for x in range(4, 8)) % (1 << 63)
    assert got == expect


def test_multimodal_pipeline_end_to_end(ray_session):
    from librecatastro_ray.pipelines.multimodal import audio_features, image_features

    imf = image_features("/root/testdata/sf0.001").to_pandas()
    auf = audio_features("/root/testdata/sf0.001").to_pandas()
    assert len(imf) == len(auf) == 500
    assert (imf["width"] == 4 + imf["doc_id"] % 13).all()
    assert (auf["sample_rate"] == 8000 + (auf["doc_id"] % 3) * 4000).all()


def test_audio_frame_sampler_known_values():
    """Frame energies over real decoded PCM: hand-built 5-sample signal with
    frame_len=2 → frames [a²+b², c²+d², e²] and first-max tie-breaking."""
    from librecatastro_ray.pipelines.multimodal import AudioFrameSampler, encode_wav

    s = np.array([3, -4, 5, 0, -5], np.int16)  # frames: 25, 25, 25 → peak 0
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "audio_wav": pa.array([encode_wav(8000, s)], pa.binary())})
    r = AudioFrameSampler(frame_len=2)(t).to_pylist()[0]
    assert r == {"doc_id": 1, "n_frames": 3, "max_frame_energy": 25, "peak_frame": 0}
    s2 = np.array([1, 0, 3, 4], np.int16)  # frames: 1, 25 → peak 1
    t2 = pa.table({"doc_id": pa.array([2], pa.int64()),
                   "audio_wav": pa.array([encode_wav(8000, s2)], pa.binary())})
    r2 = AudioFrameSampler(frame_len=2)(t2).to_pylist()[0]
    assert (r2["n_frames"], r2["max_frame_energy"], r2["peak_frame"]) == (2, 25, 1)
    # empty payload
    t3 = pa.table({"doc_id": pa.array([3], pa.int64()),
                   "audio_wav": pa.array([encode_wav(8000, np.array([], np.int16))],
                                         pa.binary())})
    r3 = AudioFrameSampler(frame_len=2)(t3).to_pylist()[0]
    assert (r3["n_frames"], r3["peak_frame"]) == (0, -1)


def test_decoder_adversarial_headers():
    """Adversarial inputs (torn fmt, truncated payloads/chunks, odd PCM
    data, non-positive dims) fail LOUDLY with ValueError — plus a fuzz pass:
    random truncations/mutations of valid files either decode or raise
    ValueError, never a stray exception type."""
    import struct

    from librecatastro_ray.pipelines.multimodal import (
        decode_png,
        decode_ppm,
        decode_wav,
        encode_png,
        encode_ppm,
        encode_wav,
    )

    # torn fmt chunk (declared 16 bytes, carries 4)
    torn = (b"RIFF" + struct.pack("<I", 16) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00")
    with pytest.raises(ValueError):
        decode_wav(torn)
    # data chunk whose declared size overruns the buffer
    over = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
            + b"data" + struct.pack("<I", 1000) + b"\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(over)
    # odd-length PCM16 data
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    odd = (b"RIFF" + struct.pack("<I", 33) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", 3) + b"\x00\x01\x02" + b"\x00")
    with pytest.raises(ValueError, match="odd-length"):
        decode_wav(odd)
    # truncated PPM payload + non-positive dims
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\n" + bytes(5))
    with pytest.raises(ValueError, match="non-positive"):
        decode_ppm(b"P6\n0 4\n255\n")
    # fuzz: truncations and byte flips of valid files
    rng = np.random.RandomState(9)
    wav = encode_wav(8000, (rng.randint(-100, 100, 64)).astype(np.int16))
    ppm = encode_ppm(4, 3, rng.randint(0, 256, 36).astype(np.uint8))
    png = encode_png(rng.randint(0, 256, (3, 4, 3)).astype(np.uint8))
    for buf, dec in ((wav, decode_wav), (ppm, decode_ppm), (png, decode_png)):
        for _ in range(120):
            b = bytearray(buf)
            if rng.rand() < 0.5:
                b = b[: rng.randint(0, len(b))]  # truncate
            else:
                b[rng.randint(len(b))] ^= 1 << rng.randint(8)  # bit flip
            try:
                dec(bytes(b))
            except ValueError:
                pass  # loud rejection is the contract


def test_scatter_many_queries_stress(built_index):
    """Many-queries scatter-gather: 10⁴ queries through 4 doc ranges —
    every query returns ≤ k rows, ranks are 1..n_i, and a sample matches
    the single-engine result exactly."""
    from librecatastro_ray.pipelines.query import QueryEngine, batch_search_scatter

    index_dir, _ = built_index
    k = 5
    vocab = ["def", "return", "if", "self", "x", "id_00007", "id_00028"]
    queries = [
        {"query_id": i, "kind": "match",
         "text": " ".join(vocab[(i + j) % len(vocab)] for j in range(1 + i % 3)),
         "k": k}
        for i in range(10_000)
    ]
    out = batch_search_scatter(index_dir, queries, n_ranges=4).to_pandas()
    per_q = out.groupby("query_id").size()
    assert (per_q <= k).all()
    ranks = out.groupby("query_id")["rank"].max()
    assert (ranks == per_q.loc[ranks.index]).all()  # ranks are dense 1..n
    eng = QueryEngine(index_dir)
    for i in (0, 137, 4242, 9999):
        exp = eng.match(queries[i]["text"], k=k)
        got = out[out.query_id == i].sort_values("rank")
        assert got["doc_id"].tolist() == exp["doc_id"].to_pylist(), i


# ---------------------------------------------------------------------------
# JPEG (real baseline codec)
# ---------------------------------------------------------------------------


def _jpeg_expected_gray(img):
    """Independent expected reconstruction: quantize → dequant → IDCT →
    half-up round → clamp → crop (what a correct decoder must emit)."""
    from librecatastro_ray.pipelines.multimodal import (
        _DCT_M, _JPEG_QTAB, _ZIGZAG, _fdct_quant,
    )

    h, w = img.shape
    bh, bw = -(-h // 8), -(-w // 8)
    zz = _fdct_quant(img)
    blk = np.zeros_like(zz, dtype=np.float64)
    blk[:, _ZIGZAG] = zz
    blk = blk.reshape(-1, 8, 8) * _JPEG_QTAB.reshape(8, 8)
    pix = np.einsum("xu,buv,vz->bxz", _DCT_M.T, blk, _DCT_M) + 128.0
    pix = np.clip(np.floor(pix + 0.5), 0, 255)
    full = pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return full[:h, :w].astype(np.uint8)


def test_jpeg_zigzag_is_the_standard_order():
    from librecatastro_ray.pipelines.multimodal import _ZIGZAG

    assert list(_ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    assert list(_ZIGZAG[-4:]) == [61, 54, 47, 55] or _ZIGZAG[-1] == 63


def test_jpeg_even_constant_blocks_lossless():
    """The oracle's foundation: even-valued constant 8x8 blocks survive the
    Annex-K quant round-trip bit-exactly."""
    from librecatastro_ray.pipelines.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    for _ in range(8):
        nby, nbx = int(rng.integers(1, 4)), int(rng.integers(1, 5))
        vals = (2 * rng.integers(0, 128, size=(nby, nbx))).astype(np.uint8)
        img = np.kron(vals, np.ones((8, 8), np.uint8))
        w, h, c, out = decode_jpeg(encode_jpeg(img))
        assert (w, h, c) == (nbx * 8, nby * 8, 1)
        assert np.array_equal(out, img)


def test_jpeg_gray_roundtrip_arbitrary_content():
    """Decoder output equals the independent expected reconstruction on
    random-content images of awkward (non multiple-of-8) sizes — exercises
    padding, DC chains, ZRL, EOB and every Huffman path the data hits."""
    from librecatastro_ray.pipelines.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(13)
    for _ in range(6):
        h, w = int(rng.integers(3, 45)), int(rng.integers(3, 45))
        img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        dw, dh, c, out = decode_jpeg(encode_jpeg(img))
        assert (dw, dh, c) == (w, h, 1)
        assert np.array_equal(out, _jpeg_expected_gray(img))


def test_jpeg_color_roundtrip_matches_plane_reconstruction():
    from librecatastro_ray.pipelines.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(19, 23, 3)).astype(np.uint8)
    # expected: encoder's YCbCr planes, each through the gray pipeline,
    # then the decoder's YCbCr->RGB formula
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    planes = [np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)
              for p in (y, cb, cr)]
    dec = [_jpeg_expected_gray(p).astype(np.float64) for p in planes]
    ry = dec[0] + 1.402 * (dec[2] - 128.0)
    gy = dec[0] - 0.344136286 * (dec[1] - 128.0) - 0.714136286 * (dec[2] - 128.0)
    by = dec[0] + 1.772 * (dec[1] - 128.0)
    exp = np.stack([np.clip(np.floor(p + 0.5), 0, 255) for p in (ry, gy, by)],
                   axis=2).astype(np.uint8)
    w, h, c, out = decode_jpeg(encode_jpeg(img))
    assert (w, h, c) == (23, 19, 3)
    assert np.array_equal(out, exp)


def test_jpeg_guards():
    import struct

    import pytest

    from librecatastro_ray.pipelines.multimodal import decode_jpeg, encode_jpeg

    img = (np.ones((8, 8)) * 100).astype(np.uint8)
    buf = bytearray(encode_jpeg(img))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01" + bytes(buf[2:]))
    # progressive (SOF2) rejected: rewrite the SOF0 marker byte
    sof = bytes(buf).find(b"\xff\xc0")
    prog = bytearray(buf)
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))
    # subsampling rejected: component sampling factor 0x22
    sub = bytearray(buf)
    sub[sof + 2 + 2 + 6 + 1] = 0x22  # len(2) + prec/h/w/nc(6) + cid
    with pytest.raises(ValueError, match="subsampl"):
        decode_jpeg(bytes(sub))
    # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf[:-6]))
    # restart interval rejected (inject DRI before SOS)
    sos = bytes(buf).find(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 8)
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(buf[:sos]) + dri + bytes(buf[sos:]))
    # encoder input validation
    with pytest.raises(ValueError):
        encode_jpeg(img.astype(np.int32))


def test_jpeg_feature_stage_matches_rule(ray_session, tmp_path):
    """JpegFeatures over synthesized payloads == the generation rule
    (the in-process version of the mm_image_features jpeg leg oracle)."""
    import pyarrow.parquet as pq

    from librecatastro_ray.pipelines.multimodal import jpeg_features

    ids = [0, 1, 2, 3, 4, 5, 96, 97, 127, 128, 500]
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}),
                   str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r for r in jpeg_features(str(tmp_path)).take_all()}
    for d in ids:
        nbx, nby = 2 + d % 3, 2 + d % 2
        w, h = nbx * 8, nby * 8
        v = lambda bi: 2 * ((d * 37 + bi * 41) % 128)
        sum_y = 64 * sum(v(bi) for bi in range(nbx * nby))
        r = got[d]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 1)
        assert r["sum_r"] == r["sum_g"] == r["sum_b"] == sum_y
        assert r["sum_a"] == 0
        small = [v(((((j * h) // 8) // 8) * nbx + (((i * w) // 8) // 8)))
                 for j in range(8) for i in range(8)]
        tot = sum(small)
        ahash = sum((1 << k) for k in range(64) if 64 * small[k] > tot) % (1 << 63)
        assert r["ahash"] == ahash


def test_audio_suite_equals_features_join_frames():
    """AudioSuite (one decode pass) emits exactly the union of the
    AudioFeatures and AudioFrameSampler columns, value-identical."""
    from librecatastro_ray.pipelines.multimodal import AudioFrameSampler, AudioSuite

    t = _payload_batch(pa.table({"doc_id": pa.array([3, 44, 200], pa.int64())}))
    suite = AudioSuite(frame_len=32)(t)
    feats = AudioFeatures()(t)
    frames = AudioFrameSampler(frame_len=32)(t)
    for col in ("sample_rate", "n_samples", "sum_sq", "n_zero_cross"):
        assert suite[col].to_pylist() == feats[col].to_pylist()
    for col in ("n_frames", "max_frame_energy", "peak_frame"):
        assert suite[col].to_pylist() == frames[col].to_pylist()


def test_gif_lzw_roundtrip_and_overflow():
    from librecatastro_ray.pipelines.multimodal import _lzw_compress, _lzw_decompress

    rng = np.random.default_rng(3)
    for mcs in (2, 4, 8):
        for n in (1, 7, 300, 20000):  # 20000 forces a 4096-table CLEAR reset
            idx = rng.integers(0, 1 << mcs, n).astype(np.int64)
            back = _lzw_decompress(_lzw_compress(idx, mcs), mcs)
            assert (back == idx).all(), (mcs, n)
    # KwKwK stress: immediate repeats hit the code == len(table) branch
    idx = np.array([1, 1, 1, 1, 2, 2, 2, 2, 1, 1, 1, 1] * 64, dtype=np.int64)
    assert (_lzw_decompress(_lzw_compress(idx, 2), 2) == idx).all()


def test_gif_handbuilt_bytes_decode():
    """A GIF built BY HAND (independent of encode_gif) decodes to known
    pixels — guards against a symmetric encoder/decoder co-bug."""
    import struct

    from librecatastro_ray.pipelines.multimodal import decode_gif

    bits = "".join(format(code, "03b")[::-1] for code in (4, 1, 2, 1, 5))
    data = bytes(
        int(bits[i : i + 8].ljust(8, "0")[::-1], 2) for i in range(0, len(bits), 8)
    )
    pal = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 11, 22, 33])
    gif = (b"GIF89a" + struct.pack("<HHBBB", 3, 1, 0x80 | (1 << 4) | 1, 0, 0) + pal
           + b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
           + bytes([2, len(data)]) + data + b"\x00\x3b")
    w, h, rgb = decode_gif(gif)
    assert (w, h) == (3, 1)
    assert rgb.tolist() == [[[40, 50, 60], [70, 80, 90], [40, 50, 60]]]


def test_gif_roundtrip_matches_generation_rule():
    from librecatastro_ray.pipelines.multimodal import _synth_gif, decode_gif

    for d in (0, 5, 123, 999, 4444):
        w, h, rgb = decode_gif(_synth_gif(d))
        assert (w, h) == (8 + d % 9, 6 + d % 5)
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        idx = (d * 7 + x // 3 + y) % 16
        i = np.arange(16)
        palette = np.stack([17 * i, (29 * i) % 256, (53 * i) % 256], axis=1)
        assert (rgb == palette[idx]).all(), d


def test_gif_guards():
    from librecatastro_ray.pipelines.multimodal import (_synth_gif, decode_gif,
                                                        encode_gif)

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    buf = _synth_gif(7)
    with pytest.raises(ValueError):  # torn sub-blocks / truncated LZW
        decode_gif(buf[:-8])
    # pixel underrun: an encoded 2x2 image presented as 4x2
    small = encode_gif(np.zeros((2, 2), dtype=np.int64),
                       np.zeros((4, 3), dtype=np.uint8))
    grown = bytearray(small)
    import struct as _s
    grown[6:8] = _s.pack("<H", 4)  # screen width
    ix = small.index(b"\x2c")
    grown[ix + 5 : ix + 7] = _s.pack("<H", 4)  # image width
    with pytest.raises(ValueError, match="underrun"):
        decode_gif(bytes(grown))


# ---------------------------------------------------------------------------
# MJPEG-in-AVI video (round-5: the video gate-closer)
# ---------------------------------------------------------------------------


def test_avi_handbuilt_bytes_decode():
    """An AVI built BY HAND (independent of encode_avi_mjpeg) walks to the
    declared dims and frame payloads — guards a symmetric encoder/decoder
    co-bug.  Frame payloads are sentinels (the container walk is under test,
    not the JPEG codec); one is odd-length to exercise RIFF even padding."""
    import struct

    from librecatastro_ray.pipelines.multimodal import decode_avi_mjpeg

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    f1, f2 = b"JPGDATA", b"JPGDATA2"  # 7 (odd) and 8 bytes
    avih = struct.pack("<14I", 100000, 0, 0, 0x10, 2, 0, 1, 0, 16, 8,
                       0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", f1) + chunk(b"00dc", f2))
    body = b"AVI " + hdrl + movi
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    w, h, nf, frames = decode_avi_mjpeg(buf)
    assert (w, h, nf) == (16, 8, 2)
    assert frames == [f1, f2]


def test_avi_roundtrip_matches_generation_rule():
    """Full engine path: container walk + per-frame entropy decode equals
    the even-constant-block generation rule bit-exactly (the lossless
    Annex-K round-trip argument, per frame)."""
    from librecatastro_ray.pipelines.multimodal import (
        _synth_avi, decode_avi_mjpeg, decode_jpeg,
    )

    for d in (0, 1, 5, 11, 123, 998):
        w, h, nf, frames = decode_avi_mjpeg(_synth_avi(d))
        nbx, nby = 2 + d % 3, 2 + d % 2
        assert (w, h, nf) == (nbx * 8, nby * 8, 2 + d % 4)
        bi = np.arange(nby * nbx, dtype=np.int64)
        for f_i, fr in enumerate(frames):
            fw, fh, c, img = decode_jpeg(fr)
            assert (fw, fh, c) == (w, h, 1)
            vals = (2 * ((d * 37 + f_i * 53 + bi * 41) % 128)).reshape(nby, nbx)
            assert (img == np.kron(vals, np.ones((8, 8), int))).all(), (d, f_i)


def test_avi_guards():
    import struct

    from librecatastro_ray.pipelines.multimodal import (
        _synth_avi, decode_avi_mjpeg,
    )

    with pytest.raises(ValueError, match="not a RIFF"):
        decode_avi_mjpeg(b"JUNKJUNKJUNK")
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_avi_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    buf = _synth_avi(7)
    with pytest.raises(ValueError, match="truncated"):
        decode_avi_mjpeg(buf[:-10])
    # frame-count lie: avih says one more frame than movi carries
    lying = bytearray(buf)
    ix = buf.index(b"avih")
    n = struct.unpack("<I", buf[ix + 8 + 16:ix + 8 + 20])[0]
    lying[ix + 8 + 16:ix + 8 + 20] = struct.pack("<I", n + 1)
    with pytest.raises(ValueError, match="declares"):
        decode_avi_mjpeg(bytes(lying))


def test_video_features_known_values(tmp_path):
    """VideoFeatures over a tiny corpus: per-video integer features equal
    the generation-rule replay (sum over frames of 64 * block values)."""
    import pyarrow.parquet as pq

    from librecatastro_ray.pipelines.multimodal import video_features

    pq.write_table(
        pa.table({"doc_id": pa.array([0, 3, 10], pa.int64())}),
        str(tmp_path / "documents.parquet"),
    )
    out = video_features(str(tmp_path)).to_pandas().set_index("doc_id")
    for d in (0, 3, 10):
        nbx, nby, nf = 2 + d % 3, 2 + d % 2, 2 + d % 4
        bi = np.arange(nby * nbx, dtype=np.int64)
        fsums = [int(64 * (2 * ((d * 37 + f * 53 + bi * 41) % 128)).sum())
                 for f in range(nf)]
        r = out.loc[d]
        assert (r["n_frames"], r["width"], r["height"]) == (nf, nbx * 8, nby * 8)
        assert r["sum_first"] == fsums[0]
        assert r["sum_last"] == fsums[-1]
        assert r["sum_all"] == sum(fsums)
