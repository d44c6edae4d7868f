"""Multimodal decode path: pure-numpy PPM/BMP parsers + Spark plumbing.

Round-2 VERDICT task 2: the decode step is no longer a stub — uncompressed
formats parse with header reads + np.frombuffer; features (width/height/
per-channel means) are closed-form recomputable, so the driver query
`multimodal_features` now has a genuine SQL oracle.
"""

import struct

import numpy as np
import pytest

from yatsm_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
    image_features,
    ppm_payload,
    sniff_media_type,
    synth_ppm_media,
)


def _expected_image(media_id: int) -> np.ndarray:
    w = 16 + media_id % 7
    h = 12 + media_id % 5
    k = np.arange(w * h, dtype=np.int64)
    img = np.empty((h * w, 3), dtype=np.uint8)
    for c in range(3):
        img[:, c] = ((media_id * 31 + c * 97 + k * 13) % 256).astype(np.uint8)
    return img.reshape(h, w, 3)


def _bmp_payload(img: np.ndarray, bottom_up: bool = True) -> bytes:
    """Minimal 24-bit BI_RGB BMP encoder (test-side only)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = img[:, :, ::-1]
    ordered = bgr[::-1] if bottom_up else bgr
    rows[:, : w * 3] = ordered.reshape(h, w * 3)
    pixel_data = rows.tobytes()
    data_off = 14 + 40
    file_size = data_off + len(pixel_data)
    file_header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h if bottom_up else -h,
                              1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return file_header + info_header + pixel_data


@pytest.mark.parametrize("media_id", [0, 3, 17, 123456])
def test_ppm_roundtrip(media_id):
    img = decode_ppm(ppm_payload(media_id))
    np.testing.assert_array_equal(img, _expected_image(media_id))


def test_ppm_header_comments_and_whitespace():
    img = _expected_image(5)
    h, w = img.shape[:2]
    payload = (f"P6 # binary pixmap\n# a comment line\n  {w}\t{h} # dims\n255\n"
               .encode() + img.tobytes())
    np.testing.assert_array_equal(decode_ppm(payload), img)


@pytest.mark.parametrize("bottom_up", [True, False])
@pytest.mark.parametrize("media_id", [2, 9])  # w%4 varies -> row padding paths
def test_bmp_roundtrip(media_id, bottom_up):
    img = _expected_image(media_id)
    np.testing.assert_array_equal(decode_bmp(_bmp_payload(img, bottom_up)), img)


def test_decode_image_dispatch_and_honest_failure():
    np.testing.assert_array_equal(decode_image(ppm_payload(7)),
                                  _expected_image(7))
    img = _expected_image(7)
    np.testing.assert_array_equal(decode_image(_bmp_payload(img)), img)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01unknown container bytes")
    # JPEG now dispatches to the real decoder, which rejects garbage
    # after the SOI marker rather than pretending to decode it
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")


def test_image_features_spark(spark):
    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    media = synth_ppm_media(docs)
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(feats) == 40
    for mid in (0, 11, 39):
        img = _expected_image(mid)
        r = feats[mid]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        means = img.reshape(-1, 3).astype(np.float64).mean(axis=0)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == tuple(means)


def test_sniff_media_type_detects_ppm_and_bmp(spark):
    img = _expected_image(1)
    rows = [(1, bytearray(ppm_payload(1))), (2, bytearray(_bmp_payload(img)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["media_type"]
           for r in sniff_media_type(df).collect()}
    assert got == {1: "image/x-portable-pixmap", 2: "image/bmp"}


def test_resize_identity_matches_image_features(spark):
    # Resizing to the SOURCE dims is the identity: means and sha1 must
    # equal the unresized decode for a fixed-size id set (ids with w=16,
    # h=12: id % 7 == 0 and id % 5 == 0 -> id % 35 == 0).
    from pyspark.sql import Row

    from yatsm_spark.operators.multimodal import (
        image_features,
        resize_images,
        synth_ppm_media,
    )

    docs = spark.createDataFrame([Row(doc_id=i, text="t") for i in (0, 35, 70)])
    media = synth_ppm_media(docs)
    plain = {r.media_id: r for r in image_features(media).collect()}
    rz = {r.media_id: r for r in resize_images(media, 16, 12).collect()}
    import hashlib

    from yatsm_spark.operators.multimodal import decode_image, ppm_payload

    for mid, r in rz.items():
        p = plain[mid]
        assert (r.mean_r, r.mean_g, r.mean_b) == (p.mean_r, p.mean_g, p.mean_b)
        # identity resize = the decoded pixel buffer, byte for byte
        want = hashlib.sha1(decode_image(ppm_payload(mid)).tobytes()).hexdigest()
        assert r.sha1 == want


def test_sample_frames_rule_and_determinism(spark):
    from pyspark.sql import Row

    from yatsm_spark.operators.multimodal import sample_frames, synth_video_media

    docs = spark.createDataFrame([Row(doc_id=i, text="t") for i in range(8)])
    media = synth_video_media(docs)
    out = sample_frames(media, every_k=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    for mid, idxs in by_id.items():
        n_frames = 4 + mid % 4
        assert sorted(idxs) == list(range(0, n_frames, 2))
    # bit-determinism across runs
    again = sample_frames(media, every_k=2).collect()
    assert {(r.media_id, r.frame_idx, r.sha1) for r in out} == \
           {(r.media_id, r.frame_idx, r.sha1) for r in again}


def test_wav_roundtrip_and_rejections(spark):
    from pyspark.sql import Row

    import numpy as np
    import pytest as _pytest

    from yatsm_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        synth_wav_media,
        wav_payload,
    )

    # real decode returns the exact synthesized samples
    rate, x = decode_wav(wav_payload(7))
    assert rate == 8000 and len(x) == 800 + (7 % 5) * 160
    i = np.arange(len(x), dtype=np.int64)
    assert (x == (((7 * 31 + i * 13) % 4096) - 2048).astype(np.int16)).all()

    # hostile payloads raise honestly
    with _pytest.raises(NotImplementedError):
        decode_wav(b"OggS" + b"\x00" * 64)

    docs = spark.createDataFrame([Row(doc_id=i, text="t") for i in range(6)])
    out = audio_features(synth_wav_media(docs)).collect()
    assert len(out) == 6
    for r in out:
        assert r.duration_s == r.n_samples / 8000.0
        # exact against a direct driver-side decode of the same payload
        _, want = decode_wav(wav_payload(r.media_id))
        wf = want.astype(np.float64)
        assert r.mean == wf.sum() / len(wf)
        assert r.rms == float(np.sqrt((wf * wf).sum() / len(wf)))


# ---------------------------------------------------------------------------
# PNG: real compressed decode (chunk walk + CRC + inflate + 5-filter unfilter)


def _scalar_unfilter(stream: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Spec-literal per-byte reference unfilter (PNG spec §9, Recon(x)
    recurrences verbatim) — the independent twin for the vectorized
    decoder."""
    stride = w * bpp
    recon = np.zeros((h, stride), np.int64)
    for r in range(h):
        f = stream[r * (1 + stride)]
        line = np.frombuffer(stream, np.uint8, stride, r * (1 + stride) + 1).astype(np.int64)
        for i in range(stride):
            a = recon[r, i - bpp] if i >= bpp else 0
            b = recon[r - 1, i] if r > 0 else 0
            c = recon[r - 1, i - bpp] if (r > 0 and i >= bpp) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            recon[r, i] = (line[i] + pred) % 256
    return recon.astype(np.uint8)


def _png_from(px: np.ndarray, ctype: int, bpp: int, row_filter, plte=None) -> bytes:
    import zlib

    from yatsm_spark.operators.multimodal import _PNG_SIG, _png_chunk, png_filter_rows

    h, stride = px.shape
    w = stride // bpp
    stream = png_filter_rows(px, bpp, row_filter)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte.tobytes())
    return out + _png_chunk(b"IDAT", zlib.compress(stream, 6)) + _png_chunk(b"IEND", b"")


@pytest.mark.parametrize("media_id", [0, 1, 6, 13, 34, 123456])
def test_png_roundtrip_closed_form(media_id):
    """png_payload cycles the row filter through ALL FIVE types (r % 5,
    h >= 12), so this round trip exercises every unfilter branch."""
    from yatsm_spark.operators.multimodal import decode_png, png_payload

    np.testing.assert_array_equal(decode_png(png_payload(media_id)),
                                  _expected_image(media_id))


@pytest.mark.parametrize("ctype,bpp", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_unfilter_matches_scalar_spec_reference(ctype, bpp):
    from yatsm_spark.operators.multimodal import decode_png, png_filter_rows

    rng = np.random.default_rng(7 + ctype)
    w, h = 11, 9
    px = rng.integers(0, 256, (h, w * bpp), dtype=np.uint8)
    for row_filter in (lambda r: r % 5, lambda r: 4, lambda r: 3,
                       lambda r: (2 * r + 1) % 5):
        payload = _png_from(px, ctype, bpp, row_filter)
        got = decode_png(payload)
        stream = png_filter_rows(px, bpp, row_filter)
        ref = _scalar_unfilter(stream, h, w, bpp).reshape(h, w, bpp)
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got.reshape(h, -1), px)


def test_png_palette_and_hostile_payloads():
    from yatsm_spark.operators.multimodal import decode_png, png_payload

    rng = np.random.default_rng(11)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (5, 7), dtype=np.uint8)
    got = decode_png(_png_from(idx, 3, 1, lambda r: r % 5, plte=plte))
    np.testing.assert_array_equal(got, plte[idx])

    # corrupt a byte -> CRC failure must raise, not return garbage pixels
    p = bytearray(png_payload(5))
    p[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(p))
    # 16-bit depth and Adam7 raise honestly
    from yatsm_spark.operators.multimodal import _PNG_SIG, _png_chunk
    for depth, interlace in ((16, 0), (8, 1)):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, 2, 0, 0, interlace)
        bad = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", b"x") + _png_chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            decode_png(bad)


def test_png_decode_image_dispatch_and_spark_features(spark):
    from pyspark.sql import Row

    from yatsm_spark.operators.multimodal import (
        decode_png, image_features, png_payload, synth_png_media)

    # dispatch: \x89PNG magic routes to the real decoder
    np.testing.assert_array_equal(decode_image(png_payload(9)),
                                  decode_png(png_payload(9)))

    docs = spark.createDataFrame([Row(doc_id=i, text="t") for i in range(8)])
    out = image_features(synth_png_media(docs)).collect()
    assert len(out) == 8
    for r in out:
        img = _expected_image(r.media_id).reshape(-1, 3).astype(np.float64)
        assert (r.width, r.height) == (16 + r.media_id % 7, 12 + r.media_id % 5)
        n = img.shape[0]
        assert (r.mean_r, r.mean_g, r.mean_b) == (
            img[:, 0].sum() / n, img[:, 1].sum() / n, img[:, 2].sum() / n)


# ---------------------------------------------------------------------------
# JPEG (kernel/jpeg.py): baseline-DCT codec, coefficient-lossless at q=100


def _closed_form_coefs(media_id: int):
    """The coefficient closed form jpeg_payload commits to (natural order)."""
    from yatsm_spark.kernel.jpeg import ZIGZAG

    nbx, nby = 2 + media_id % 3, 2 + media_id % 2
    n = nbx * nby
    out = []
    for c in range(3):
        C = np.zeros((n, 64), dtype=np.int64)
        b = np.arange(n, dtype=np.int64)
        C[:, 0] = (media_id * 31 + c * 97 + b * 13) % 129 - 64
        for bi in range(n):
            slot = int(ZIGZAG[1 + (bi + c) % 5])
            C[bi, slot] = (media_id * 7 + bi * 3 + c) % 31 - 15
        out.append(C)
    return out, nby * 8, nbx * 8


@pytest.mark.parametrize("media_id", [0, 1, 5, 42, 123456])
def test_jpeg_coef_roundtrip_is_exactly_lossless(media_id):
    """quality=100 -> all-ones quant tables, so entropy decode must return
    the EXACT integers the payload was synthesized from. This pins the
    whole chain: Huffman table emission, canonical rebuild from the
    stream's own DHT, byte stuffing, DC prediction, run-length AC."""
    from yatsm_spark.kernel.jpeg import decode_jpeg_coefs
    from yatsm_spark.operators.multimodal import jpeg_payload

    want, h, w = _closed_form_coefs(media_id)
    got, gh, gw = decode_jpeg_coefs(jpeg_payload(media_id))
    assert (gh, gw) == (h, w)
    for c in range(3):
        np.testing.assert_array_equal(got[c], want[c])


def test_jpeg_entropy_edge_cases_roundtrip():
    """ZRL (>15-zero runs), max-size AC values, large bipolar DC swings,
    and a final coefficient at slot 63 (no EOB) all survive the entropy
    coder bit-exactly."""
    from yatsm_spark.kernel.jpeg import (ZIGZAG, decode_jpeg_coefs,
                                         encode_jpeg_from_coefs)

    C = [np.zeros((4, 64), dtype=np.int64) for _ in range(3)]
    C[0][:, 0] = [1000, -1000, 0, 1023]          # DC deltas up to cat 11
    C[0][0, int(ZIGZAG[33])] = -511              # 32 leading zeros -> 2x ZRL
    C[0][1, int(ZIGZAG[63])] = 7                 # last slot: no EOB emitted
    C[1][2, int(ZIGZAG[1])] = -1023              # max baseline AC size (10)
    C[2][3, int(ZIGZAG[17])] = 1
    got, h, w = decode_jpeg_coefs(encode_jpeg_from_coefs(C, 16, 16, quality=100))
    assert (h, w) == (16, 16)
    for c in range(3):
        np.testing.assert_array_equal(got[c], C[c])


def test_jpeg_pixel_roundtrip_tolerance():
    """Pixel-space encode->decode: q=100 keeps every channel within the
    rounding envelope of the float DCT (±2); a smooth gradient at q=95
    stays within ±2 as well (quantization error concentrates in high
    frequencies a gradient doesn't have)."""
    from yatsm_spark.kernel.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(noisy, quality=100))
    assert got.shape == noisy.shape
    assert int(np.abs(got.astype(int) - noisy.astype(int)).max()) <= 2

    ramp = np.tile(np.linspace(40, 200, 24).astype(np.uint8), (16, 1))
    smooth = np.stack([ramp, ramp // 2 + 30, 255 - ramp], axis=-1)
    got = decode_jpeg(encode_jpeg(smooth, quality=95))
    assert int(np.abs(got.astype(int) - smooth.astype(int)).max()) <= 2


def test_jpeg_non_multiple_of_8_dims():
    """Edge-replication padding: decode returns the original (h, w), and
    q=100 content error stays in the rounding envelope."""
    from yatsm_spark.kernel.jpeg import decode_jpeg, encode_jpeg

    img = _expected_image(3)  # 19 x 15 — neither dim a multiple of 8
    got = decode_jpeg(encode_jpeg(img, quality=100))
    assert got.shape == img.shape
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_hostile_and_unsupported_payloads():
    from yatsm_spark.kernel.jpeg import decode_jpeg
    from yatsm_spark.operators.multimodal import jpeg_payload

    p = jpeg_payload(5)

    # progressive (SOF2) raises honestly
    prog = p.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)

    # chroma subsampling (samp != 0x11) raises honestly
    sof = p.find(b"\xff\xc0")
    sub = bytearray(p)
    sub[sof + 4 + 7] = 0x22  # first component's sampling byte
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(sub))

    # 16-bit quant tables raise honestly
    dqt = p.find(b"\xff\xdb")
    wide = bytearray(p)
    wide[dqt + 4] |= 0x10
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(wide))

    # truncated entropy stream raises, not garbage pixels
    with pytest.raises(ValueError):
        decode_jpeg(p[:-12])

    # not a JPEG at all
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02\x03")


def test_jpeg_decode_image_dispatch_and_spark_features(spark):
    from pyspark.sql import Row

    from yatsm_spark.kernel.jpeg import decode_jpeg
    from yatsm_spark.operators.multimodal import (
        image_features, jpeg_payload, synth_jpeg_media)

    np.testing.assert_array_equal(decode_image(jpeg_payload(9)),
                                  decode_jpeg(jpeg_payload(9)))

    docs = spark.createDataFrame([Row(doc_id=i, text="t") for i in range(8)])
    out = image_features(synth_jpeg_media(docs)).collect()
    assert len(out) == 8
    for r in out:
        img = decode_jpeg(jpeg_payload(r.media_id))
        nbx, nby = 2 + r.media_id % 3, 2 + r.media_id % 2
        assert (r.width, r.height) == (nbx * 8, nby * 8)
        flat = img.reshape(-1, 3).astype(np.float64)
        n = flat.shape[0]
        assert (r.mean_r, r.mean_g, r.mean_b) == (
            flat[:, 0].sum() / n, flat[:, 1].sum() / n, flat[:, 2].sum() / n)
