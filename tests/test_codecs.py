"""Real dependency-free image codecs (PPM/PGM/BMP) and their wiring
through the multimodal decoder/resizer seam: roundtrip exactness,
format quirks (BMP row padding, bottom-up rows, BGR order, PNM header
comments), numpy-oracle features, nearest-neighbor resize parity."""

import numpy as np
import pytest

from webtext_extraction_spark.operators.codecs import (
    _png_chunk,
    decode_bmp,
    decode_image,
    decode_png,
    decode_pnm,
    encode_bmp,
    encode_png,
    encode_ppm,
    image_feature,
    image_resizer,
    resize_nearest,
)


def _img(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_exact():
    for h, w in [(1, 1), (2, 4), (7, 5), (16, 33)]:
        arr = _img(h, w, seed=h * 100 + w)
        assert np.array_equal(decode_pnm(encode_ppm(arr)), arr)


def test_pgm_roundtrip_and_gray_lift():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    payload = encode_ppm(gray)
    assert payload.startswith(b"P5")
    assert np.array_equal(decode_pnm(payload), gray)
    lifted = decode_image(payload)
    assert lifted.shape == (3, 4, 3)
    assert np.array_equal(lifted[:, :, 0], gray)


def test_pnm_header_comments_and_whitespace():
    arr = _img(2, 3)
    body = np.ascontiguousarray(arr).tobytes()
    payload = b"P6 # comment here\n# another\n 3\t2 # dims\n255\n" + body
    assert np.array_equal(decode_pnm(payload), arr)


def test_bmp_roundtrip_exact_including_padded_widths():
    # width 5: 3*5=15 bytes/row -> padded to 16; width 4: no padding
    for h, w in [(1, 1), (3, 5), (2, 4), (9, 7)]:
        arr = _img(h, w, seed=h * 10 + w)
        payload = encode_bmp(arr)
        assert payload[:2] == b"BM"
        assert np.array_equal(decode_bmp(payload), arr)


def test_bmp_bottom_up_and_bgr_are_real():
    # one red pixel top-left on black: in the file it must appear in
    # the LAST row (bottom-up) with B,G,R byte order
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    arr[0, 0] = [255, 0, 0]
    payload = encode_bmp(arr)
    stride = 8  # 3*2 -> padded to 8
    rows = payload[54:]
    assert rows[stride : stride + 3] == b"\x00\x00\xff"  # BGR of red, last row=top
    assert rows[0:3] == b"\x00\x00\x00"
    assert np.array_equal(decode_bmp(payload), arr)


def test_decoders_reject_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_image(b"JPEGnope")
    with pytest.raises(ValueError):
        decode_pnm(b"P6\n4 4\n255\n" + b"\x00" * 5)  # truncated pixels
    arr = _img(4, 4)
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(arr)[:30])
    with pytest.raises(ValueError):
        decode_pnm(b"P6\n2 2\n65535\n" + b"\x00" * 12)  # 16-bit maxval


def test_resize_nearest_matches_manual_grid():
    arr = _img(4, 6, seed=3)
    out = resize_nearest(arr, 3, 2)
    for y in range(2):
        for x in range(3):
            assert np.array_equal(out[y, x], arr[(y * 4) // 2, (x * 6) // 3])
    up = resize_nearest(arr, 12, 8)  # upscale repeats pixels
    assert up.shape == (8, 12, 3)
    assert np.array_equal(up[::2, ::2], arr)


def test_image_feature_matches_numpy_oracle():
    arr = _img(8, 16, seed=11)
    feats = image_feature(encode_ppm(arr), "image")
    a = arr.astype(np.float64) / 255.0
    luma = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    expect = [
        16 / 4096.0,
        8 / 4096.0,
        a[:, :, 0].mean(),
        a[:, :, 1].mean(),
        a[:, :, 2].mean(),
        luma.std(),
        16 / 24.0,
        (a.max(axis=2) > 0).mean(),
    ]
    assert len(feats) == 8
    for got, exp in zip(feats, expect):
        assert abs(got - exp) < 1e-6
    with pytest.raises(ValueError):
        image_feature(encode_ppm(arr), "audio")


def _real_media(spark, n=9):
    """Media table whose image payloads are REAL encoded PPM/BMP."""
    from webtext_extraction_spark.operators.multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        h, w = 2 + i % 4, 3 + i % 5
        arr = _img(h, w, seed=i)
        payload = encode_bmp(arr) if i % 2 else encode_ppm(arr)
        rows.append((i, "image", bytearray(payload), w, h, "ppm" if i % 2 == 0 else "bmp", 1))
    rows.append((n, "audio", bytearray(b"\x01\x02\x03"), 0, 0, "pcm", 0))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_real_decoder_through_spark_seam(spark):
    """decode_stub=False with the REAL codec: features computed on
    executors match the local numpy derivation per row."""
    from webtext_extraction_spark.operators.multimodal import extract_media_features

    media = _real_media(spark).filter("modality = 'image'")
    local = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    rows = extract_media_features(
        media, decode_stub=False, decoder=image_feature
    ).collect()
    assert len(rows) == len(local)
    for r in rows:
        assert r["n_bytes"] == len(local[r["media_id"]])
        expect = image_feature(local[r["media_id"]], "image")
        assert [pytest.approx(x, abs=1e-6) for x in expect] == list(r["feature"])


def test_real_resizer_through_spark_seam(spark):
    """resize_media with the REAL codec: output payloads decode to the
    target dims, equal the local nearest-neighbor reference, stay in
    the source container format, and non-image rows pass through."""
    from webtext_extraction_spark.operators.multimodal import resize_media

    media = _real_media(spark)
    local = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    out = resize_media(
        media, target_width=5, target_height=4, decode_stub=False, resizer=image_resizer
    ).collect()
    for r in out:
        if r["modality"] != "image":
            assert bytes(r["payload"]) == local[r["media_id"]]
            continue
        payload = bytes(r["payload"])
        assert payload[:2] == local[r["media_id"]][:2]  # container preserved
        got = decode_image(payload)
        assert got.shape == (4, 5, 3)
        ref = resize_nearest(decode_image(local[r["media_id"]]), 5, 4)
        assert np.array_equal(got, ref)
        assert (r["meta_width"], r["meta_height"]) == (5, 4)


def test_png_roundtrip_every_filter_and_color_type():
    """Every scanline filter (None/Sub/Up/Average/Paeth) x every
    supported color type roundtrips bit-exactly — the encoder's
    per-filter forward pass is the reference for the decoder's
    unfilter paths."""
    for ft in range(5):
        for shape in [(5, 7), (5, 7, 2), (5, 7, 3), (5, 7, 4), (1, 1), (3, 1, 3)]:
            arr = np.random.RandomState(ft * 31 + len(shape)).randint(
                0, 256, size=shape, dtype=np.uint8
            )
            payload = encode_png(arr, filter_type=ft)
            assert payload[:8] == b"\x89PNG\r\n\x1a\n"
            assert np.array_equal(decode_png(payload), arr)


def test_png_alpha_policy_and_gray_lift():
    rgba = np.random.RandomState(5).randint(0, 256, size=(4, 6, 4), dtype=np.uint8)
    lifted = decode_image(encode_png(rgba))
    assert lifted.shape == (4, 6, 3)
    assert np.array_equal(lifted, rgba[:, :, :3])  # alpha dropped, never composited
    ga = np.random.RandomState(6).randint(0, 256, size=(3, 5, 2), dtype=np.uint8)
    lifted = decode_image(encode_png(ga))
    assert lifted.shape == (3, 5, 3)
    assert np.array_equal(lifted[:, :, 0], ga[:, :, 0])


def test_png_multiple_idat_chunks_concatenate():
    import struct as _struct

    arr = np.random.RandomState(9).randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
    payload = encode_png(arr)
    # split the single IDAT into two chunks at an arbitrary byte
    sig, rest = payload[:8], payload[8:]
    (ihdr_len,) = _struct.unpack_from(">I", rest, 0)
    ihdr_end = 12 + ihdr_len
    (idat_len,) = _struct.unpack_from(">I", rest, ihdr_end)
    idat = rest[ihdr_end + 8 : ihdr_end + 8 + idat_len]
    tail = rest[ihdr_end + 12 + idat_len :]
    a, b = idat[:3], idat[3:]
    rebuilt = (
        sig
        + rest[:ihdr_end]
        + _png_chunk(b"IDAT", a)
        + _png_chunk(b"IDAT", b)
        + tail
    )
    assert np.array_equal(decode_png(rebuilt), arr)


def test_png_rejects_corruption_and_unsupported():
    arr = np.random.RandomState(2).randint(0, 256, size=(3, 3, 3), dtype=np.uint8)
    payload = bytearray(encode_png(arr))
    payload[40] ^= 0xFF  # flip a data byte -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))
    good = encode_png(arr)
    with pytest.raises(ValueError):
        decode_png(good[:20])  # truncated
    # 16-bit depth in IHDR still unsupported
    import struct as _struct

    ihdr = _struct.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)
    # palette color type without a PLTE chunk
    ihdr = _struct.pack(">IIBBBBB", 3, 3, 8, 3, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bad)
    # sub-8-bit RGB is not a legal combination
    ihdr = _struct.pack(">IIBBBBB", 3, 3, 4, 2, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)


def test_png_through_resizer_seam_preserves_container():
    arr = np.random.RandomState(4).randint(0, 256, size=(6, 8, 3), dtype=np.uint8)
    out = image_resizer(encode_png(arr), 4, 3)
    assert out[:8] == b"\x89PNG\r\n\x1a\n"
    got = decode_png(out)
    assert got.shape == (3, 4, 3)
    assert np.array_equal(got, resize_nearest(arr, 4, 3))
    # feature seam accepts PNG payloads
    feats = image_feature(encode_png(arr), "image")
    assert feats == image_feature(encode_ppm(arr), "image")


from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**31 - 1))
def test_codec_roundtrips_fuzz(h, w, seed):
    """All three containers roundtrip bit-exactly for arbitrary dims
    (every BMP padding residue included) and arbitrary content."""
    arr = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_ppm(arr)), arr)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)
    assert np.array_equal(decode_png(encode_png(arr, filter_type=seed % 5)), arr)
    tw, th = (w % 7) + 1, (h % 5) + 1
    out = decode_image(image_resizer(encode_bmp(arr), tw, th))
    assert out.shape == (th, tw, 3)
    assert np.array_equal(out, resize_nearest(arr, tw, th))


# ---------------------------------------------------------------------------
# JPEG (baseline sequential)
# ---------------------------------------------------------------------------

import struct

from webtext_extraction_spark.operators.codecs import (
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    decode_jpeg,
    encode_jpeg,
)


def _ycbcr_roundtrip(img):
    """The deterministic integer YCbCr roundtrip a flat-quantizer JPEG
    of a per-block-constant image must reproduce EXACTLY."""
    ycc = _rgb_to_ycbcr(img)
    return _ycbcr_to_rgb(ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2])


def test_jpeg_constant_color_exact_all_modes():
    """Constant images are bit-exact through encode→decode with a flat
    quantizer (DC-only blocks): every subsampling mode, odd dims,
    restart intervals."""
    for r, g, b in [(0, 0, 0), (255, 255, 255), (13, 200, 77), (128, 128, 128)]:
        img = np.zeros((11, 13, 3), np.uint8)
        img[:] = (r, g, b)
        for sub, dri in [("444", 0), ("420", 0), ("420", 1), ("444", 2)]:
            dec = decode_jpeg(
                encode_jpeg(img, quant=1, subsampling=sub, restart_interval=dri)
            )
            assert np.array_equal(dec, _ycbcr_roundtrip(img)), (r, g, b, sub, dri)


def test_jpeg_tiled_blocks_exact():
    """Per-8x8-block-constant images stay exact at 4:4:4 (each block is
    DC-only; DC prediction crosses blocks with both diff signs)."""
    img = np.zeros((16, 24, 3), np.uint8)
    for ty in range(2):
        for tx in range(3):
            t = ty * 3 + tx
            img[ty * 8 : ty * 8 + 8, tx * 8 : tx * 8 + 8] = (
                (t * 40) % 256, (t * 40 + 85) % 256, (t * 40 + 170) % 256,
            )
    dec = decode_jpeg(encode_jpeg(img, quant=1))
    assert np.array_equal(dec, _ycbcr_roundtrip(img))
    # grayscale tiles skip color conversion: decode == input exactly
    gray = np.random.RandomState(3).randint(
        0, 256, size=(3, 4), dtype=np.uint8
    ).repeat(8, 0).repeat(8, 1)
    dec = decode_jpeg(encode_jpeg(gray, quant=1, restart_interval=2))
    assert np.array_equal(dec, gray)


def test_jpeg_near_lossless_bounds():
    """Flat quantizer (all 1s) on arbitrary content: gray is within ±1
    (DCT round only); color 4:4:4 within ±4 of the YCbCr integer
    roundtrip (±0.5 coefficient quantization error amplified ≤1.772×
    through the chroma→B conversion, summed over paths)."""
    for seed in range(6):
        rng = np.random.RandomState(seed)
        gray = rng.randint(0, 256, size=(17, 19), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(gray, quant=1))
        assert np.abs(dec.astype(int) - gray.astype(int)).max() <= 1
        img = rng.randint(0, 256, size=(24, 31, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quant=1))
        err = np.abs(dec.astype(int) - _ycbcr_roundtrip(img).astype(int)).max()
        assert err <= 4, err


def test_jpeg_coarse_quant_and_quant_recovery():
    img = np.random.RandomState(1).randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    payload = encode_jpeg(img, quant=(7, 9), subsampling="420", restart_interval=3)
    dec, qt = decode_jpeg(payload, return_quant=True)
    assert dec.shape == img.shape
    assert qt[0][0, 0] == 7 and qt[1][0, 0] == 9
    assert qt[0].shape == (8, 8)


def test_jpeg_hand_built_bitstream():
    """Independent spec check: a JPEG assembled BYTE BY HAND in this
    test (custom single-code Huffman tables, entropy bits written from
    T.81's rules, never from the encoder) must decode to the exact
    pixels the DC-only IDCT rule predicts — catching an encoder and
    decoder that agree with each other but not with the spec."""

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    def hand_jpeg(entropy_byte):
        dqt = bytes([0]) + bytes([1] * 64)
        sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0))
        # DC table: single code '0' (length 1) -> category 4
        dht_dc = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([4])
        # AC table: single code '0' (length 1) -> EOB
        dht_ac = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
        sos = bytes([1]) + bytes((1, 0x00)) + bytes((0, 63, 0))
        return (
            b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof)
            + seg(0xC4, dht_dc) + seg(0xC4, dht_ac) + seg(0xDA, sos)
            + bytes([entropy_byte]) + b"\xff\xd9"
        )

    # bits: DC code '0', diff +9 -> '1001', EOB '0', pad '11'
    # DC=9 -> idct 9/8=1.125 -> +128 -> round-half-up 129 everywhere
    out = decode_jpeg(hand_jpeg(0b01001011))
    assert out.shape == (8, 8) and np.all(out == 129)
    # diff -9 encodes as -9 + 2^4 - 1 = 6 -> '0110'; 126.875 -> 127
    out = decode_jpeg(hand_jpeg(0b00110011))
    assert np.all(out == 127)


def test_jpeg_rejects_unsupported_and_corruption():
    img = np.random.RandomState(2).randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = encode_jpeg(img, quant=1)
    # progressive: flip SOF0 -> SOF2
    bad = bytearray(payload)
    bad[bad.find(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(bad))
    # 16-bit quantization table: set DQT precision nibble
    bad = bytearray(payload)
    bad[bad.find(b"\xff\xdb") + 4] = 0x10
    with pytest.raises(ValueError, match="16-bit"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(payload[: len(payload) // 2])
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x11" + payload[2:])
    with pytest.raises(ValueError):
        encode_jpeg(img, quant=0)  # quantizer out of range
    with pytest.raises(ValueError):
        encode_jpeg(img, subsampling="422x")


def test_jpeg_through_seam():
    # gray JPEG lifts to 3 channels via decode_image
    gray = np.full((8, 16), 200, np.uint8)
    lifted = decode_image(encode_jpeg(gray, quant=1))
    assert lifted.shape == (8, 16, 3) and np.all(lifted == 200)
    # resizer keeps the JPEG container AND the source's rate point
    img = np.zeros((16, 16, 3), np.uint8)
    img[:] = (13, 200, 77)
    out = image_resizer(encode_jpeg(img, quant=(5, 11)), 8, 8)
    assert out[:2] == b"\xff\xd8"
    dec, qt = decode_jpeg(out, return_quant=True)
    assert dec.shape == (8, 8, 3)
    assert qt[0][0, 0] == 5 and qt[1][0, 0] == 11
    # at the flat-1 rate point the resize chain stays exact:
    # decode(q=1) -> nearest(8x8 of a constant) -> encode(q=1)
    exact = decode_jpeg(image_resizer(encode_jpeg(img, quant=1), 8, 8))
    assert np.array_equal(exact, _ycbcr_roundtrip(_ycbcr_roundtrip(img)[:8, :8]))
    # feature seam accepts JPEG payloads
    feats = image_feature(encode_jpeg(img, quant=1), "image")
    assert len(feats) == 8 and feats[7] == 1.0


# ---------------------------------------------------------------------------
# MJPEG video in an AVI container
# ---------------------------------------------------------------------------

from webtext_extraction_spark.operators.codecs import (
    encode_mjpeg_avi,
    mjpeg_frame_payloads,
    video_frame_features,
)


def _avi_fixture(n_frames=7, h=8, w=16):
    frames = []
    for f in range(n_frames):
        img = np.zeros((h, w, 3), np.uint8)
        base = (11 * f + 40) % 256
        img[:] = (base, (base + 85) % 256, (base + 170) % 256)
        frames.append(img)
    return frames, encode_mjpeg_avi(frames, fps=5)


def test_avi_container_walk_recovers_exact_jpeg_frames():
    frames, avi = _avi_fixture()
    payloads = mjpeg_frame_payloads(avi)
    assert len(payloads) == 7
    for f, p in enumerate(payloads):
        assert p == encode_jpeg(frames[f], quant=1)  # byte-exact chunks
        assert np.array_equal(decode_jpeg(p), _ycbcr_roundtrip(frames[f]))


def test_avi_frame_sampling_stride_and_features():
    _, avi = _avi_fixture()
    out = video_frame_features(avi, 3)
    assert [o[0] for o in out] == [0, 3, 6]
    assert all(o[1] == 7 for o in out)
    payloads = mjpeg_frame_payloads(avi)
    assert out[1][2] == image_feature(payloads[3], "image")
    assert len(video_frame_features(avi, 1)) == 7
    with pytest.raises(ValueError, match="every_n"):
        video_frame_features(avi, 0)


def test_avi_rejects_non_avi_and_truncation():
    _, avi = _avi_fixture(3)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        mjpeg_frame_payloads(b"RIFF\x04\x00\x00\x00WAVE")
    for cut in (40, 100, len(avi) - 1):
        with pytest.raises(ValueError, match="truncated"):
            mjpeg_frame_payloads(avi[:cut])
    with pytest.raises(ValueError, match="frame"):
        encode_mjpeg_avi([])


def test_extract_video_frames_real_path_through_spark_seam(spark):
    from webtext_extraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_video_frames,
    )

    frames5, avi5 = _avi_fixture(5)
    frames8, avi8 = _avi_fixture(8)
    media = spark.createDataFrame(
        [
            (0, "video", bytearray(avi5), 16, 8, "mjpeg", 5),
            (1, "video", bytearray(avi8), 16, 8, "mjpeg", 99),  # lying metadata
            (2, "image", bytearray(b"P6\n1 1\n255\nabc"), 1, 1, "ppm", 1),
        ],
        MEDIA_SCHEMA,
    )
    got = (
        extract_video_frames(
            media, every_n=4, decode_stub=False, decoder=video_frame_features
        )
        .orderBy("media_id", "frame_idx")
        .collect()
    )
    # video 0: frames 0, 4; video 1: frames 0, 4; image row filtered out
    assert [(r["media_id"], r["frame_idx"]) for r in got] == [
        (0, 0), (0, 4), (1, 0), (1, 4),
    ]
    # real n_frames comes from the CONTAINER, not the metadata column
    assert [r["n_frames"] for r in got] == [5, 5, 8, 8]
    exp = image_feature(mjpeg_frame_payloads(avi5)[4], "image")
    assert list(got[1]["feature"]) == pytest.approx(exp)


def test_extract_video_frames_stub_path_and_validation(spark):
    from webtext_extraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_video_frames,
    )

    media = spark.createDataFrame(
        [(0, "video", bytearray(b"fakebytes"), 4, 4, "fake", 7)], MEDIA_SCHEMA
    )
    got = extract_video_frames(media, every_n=3).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in got] == [0, 3, 6]
    assert all(r["n_frames"] == 7 for r in got)
    with pytest.raises(NotImplementedError, match="MJPEG"):
        extract_video_frames(media, decode_stub=False)
    with pytest.raises(ValueError, match="every_n"):
        extract_video_frames(media, every_n=0)


# ---------------------------------------------------------------------------
# WAV PCM audio
# ---------------------------------------------------------------------------

import math

from webtext_extraction_spark.operators.codecs import (
    audio_feature,
    decode_wav,
    encode_wav,
    media_feature,
)


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.RandomState(1)
    mono = rng.randint(-32768, 32768, 200).astype(np.int16)
    s, r = decode_wav(encode_wav(mono, 8000))
    assert r == 8000 and s.shape == (200, 1)
    assert np.array_equal(s[:, 0], mono)
    st = rng.randint(-32768, 32768, (150, 2)).astype(np.int16)
    s, r = decode_wav(encode_wav(st, 44100))
    assert r == 44100 and s.shape == (150, 2)
    assert np.array_equal(s, st)


def test_audio_feature_matches_numpy_oracle():
    rng = np.random.RandomState(2)
    mono = rng.randint(-32768, 32768, 300).astype(np.int16)
    f = audio_feature(encode_wav(mono, 16000), "audio")
    x = mono.astype(np.int64)
    assert abs(f[0] - 300 / 16000 / 3600) < 1e-9
    assert abs(f[1] - 16000 / 96000) < 1e-6
    assert abs(f[2] - 1 / 8) < 1e-9
    assert abs(f[3] - math.sqrt(float((x * x).sum()) / 300) / 32768) < 1e-6
    assert abs(f[4] - np.abs(x).max() / 32768) < 1e-6
    zc = ((mono[1:] >= 0) != (mono[:-1] >= 0)).sum() / 299
    assert abs(f[5] - zc) < 1e-6
    assert abs(f[7] - (mono != 0).mean()) < 1e-6
    with pytest.raises(ValueError, match="modality"):
        audio_feature(encode_wav(mono, 16000), "image")


def test_wav_rejects_non_wav_and_malformed():
    mono = np.zeros(10, np.int16)
    payload = encode_wav(mono, 8000)
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"RIFF\x04\x00\x00\x00AVI ")
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(payload[:30])
    bad = bytearray(payload)
    bad[20] = 3  # IEEE-float format tag
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError):
        encode_wav(np.zeros((0,), np.int16), 8000)
    with pytest.raises(ValueError):
        encode_wav(mono, 0)


def test_media_feature_dispatches_by_modality():
    wav = encode_wav(np.arange(-50, 50, dtype=np.int16), 8000)
    ppm = encode_ppm(_img(2, 3))
    assert media_feature(wav, "audio") == audio_feature(wav, "audio")
    assert media_feature(ppm, "image") == image_feature(ppm, "image")
    with pytest.raises(ValueError, match="modality"):
        media_feature(wav, "video")


def test_audio_through_spark_seam(spark):
    from webtext_extraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    rng = np.random.RandomState(3)
    payloads = {
        i: encode_wav(rng.randint(-32768, 32768, 100 + i).astype(np.int16), 8000)
        for i in range(4)
    }
    media = spark.createDataFrame(
        [(i, "audio", bytearray(p), 0, 0, "pcm16", 0) for i, p in payloads.items()],
        MEDIA_SCHEMA,
    )
    rows = extract_media_features(
        media, decode_stub=False, decoder=media_feature
    ).collect()
    assert len(rows) == 4
    for r in rows:
        exp = audio_feature(payloads[r["media_id"]], "audio")
        assert list(r["feature"]) == pytest.approx(exp)
        assert r["n_bytes"] == len(payloads[r["media_id"]])


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_equals_baseline_pixels_exactly():
    """Progressive transmission reorders the same quantized
    coefficients, so for ANY content/subsampling/restart/quantizer the
    decoded pixels must equal the baseline encoding bit-for-bit —
    the invariant that catches most scan-logic bugs."""
    rng = np.random.RandomState(7)
    cases = [
        ((11, 13, 3), "444", 0, 1),
        ((24, 31, 3), "444", 0, 1),
        ((17, 19), "444", 0, 1),
        ((16, 24, 3), "420", 0, 1),
        ((9, 15, 3), "420", 2, 1),
        ((32, 16), "444", 1, 1),
        ((40, 56, 3), "444", 0, 5),
        ((40, 56, 3), "420", 3, 16),
    ]
    for shape, sub, dri, q in cases:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        kw = dict(quant=q, restart_interval=dri)
        if len(shape) == 3:
            kw["subsampling"] = sub
        base = decode_jpeg(encode_jpeg(img, **kw))
        prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
        assert np.array_equal(base, prog), (shape, sub, dri, q)


def test_progressive_constant_color_stays_bit_exact():
    img = np.zeros((11, 13, 3), np.uint8)
    img[:] = (13, 200, 77)
    for sub in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(img, quant=1, subsampling=sub, progressive=True))
        assert np.array_equal(dec, _ycbcr_roundtrip(img)), sub


def test_progressive_hand_built_bitstream_with_multiblock_eobrun():
    """A 16x8 gray SOF2 file assembled byte-by-hand from T.81 G's
    rules: DC first (Al=1) + DC refine, AC first whose EOB RUN OF 2
    spans both blocks (a shape the bundled encoder never emits), and
    an AC refinement pass with a correction bit inside the EOB sweep.
    Expected pixels derive from the raw cosine formula in this test,
    independent of the decoder's IDCT machinery."""

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    dqt = bytes([0]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes((1, 0x11, 0))
    # DC: '00'->cat 0, '01'->cat 4; AC: '00'->0x01, '01'->0x10, '10'->EOB
    dht_dc = bytes([0x00]) + bytes([0, 2] + [0] * 14) + bytes([0, 4])
    dht_ac = bytes([0x10]) + bytes([0, 3] + [0] * 14) + bytes([0x01, 0x10, 0x00])

    def sos(ss, se, ah, al):
        return seg(0xDA, bytes((1, 1, 0x00, ss, se, (ah << 4) | al)))

    payload = (
        b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC2, sof)
        + seg(0xC4, dht_dc) + seg(0xC4, dht_ac)
        # DC first Al=1: blk1 diff 9 ('01'+'1001'), blk2 diff 0 ('00')
        + sos(0, 0, 0, 1) + bytes([0b01100100])
        # DC refine: blk1 bit 1, blk2 bit 0 -> DC = 19, 18
        + sos(0, 0, 1, 0) + bytes([0b10111111])
        # AC first Al=1: blk1 k=1 coeff +1<<1, then EOBRUN=2 covering
        # blk1's rest AND all of blk2: '00'+'1'+'01'+'0', pad '11'
        + sos(1, 63, 0, 1) + bytes([0b00101011])
        # AC refine: blk1 EOB + correction bit 1 (2 -> 3), blk2 EOB
        + sos(1, 63, 1, 0) + bytes([0b10110111])
        + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (8, 16)

    # independent expectation from the raw cosine formula
    x = np.arange(8)
    cos1 = np.cos((2 * x + 1) * np.pi / 16.0)
    # S(u=0, v=1): s(x,y) = (1/4) C(0)C(1) S cos(0) cos((2y+1)pi/16)
    blk1 = 19 / 8.0 + (1 / 4.0) * (1 / np.sqrt(2)) * 1.0 * 3 * cos1[None, :] * np.ones((8, 1))
    exp1 = np.clip(np.floor(blk1 + 128.0 + 0.5), 0, 255).astype(np.uint8)
    assert np.array_equal(out[:, :8], exp1)
    assert np.all(out[:, 8:] == np.floor(18 / 8.0 + 128.0 + 0.5))


def test_progressive_through_image_seam():
    img = np.zeros((8, 16, 3), np.uint8)
    img[:] = (40, 90, 200)
    payload = encode_jpeg(img, quant=1, progressive=True)
    feats = image_feature(payload, "image")
    assert feats == image_feature(encode_jpeg(img, quant=1), "image")
    out = image_resizer(payload, 8, 4)
    assert out[:2] == b"\xff\xd8"
    assert decode_jpeg(out).shape == (4, 8, 3)


def test_png_adam7_interlaced_roundtrip_every_filter():
    """Adam7 passes are independently filtered sub-images; every
    filter × color type × odd/tiny dims must roundtrip bit-exactly
    (tiny dims exercise empty passes)."""
    rng = np.random.RandomState(9)
    for ft in range(5):
        for shape in [(1, 1), (3, 2), (9, 13, 3), (8, 8, 4), (5, 7, 2), (2, 17)]:
            arr = rng.randint(0, 256, shape).astype(np.uint8)
            p = encode_png(arr, filter_type=ft, interlace=True)
            assert np.array_equal(decode_png(p), arr), (ft, shape)


def test_png_palette_roundtrip_all_depths():
    rng = np.random.RandomState(10)
    img = rng.randint(0, 4, (11, 13, 3)).astype(np.uint8) * 80
    assert np.array_equal(decode_png(encode_png(img, palette=True)), img)
    # interlaced palette too
    p = encode_png(img, palette=True, interlace=True, filter_type=2)
    assert np.array_equal(decode_png(p), img)
    for d in (1, 2, 4):
        colors = np.array(
            [[0, 0, 0], [255, 10, 20], [9, 200, 70], [50, 60, 250]][: 1 << min(d, 2)],
            np.uint8,
        )
        img2 = colors[rng.randint(0, len(colors), (6, 10))]
        assert np.array_equal(
            decode_png(encode_png(img2, palette=True, bit_depth=d)), img2
        ), d
    with pytest.raises(ValueError, match="colors exceed"):
        encode_png(rng.randint(0, 256, (4, 4, 3)).astype(np.uint8),
                   palette=True, bit_depth=2)


def test_png_sub8bit_gray_exact_scaling():
    """Depths 1/2/4 scale by exactly 255/(2^d - 1) (255/85/17 — all
    integers), so sub-8-bit gray roundtrips bit-exactly."""
    rng = np.random.RandomState(11)
    for d, scale in ((1, 255), (2, 85), (4, 17)):
        g = (rng.randint(0, 1 << d, (7, 9)) * scale).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(g, bit_depth=d)), g)
        p = encode_png(g, bit_depth=d, interlace=True, filter_type=1)
        assert np.array_equal(decode_png(p), g)
    with pytest.raises(ValueError, match="multiples"):
        encode_png(np.array([[3]], np.uint8), bit_depth=2)


# ---------------------------------------------------------------------------
# GIF: LZW, palettes, interlace, animation, hand-built decoder forms
# ---------------------------------------------------------------------------

from webtext_extraction_spark.operators.codecs import (  # noqa: E402
    _gif_subblocks,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_frames,
    video_frame_features,
)


def test_gif_lzw_roundtrip_with_table_saturation():
    """60k random indices force the 12-bit table to saturate — the
    deferred-clear regime (frozen table) must roundtrip exactly for
    every min code size."""
    rng = np.random.RandomState(11)
    for mcs in (2, 3, 8):
        idx = rng.randint(0, 1 << mcs, 60000).tolist()
        assert _lzw_decode(mcs, _lzw_encode(mcs, idx), len(idx)) == idx


def test_gif_lzw_rejects_truncation_and_overflow_codes():
    enc = _lzw_encode(2, [0, 1, 2, 3] * 10)
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode(2, enc[:2], 40)
    with pytest.raises(ValueError, match="more pixels"):
        _lzw_decode(2, enc, 3)  # frame smaller than the stream


def test_gif_still_roundtrip_paletted_and_interlaced():
    rng = np.random.RandomState(3)
    base = rng.randint(0, 6, (37, 53))
    img = np.stack([base * 40, (base * 40 + 20) % 256,
                    (base * 40 + 90) % 256], -1).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)), img)
    # odd heights exercise every interlace pass boundary
    for h in (1, 2, 3, 5, 8, 9):
        small = img[:h, :7]
        assert np.array_equal(
            decode_gif(encode_gif(small, interlace=True)), small)


def test_gif_256_color_roundtrip_and_lossless_refusal():
    gray = np.stack([np.tile(np.arange(256, dtype=np.uint8), (8, 1))] * 3, -1)
    assert np.array_equal(decode_gif(encode_gif(gray)), gray)
    rng = np.random.RandomState(9)
    noisy = rng.randint(0, 256, (30, 30, 3)).astype(np.uint8)
    assert len(np.unique(noisy.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="lossless-only"):
        encode_gif(noisy)


def test_gif_animation_roundtrip_and_delays():
    rng = np.random.RandomState(5)
    frames = [np.full((16, 24, 3), (i * 37) % 256, np.uint8) for i in range(6)]
    fr, delays = gif_frames(encode_gif(frames, delays_cs=[3, 5, 7, 9, 11, 13]))
    assert delays == [3, 5, 7, 9, 11, 13]
    assert all(np.array_equal(a, b) for a, b in zip(fr, frames))


def _hand_gif(blocks: bytes, w=4, h=2, pal=b"\x00\x00\x00\xff\x00\x00\x00\xff\x00\xff\xff\x00") -> bytes:
    """Minimal hand-assembled GIF89a: 2-bit global palette
    (black, red, green, yellow), then caller-provided blocks."""
    import struct as _s
    head = b"GIF89a" + _s.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0) + pal
    return head + blocks + b"\x3b"


def _hand_image_block(indices, w, h, fx=0, fy=0, lct=None, interlace=False):
    import struct as _s
    packed = (0x40 if interlace else 0)
    body = b""
    if lct is not None:
        depth = {2: 1, 4: 2, 8: 3, 16: 4}[len(lct) // 3]
        packed |= 0x80 | (depth - 1)
        body = lct
    return (b"\x2c" + _s.pack("<HHHHB", fx, fy, w, h, packed) + body
            + b"\x02" + _gif_subblocks(_lzw_encode(2, indices)))


def test_gif_hand_built_transparency_and_subrect_composite():
    """Decoder forms the bundled encoder never writes, assembled
    byte-by-hand from the spec: a 2x2 sub-rectangle frame at (1,0)
    with a transparent index painting over frame 1, then disposal-2
    (restore background) before frame 3."""
    import struct as _s
    f1 = _hand_image_block([1, 1, 1, 1, 1, 1, 1, 1], 4, 2)  # all red
    # GCE: transparent idx 0, disposal 1 (leave)
    gce_t = b"\x21\xf9" + _gif_subblocks(_s.pack("<BHB", (1 << 2) | 1, 5, 0))
    # 2x2 overlay at (1,0): [green, transparent, transparent, yellow]
    f2 = _hand_image_block([2, 0, 0, 3], 2, 2, fx=1, fy=0)
    gif = _hand_gif(f1 + gce_t + f2)
    frames, delays = gif_frames(gif)
    assert len(frames) == 2 and delays == [0, 5]
    red, green, yellow = (255, 0, 0), (0, 255, 0), (255, 255, 0)
    assert frames[0].tolist() == [[list(red)] * 4] * 2
    exp = [[list(red), list(green), list(red), list(red)],
           [list(red), list(red), list(yellow), list(red)]]
    assert frames[1].tolist() == exp


def test_gif_hand_built_disposal_restore_background_and_previous():
    import struct as _s
    f1 = _hand_image_block([1] * 8, 4, 2)
    # disposal 2 on the overlay: after frame 2, region restores to bg
    gce2 = b"\x21\xf9" + _gif_subblocks(_s.pack("<BHB", (2 << 2), 4, 0))
    f2 = _hand_image_block([2, 2, 2, 2], 2, 2, fx=0, fy=0)
    f3 = _hand_image_block([3, 3], 2, 1, fx=2, fy=1)
    frames, _ = gif_frames(_hand_gif(f1 + gce2 + f2 + f3))
    # frame 3 canvas: f2's rect restored to bg color (palette 0 =
    # black), f1 pixels elsewhere, f3's yellow strip
    assert frames[2][0][0].tolist() == [0, 0, 0]  # restored to bg
    assert frames[2][0][2].tolist() == [255, 0, 0]  # f1 red survives
    assert frames[2][1][2].tolist() == [255, 255, 0]  # f3 yellow
    # disposal 3: restore previous — overlay vanishes entirely
    gce3 = b"\x21\xf9" + _gif_subblocks(_s.pack("<BHB", (3 << 2), 4, 0))
    frames3, _ = gif_frames(_hand_gif(f1 + gce3 + f2 + f3))
    assert frames3[2][0][0].tolist() == [255, 0, 0]  # f1 restored


def test_gif_hand_built_local_color_table_overrides_global():
    lct = b"\xff\xff\xff" + b"\x00\x00\xff" + b"\x00\x00\x00" * 2
    f = _hand_image_block([0, 1, 1, 0, 1, 0, 0, 1], 4, 2, lct=lct)
    frames, _ = gif_frames(_hand_gif(f))
    assert frames[0][0][0].tolist() == [255, 255, 255]  # white, not black
    assert frames[0][0][1].tolist() == [0, 0, 255]  # blue, not red


def test_gif_rejects_malformed():
    ok = encode_gif(np.zeros((3, 3, 3), np.uint8))
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + ok[6:])
    with pytest.raises(ValueError, match="trailer|truncated"):
        decode_gif(ok[:-2])
    with pytest.raises(ValueError, match="no image block"):
        decode_gif(ok[:13] + ok[13:13 + 6] + b"\x3b")  # palette then trailer
    bad = bytearray(ok)
    bad[ok.index(b"\x2c")] = 0x7E  # unknown block tag
    with pytest.raises(ValueError, match="unknown GIF block"):
        decode_gif(bytes(bad))


def test_gif_through_image_and_video_seams():
    rng = np.random.RandomState(2)
    base = rng.randint(0, 4, (10, 14))
    img = np.stack([base * 60, base * 30, base * 15], -1).astype(np.uint8)
    payload = encode_gif(img)
    feats = image_feature(payload, "image")
    assert len(feats) == 8 and feats[2] == pytest.approx(
        float(np.float32((img[:, :, 0] / 255.0).mean())))
    resized = image_resizer(payload, 7, 5)
    assert resized[:4] == b"GIF8"
    assert np.array_equal(decode_gif(resized), resize_nearest(img, 7, 5))
    frames = [np.full((8, 8, 3), c, np.uint8) for c in (10, 20, 30, 40)]
    vf = video_frame_features(encode_gif(frames), 3)
    assert [(i, n) for i, n, _ in vf] == [(0, 4), (3, 4)]
    assert vf[1][2][2] == pytest.approx(40 / 255.0, abs=1e-6)
