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
    # 16-bit depth in IHDR
    import struct as _struct

    ihdr = _struct.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bad)
    # interlaced
    ihdr = _struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 1)
    bad = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bad)
    # palette color type
    ihdr = _struct.pack(">IIBBBBB", 3, 3, 8, 3, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="color type"):
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
