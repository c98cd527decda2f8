"""Baseline JPEG codec (lacspark.jpeg): round-trip fidelity, stream
structure, and the multimodal integration path."""

from __future__ import annotations

import numpy as np
import pytest

from lacspark.jpeg import ZZ, decode_jpeg, encode_jpeg


def _gradient(h, w):
    base = (np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 2) % 256
    return np.stack([base, (base * 2) % 256, 255 - base],
                    axis=-1).astype(np.uint8)


def test_zigzag_is_a_permutation():
    assert sorted(ZZ.tolist()) == list(range(64))
    # canonical start of the zigzag scan
    assert ZZ[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_roundtrip_fidelity_on_smooth_image():
    img = _gradient(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(float) - img.astype(float)).mean()
    assert err < 4.0, err


def test_roundtrip_non_multiple_of_8_and_noise():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    # noise is JPEG's worst case; q90 still bounds the error
    assert np.abs(out.astype(float) - img.astype(float)).mean() < 12.0


def test_flat_image_is_lossless():
    img = (np.ones((8, 8, 3)) * 128).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, 75)), img)


def test_grayscale_input_replicates_channels():
    gray = (np.arange(64).reshape(8, 8) * 4).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(gray, quality=95))
    assert out.shape == (8, 8, 3)
    assert np.abs(out[:, :, 0].astype(float)
                  - out[:, :, 1].astype(float)).max() <= 2


def test_quality_monotonic_in_size_and_error():
    img = _gradient(48, 48)
    sizes, errs = [], []
    for q in (95, 75, 40):
        enc = encode_jpeg(img, q)
        sizes.append(len(enc))
        errs.append(np.abs(decode_jpeg(enc).astype(float)
                           - img.astype(float)).mean())
    assert sizes[0] > sizes[1] > sizes[2]
    assert errs[0] < errs[1] < errs[2]


def test_stream_structure_markers():
    enc = encode_jpeg(_gradient(16, 16), 90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in enc, marker


def test_decode_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    enc = bytearray(encode_jpeg(_gradient(8, 8), 90))
    idx = bytes(enc).index(b"\xff\xc0")
    enc[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(enc))


def test_decode_image_routes_jpeg():
    from lacspark.spark.multimodal import decode_image

    img = _gradient(24, 24)
    out = decode_image(encode_jpeg(img, 90))
    assert out.shape == img.shape
    assert np.abs(out.astype(float) - img.astype(float)).mean() < 4.0


def test_synth_corpus_contains_jpeg_and_decodes():
    from lacspark.spark.multimodal import (media_decode_row,
                                           synth_media_payload)

    fmts = set()
    for i in range(120):
        kind, payload, fmt = synth_media_payload(i)
        fmts.add(fmt)
        if fmt == "image/jpeg":
            w, h, f0, f1, f2, f3 = media_decode_row(kind, payload)
            assert w > 0 and h > 0
    assert "image/jpeg" in fmts and "image/bmp" in fmts


def test_420_subsampling_roundtrip_and_structure():
    """4:2:0 — the common real-world layout: 2x2 luma blocks per MCU
    with box-filtered chroma — exercises the decoder's general
    sampling-factor path (upsampling, MCU geometry) end to end."""
    img = _gradient(37, 53)
    enc444 = encode_jpeg(img, 90, subsampling="444")
    enc420 = encode_jpeg(img, 90, subsampling="420")
    assert len(enc420) < len(enc444)  # half the chroma blocks
    # SOF0 luma sampling byte: 0x22 for 4:2:0 (component id 1)
    idx = enc420.index(b"\xff\xc0")
    assert enc420[idx + 11] == 0x22
    dec = decode_jpeg(enc420)
    assert dec.shape == img.shape
    err = np.abs(dec.astype(float) - img.astype(float)).mean()
    assert err < 8.0, err  # lossier than 4:4:4, still faithful


def test_420_odd_sizes_decode_to_exact_shape():
    rng = np.random.default_rng(5)
    for shape in ((8, 8), (9, 10), (16, 16), (17, 31), (33, 15)):
        im = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        d = decode_jpeg(encode_jpeg(im, 90, subsampling="420"))
        assert d.shape == im.shape


def test_unknown_subsampling_rejected():
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(_gradient(8, 8), 90, subsampling="422x")


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2: markers may be padded with any number of 0xFF
    fill bytes.  Inject runs of 0xFF before every marker of a valid
    stream; decode must be identical (ADVICE r5)."""
    img = _gradient(16, 16)
    payload = encode_jpeg(img, quality=90)
    # rebuild the stream with two fill bytes before each marker after
    # SOI, skipping entropy-coded 0xFF00 stuffing (only pad where a
    # real marker follows: next byte is a non-zero, non-RST marker)
    out = bytearray(payload[:2])
    i = 2
    while i < len(payload):
        b = payload[i]
        if (b == 0xFF and i + 1 < len(payload)
                and payload[i + 1] not in (0x00,)
                and not (0xD0 <= payload[i + 1] <= 0xD7)):
            out += b"\xff\xff"
        out.append(b)
        i += 1
    padded = bytes(out)
    assert len(padded) > len(payload)
    np.testing.assert_array_equal(decode_jpeg(padded),
                                  decode_jpeg(payload))
