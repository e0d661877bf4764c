"""Baseline-JPEG codec (VERDICT r5 item 6): byte-exact decode vs the
transform-layer reference (proving the Huffman/marker layer lossless),
pinned-encoder determinism, bomb bounds, and variant rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dig_entity_resolution_spark.operators.jpeg_codec import (
    _DCT8,
    _QUANT_CHROMA,
    _QUANT_LUMA,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    decode_jpeg,
    encode_jpeg,
)
from dig_entity_resolution_spark.operators.multimodal import decode_image_real


def _gradient(h=40, w=56):
    gx = np.linspace(20, 230, w)
    gy = np.linspace(30, 220, h)
    img = np.zeros((h, w, 3))
    img[..., 0] = gx[None, :]
    img[..., 1] = gy[:, None]
    img[..., 2] = (gx[None, :] + gy[:, None]) / 2
    return img.astype(np.uint8)


def _reference_roundtrip(img: np.ndarray) -> np.ndarray:
    """The exact expected pixels: forward DCT + quantize + inverse, NO
    entropy coding — decode(encode(x)) must equal this bit-for-bit, which
    pins the whole Huffman/marker/stuffing layer as lossless."""
    ycc = _rgb_to_ycbcr(img)
    h, w = img.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    out = np.zeros((ph, pw, 3))
    qts = (_QUANT_LUMA, _QUANT_CHROMA, _QUANT_CHROMA)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for c in range(3):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c] - 128.0
                q = np.round((_DCT8 @ blk @ _DCT8.T) / qts[c])
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c] = (
                    _DCT8.T @ (q * qts[c]) @ _DCT8 + 128.0
                )
    return _ycbcr_to_rgb(out[:h, :w])


def test_constant_image_roundtrips_exactly():
    img = np.full((16, 24, 3), 130, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


def test_decode_is_byte_exact_vs_transform_reference():
    rng = np.random.default_rng(3)
    for img in (
        np.full((8, 8, 3), 99, dtype=np.uint8),
        _gradient(),
        rng.integers(0, 256, size=(33, 41, 3)).astype(np.uint8),  # pad path
    ):
        got = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(got, _reference_roundtrip(img))


def test_encoder_is_deterministic_and_lossy_error_bounded():
    img = _gradient()
    b = encode_jpeg(img)
    assert b == encode_jpeg(img.copy())
    err = np.abs(decode_jpeg(b).astype(int) - img.astype(int))
    assert err.max() <= 8  # smooth content stays close under these tables


def test_decode_via_decode_image_real():
    img = _gradient(24, 24)
    assert np.array_equal(
        decode_image_real(encode_jpeg(img)), decode_jpeg(encode_jpeg(img))
    )


def test_dimension_bomb_rejected_before_allocation():
    b = bytearray(encode_jpeg(np.full((8, 8, 3), 50, dtype=np.uint8)))
    i = bytes(b).find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) — declare 60000x60000
    struct.pack_into(">HH", b, i + 5, 60000, 60000)
    with pytest.raises(ValueError, match="cap"):
        decode_jpeg(bytes(b))
    struct.pack_into(">HH", b, i + 5, 0, 8)
    with pytest.raises(ValueError, match="zero"):
        decode_jpeg(bytes(b))


def test_fill_bytes_between_markers_accepted():
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    good = encode_jpeg(img)
    # inject legal 0xFF fill bytes before the SOF0 marker (T.81 B.1.1.2)
    i = good.find(b"\xff\xc0")
    padded = good[:i] + b"\xff\xff" + good[i:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(good))


def test_unsupported_variants_rejected():
    good = encode_jpeg(np.full((8, 8, 3), 50, dtype=np.uint8))
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive|non-baseline"):
        decode_jpeg(prog)
    b = bytearray(good)
    i = bytes(b).find(b"\xff\xc0")
    b[i + 11] = 0x22  # luma sampling 2x2 → subsampled
    with pytest.raises(ValueError, match="subsampling"):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError, match="truncated|missing EOI"):
        decode_jpeg(good[: len(good) // 2])
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01\x02")


def test_crafted_segment_truncations_raise_valueerror():
    """ADVICE r6 #2: a crafted/truncated web JPEG must fail as ValueError
    (the skip-and-fallback contract of _features_for / image_phash_table),
    never IndexError from DHT symbol indexing or struct.error from a short
    SOF0/SOS body."""
    from dig_entity_resolution_spark.operators.jpeg_codec import _SOI, _seg

    good = encode_jpeg(np.full((8, 8, 3), 50, dtype=np.uint8))
    # DHT whose declared counts exceed the symbols the segment carries
    b = bytearray(good)
    i = bytes(b).find(b"\xff\xc4")
    b[i + 20] += 200  # bump one counts byte far past the segment body
    with pytest.raises(ValueError, match="DHT symbol table overruns"):
        decode_jpeg(bytes(b))
    # DHT segment too short to even hold the 16 count bytes
    with pytest.raises(ValueError, match="truncated DHT"):
        decode_jpeg(_SOI + _seg(0xC4, b"\x00" + b"\x01" * 8))
    # SOF0 body shorter than its fixed header
    with pytest.raises(ValueError, match="truncated SOF0"):
        decode_jpeg(_SOI + _seg(0xC0, b"\x08\x00\x10"))
    # SOF0 declaring 3 components but carrying bytes for one
    with pytest.raises(ValueError, match="truncated SOF0 component"):
        decode_jpeg(_SOI + _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 3) + b"\x01\x11\x00"))
    # SOS header shorter than its declared component list
    with pytest.raises(ValueError, match="truncated SOS"):
        decode_jpeg(_SOI + _seg(0xDA, b"\x03\x01\x00"))
