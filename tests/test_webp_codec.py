"""Lossless WebP (VP8L) codec (operators/webp_codec.py): byte-exact
decode(encode(x)) roundtrips across every supported feature combination,
malformed/bomb rejection, and the decode_image_real wiring. No Spark
session needed — pure numpy."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dig_entity_resolution_spark.operators.webp_codec import (
    _BitReader,
    _BitWriter,
    _prefix_decode,
    _prefix_encode,
    decode_webp,
    encode_webp_lossless,
)


def _rng_img(h, w, seed=7, palette=None):
    rng = np.random.RandomState(seed)
    if palette is None:
        return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    pal = np.array(palette, dtype=np.uint8)
    return pal[rng.randint(0, len(pal), size=(h, w))]


def test_roundtrip_literals():
    for img in (
        np.full((5, 7, 3), 123, dtype=np.uint8),
        np.tile(np.arange(16, dtype=np.uint8)[None, :, None] * 16, (9, 1, 3)),
        _rng_img(12, 11),
    ):
        out = decode_webp(encode_webp_lossless(img))
        assert out.dtype == np.uint8 and out.shape == img.shape
        assert np.array_equal(out, img)


def test_roundtrip_color_cache_and_backrefs():
    # few distinct colors + long runs: exercises cache hits, LZ77 run
    # tokens, and their cache interaction
    img = _rng_img(16, 16, seed=3, palette=[(255, 0, 0), (0, 128, 255), (9, 9, 9)])
    img[4:9, :] = (9, 9, 9)  # a long run
    for kw in (
        dict(cache_bits=4),
        dict(backrefs=True),
        dict(cache_bits=6, backrefs=True),
    ):
        out = decode_webp(encode_webp_lossless(img, **kw))
        assert np.array_equal(out, img), kw
    # cache/backref streams are SMALLER than pure literals on this input
    assert len(encode_webp_lossless(img, cache_bits=6, backrefs=True)) < len(
        encode_webp_lossless(img)
    )


def test_roundtrip_subtract_green():
    img = _rng_img(10, 13, seed=11)
    out = decode_webp(encode_webp_lossless(img, subtract_green=True))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_every_predictor_mode(mode):
    img = _rng_img(9, 8, seed=mode + 1)
    out = decode_webp(encode_webp_lossless(img, predictor=mode))
    assert np.array_equal(out, img), f"predictor {mode}"


def test_roundtrip_single_pixel_and_single_row():
    for shape in ((1, 1, 3), (1, 9, 3), (9, 1, 3)):
        img = _rng_img(*shape[:2])
        assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)


def test_prefix_code_roundtrip():
    for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 120, 121, 1000, 123456]:
        code, extra, nbits = _prefix_encode(v)
        w = _BitWriter()
        w.bits(extra, nbits)
        r = _BitReader(w.done() + b"\x00")
        assert _prefix_decode(code, r) == v


def test_rejects_malformed():
    good = encode_webp_lossless(_rng_img(6, 6))
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"JUNK" + good[4:])
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(good[:12] + b"VP8 " + good[16:])
    with pytest.raises(ValueError):
        decode_webp(good[:20] + b"\x00" + good[21:])  # bad signature byte
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(good[:-6])
    # nonzero version bits
    bad = bytearray(good)
    bad[20 + 4] |= 0xE0  # version field lives in bits 29..31 after sig
    with pytest.raises(ValueError):
        decode_webp(bytes(bad))


def test_bomb_dimensions_rejected_before_allocation():
    # hand-build a header claiming 16384x16384 (4 GiB decoded) — must be
    # rejected by the byte cap before any pixel allocation
    w = _BitWriter()
    w.bits((1 << 14) - 1, 14)
    w.bits((1 << 14) - 1, 14)
    w.bit(0)
    w.bits(0, 3)
    payload = b"\x2f" + w.done() + b"\x00" * 8
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(ValueError, match="decode cap"):
        decode_webp(blob)


def test_decode_image_real_webp_wiring():
    from dig_entity_resolution_spark.operators.multimodal import (
        _decodable_image,
        decode_image_real,
    )

    img = _rng_img(8, 8, seed=5)
    blob = encode_webp_lossless(img, subtract_green=True, cache_bits=4)
    assert _decodable_image(blob)
    assert np.array_equal(decode_image_real(blob), img)
    lossy = blob[:12] + b"VP8 " + blob[16:]
    assert not _decodable_image(lossy)
    with pytest.raises(NotImplementedError):
        decode_image_real(lossy)


# -- review-r6 regressions ----------------------------------------------------


def test_entropy_image_varying_alpha_roundtrip():
    """Literal channel order is green, red, blue, alpha — the draft read
    alpha first, masked by the public encoder's opaque zero-bit alpha
    code (review r6). Drive the entropy layer directly with varying
    alpha."""
    from dig_entity_resolution_spark.operators.webp_codec import (
        _decode_entropy_image,
        _encode_entropy_image,
    )

    rng = np.random.RandomState(2)
    argb = rng.randint(0, 256, size=(7, 9, 4)).astype(np.uint8)
    w = _BitWriter()
    _encode_entropy_image(w, argb, level0=True)
    out = _decode_entropy_image(
        _BitReader(w.done() + b"\x00"), 9, 7, level0=True
    )
    assert np.array_equal(out, argb)


def test_long_run_splits_at_prefix_limit():
    """Runs longer than 4096 (the largest length the 24 prefix codes
    carry) must split; the draft emitted an out-of-alphabet green symbol
    (review r6)."""
    img = np.full((60, 80, 3), 50, dtype=np.uint8)  # 4800-pixel run
    img[0, 0] = (1, 2, 3)
    blob = encode_webp_lossless(img, backrefs=True)
    assert np.array_equal(decode_webp(blob), img)


def test_truncated_riff_header_raises_valueerror():
    """A 16-19 byte payload passes the magic probe; the size unpack must
    raise ValueError (not struct.error) so the feature-extraction
    fallback catches it (review r6)."""
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(b"RIFF\x00\x00\x00\x00WEBPVP8L")


def test_pixel_count_cap():
    """The per-pixel python loops need a CPU bound tighter than the byte
    cap: 3000x3000 passes 256 MB but must be rejected (review r6)."""
    w = _BitWriter()
    w.bits(3000 - 1, 14)
    w.bits(3000 - 1, 14)
    w.bit(0)
    w.bits(0, 3)
    payload = b"\x2f" + w.done() + b"\x00" * 8
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", len(payload) + 12) + b"WEBP" + chunk
    with pytest.raises(ValueError, match="decode cap"):
        decode_webp(blob)


@pytest.mark.parametrize("n_colors,width_bits", [(2, 3), (4, 2), (13, 1), (40, 0)])
def test_roundtrip_palette_all_bundle_widths(n_colors, width_bits):
    """COLOR_INDEXING with every pixel-bundling density (8/4/2/1 indices
    per byte), including a width that is not a multiple of the bundle."""
    rng = np.random.RandomState(n_colors)
    pal = rng.randint(0, 256, size=(n_colors, 3)).astype(np.uint8)
    img = pal[rng.randint(0, n_colors, size=(11, 13))]
    from dig_entity_resolution_spark.operators.webp_codec import (
        _palette_width_bits,
    )

    assert _palette_width_bits(n_colors) == width_bits
    blob = encode_webp_lossless(img, palette=True)
    assert np.array_equal(decode_webp(blob), img)
    if n_colors > 2:
        # palette streams beat literal streams on paletted content
        # (at 2 colors the literal stream is 1-bit simple codes per
        # channel and already near-minimal)
        assert len(blob) < len(encode_webp_lossless(img))


def test_palette_guards():
    img = _rng_img(20, 20, seed=9)  # ~400 distinct colors
    with pytest.raises(ValueError, match="256 distinct"):
        encode_webp_lossless(img, palette=True)
    with pytest.raises(ValueError, match="at most one transform"):
        encode_webp_lossless(img, palette=True, subtract_green=True)


@pytest.mark.parametrize(
    "elem",
    [(0x12, 0xAB, 0x7F), (0xFF, 0x80, 0x01), (0x00, 0x00, 0x00), (0xE5, 0x33, 0x9C)],
)
def test_roundtrip_color_transform(elem):
    """COLOR_TRANSFORM with positive, negative (>=0x80 as int8), and zero
    deltas — the signed 3.5-fixed cross-channel arithmetic must invert
    exactly, feeding the RECONSTRUCTED red into the red_to_blue delta."""
    img = _rng_img(10, 14, seed=sum(elem) + 1)
    blob = encode_webp_lossless(img, color_transform=elem)
    assert np.array_equal(decode_webp(blob), img)


def test_color_transform_exclusive():
    with pytest.raises(ValueError, match="at most one transform"):
        encode_webp_lossless(
            _rng_img(4, 4), color_transform=(1, 2, 3), predictor=1
        )


def test_decoder_rejects_palette_combined_with_other_transform():
    """Hand-build a SUBTRACT_GREEN + COLOR_INDEXING stream: bundling
    changes the coordinate system every other transform would apply in,
    so the decoder must reject the combination loudly (review r6: this
    branch previously had no coverage)."""
    from dig_entity_resolution_spark.operators.webp_codec import (
        _encode_entropy_image,
    )

    w = _BitWriter()
    w.bits(3, 14)  # width 4
    w.bits(0, 14)  # height 1
    w.bit(0)
    w.bits(0, 3)
    w.bit(1)
    w.bits(2, 2)  # SUBTRACT_GREEN
    w.bit(1)
    w.bits(3, 2)  # COLOR_INDEXING
    w.bits(1, 8)  # 2 colors
    pal = np.zeros((1, 2, 4), dtype=np.uint8)
    pal[0, :, 2] = (10, 20)
    _encode_entropy_image(w, pal)
    w.bit(0)  # end of transforms
    packed = np.zeros((1, 1, 4), dtype=np.uint8)
    _encode_entropy_image(w, packed, level0=True)
    payload = b"\x2f" + w.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    blob = b"RIFF" + struct.pack("<I", len(chunk) + 4) + b"WEBP" + chunk
    with pytest.raises(ValueError, match="combined with other transforms"):
        decode_webp(blob)


@pytest.mark.parametrize("n_groups", [2, 3, 5])
def test_roundtrip_meta_huffman_groups(n_groups):
    """Multiple huffman groups selected per 4px block by the meta entropy
    image — each group carries genuinely different code tables (the
    pinned encoder builds per-group histograms)."""
    rng = np.random.RandomState(n_groups)
    img = rng.randint(0, 256, size=(13, 21, 3)).astype(np.uint8)
    # make the groups statistically different so tables differ
    img[:, ::3] //= 4
    blob = encode_webp_lossless(img, meta_groups=n_groups)
    assert np.array_equal(decode_webp(blob), img)


def test_meta_huffman_guards():
    img = _rng_img(8, 8)
    with pytest.raises(ValueError, match="standalone"):
        encode_webp_lossless(img, meta_groups=2, cache_bits=4)


def test_descending_two_symbol_simple_code_rejected():
    """ADVICE r6 #4: canonical assignment (smaller symbol → code 0) and
    libwebp's read-order assignment agree only for ascending symbol pairs;
    a descending pair would decode with silently swapped symbols, so it is
    rejected loudly as outside the verified subset."""
    from dig_entity_resolution_spark.operators.webp_codec import (
        _BitReader,
        _read_huffman_code,
    )

    def simple_pair(s0, s1):
        w = _BitWriter()
        w.bit(1)  # simple code
        w.bit(1)  # two symbols
        w.bit(1)  # first symbol is 8-bit
        w.bits(s0, 8)
        w.bits(s1, 8)
        return _BitReader(w.done())

    with pytest.raises(ValueError, match="descending"):
        _read_huffman_code(simple_pair(5, 3), 256)
    dec = _read_huffman_code(simple_pair(3, 5), 256)
    # ascending pair: canonical == read order — code 0 is the first symbol
    r = _BitReader(b"\x02")  # bits LSB-first: 0 then 1
    assert dec.read(r) == 3 and dec.read(r) == 5
