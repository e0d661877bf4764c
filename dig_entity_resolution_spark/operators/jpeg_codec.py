"""Baseline-JPEG (SOF0) codec in pure numpy (VERDICT r5 item 6).

Shrinks the last honest multimodal gate: jpeg decode previously raised
NotImplementedError for want of Pillow/libav. Baseline sequential JPEG
(ITU-T T.81): marker segments, Huffman-coded quantized 8x8 DCT blocks.
Everything here is from the public spec — no external codec library.

Scope (the variant the pinned encoder below writes, and what web
thumbnails overwhelmingly are):
  * SOF0 baseline, 8-bit, 3 components, 4:4:4 (no chroma subsampling),
    no restart intervals, no progressive/arithmetic coding.
  * Huffman + quantization tables are read from the stream's own
    DQT/DHT segments (the decoder is NOT hardwired to the encoder's
    tables — any valid baseline 4:4:4 stream decodes).
  * Unsupported variants raise ValueError (malformed-or-unsupported;
    feature-extraction rows fall back, same contract as decode_png).

The encoder is the repo's pinned serial fixture source: deterministic,
canonical-Huffman tables built from fixed code lengths (valid per spec —
tables travel in DHT, so they need not be the Annex K suggestions).

Bomb bounds mirror decode_png: declared dimensions are capped BEFORE any
allocation, and the entropy scan cannot allocate beyond the declared
MCU count.
"""

from __future__ import annotations

import struct

import numpy as np

#: hard cap on decoded pixel bytes (256 MB) — same untrusted-web posture
#: as multimodal._PNG_MAX_BYTES
_JPEG_MAX_BYTES = 1 << 28

_SOI = b"\xff\xd8"
_EOI = b"\xff\xd9"


# ---------------------------------------------------------------------------
# shared transform pieces
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The 64 (row, col) block positions in JPEG zigzag order."""
    out = []
    for d in range(15):
        cells = [(i, d - i) for i in range(8) if 0 <= d - i < 8]
        out.extend(cells if d % 2 else cells[::-1])
    return np.array([r * 8 + c for r, c in out], dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct8() -> np.ndarray:
    j = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    d = 0.5 * np.cos(np.pi * (2 * x + 1) * j / 16.0)
    d[0] /= np.sqrt(2.0)
    return d


_DCT8 = _dct8()

#: deliberately simple-but-valid quant tables (they travel in DQT, so the
#: decoder never assumes them); low-frequency-gentle like the Annex K
#: suggestions without reproducing those exact constants
_QUANT_LUMA = np.clip(
    (4 + (np.add.outer(np.arange(8), np.arange(8)) * 3)), 1, 255
).astype(np.uint8)
_QUANT_CHROMA = np.clip(
    (6 + (np.add.outer(np.arange(8), np.arange(8)) * 5)), 1, 255
).astype(np.uint8)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (size category, raw bits)."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _extend(bits: int, size: int) -> int:
    """Inverse of _mag_bits."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# canonical Huffman tables (encoder side — fixed code lengths, valid Kraft)
# ---------------------------------------------------------------------------


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """BITS/HUFFVAL (T.81 Annex C) → {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


#: DC: 12 size categories, all 4-bit codes (12 < 16 slots — last code is
#: not all-ones, as the spec requires).
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = list(range(12))
#: AC: the 162 baseline symbols (EOB, ZRL, (run,size) run 0-15 × size
#: 1-10), all 9-bit codes (162 < 512 slots).
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0]

_DC_CODES = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def done(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s (T.81 F.1.2.3)
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


# ---------------------------------------------------------------------------
# encoder (pinned serial fixture source)
# ---------------------------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dht_body(tc: int, th: int, counts: list[int], symbols: list[int]) -> bytes:
    return bytes([(tc << 4) | th] + counts + symbols)


def _encode_block(
    block: np.ndarray,
    quant: np.ndarray,
    prev_dc: int,
    w: _BitWriter,
) -> int:
    """Forward-transform one 8x8 sample block and Huffman-write it.
    Returns the block's DC coefficient (for the next block's differential).
    """
    coeffs = _DCT8 @ (block.astype(np.float64) - 128.0) @ _DCT8.T
    q = np.round(coeffs / quant.astype(np.float64)).astype(np.int64)
    zz = q.reshape(-1)[_ZIGZAG]
    dc = int(zz[0])
    size, bits = _mag_bits(dc - prev_dc)
    code, length = _DC_CODES[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
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
            c, ln = _AC_CODES[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        size, bits = _mag_bits(v)
        if size > 10:
            raise ValueError("coefficient out of baseline range")
        c, ln = _AC_CODES[(run << 4) | size]
        w.write(c, ln)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        c, ln = _AC_CODES[0x00]  # EOB
        w.write(c, ln)
    return dc


def encode_jpeg(img: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as baseline 4:4:4 JFIF. Deterministic
    (pure numpy, fixed tables) — the pinned fixture encoder."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ycc = _rgb_to_ycbcr(img)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw, 3), dtype=np.float64)
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1 : h, :]  # edge-replicate pad
    padded[:, w:] = padded[:, w - 1 : w]

    out = bytearray(_SOI)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(
        0xDB, bytes([0]) + bytes(_QUANT_LUMA.reshape(-1)[_ZIGZAG])
    )
    out += _seg(
        0xDB, bytes([1]) + bytes(_QUANT_CHROMA.reshape(-1)[_ZIGZAG])
    )
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 4:4:4 — h=v=1 for every component
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, _DC_COUNTS, _DC_SYMBOLS))
    out += _seg(0xC4, _dht_body(1, 0, _AC_COUNTS, _AC_SYMBOLS))
    out += _seg(0xC4, _dht_body(0, 1, _DC_COUNTS, _DC_SYMBOLS))
    out += _seg(0xC4, _dht_body(1, 1, _AC_COUNTS, _AC_SYMBOLS))
    sos = bytes([3]) + bytes(
        [1, 0x00, 2, 0x11, 3, 0x11]
    ) + bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    wtr = _BitWriter()
    prev = [0, 0, 0]
    quants = (_QUANT_LUMA, _QUANT_CHROMA, _QUANT_CHROMA)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for c in range(3):
                block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c]
                prev[c] = _encode_block(block, quants[c], prev[c], wtr)
    out += wtr.done()
    out += _EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4 (or grayscale) SOF0 JPEG to (H, W, 3) uint8
    RGB. Tables come from the stream; unsupported variants (progressive,
    subsampled, restart intervals, 12-bit) raise ValueError."""
    if payload[:2] != _SOI:
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    scan_comps = None
    scan_data = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte (T.81 B.1.1.2) — skip
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        (size,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + size]
        if len(body) != size - 2:
            raise ValueError("truncated JPEG segment")
        pos += 2 + size
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(body, np.uint8, 64, bp + 1).astype(
                    np.float64
                )
                quant[tq] = tbl[_UNZIGZAG].reshape(8, 8)
                bp += 65
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0xF
                if bp + 17 > len(body):
                    raise ValueError("truncated DHT counts")
                counts = list(body[bp + 1 : bp + 17])
                nsym = sum(counts)
                syms = list(body[bp + 17 : bp + 17 + nsym])
                # a DHT declaring more symbols than its segment carries is
                # malformed, not short — fail as ValueError so the feature
                # fallback catches it (ADVICE r6 #2), never IndexError from
                # _canonical_codes indexing past the symbol list
                if len(syms) != nsym:
                    raise ValueError("DHT symbol table overruns segment")
                codes = _canonical_codes(counts, syms)
                huff[(tc, th)] = {
                    (code, ln): sym for sym, (code, ln) in codes.items()
                }
                bp += 17 + nsym
        elif marker == 0xC0:  # SOF0
            if len(body) < 6:
                raise ValueError("truncated SOF0 header")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF0 component list")
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG (progressive/extended)")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows until EOI
            if not body or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated SOS header")
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            end = payload.rfind(_EOI)
            if end < pos:
                raise ValueError("JPEG missing EOI")
            scan_data = payload[pos:end]
            break
    if sof is None or scan_comps is None or scan_data is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = sof
    if h == 0 or w == 0:
        raise ValueError("invalid JPEG dimensions (zero)")
    # cap counts the DECODE-TIME footprint (float64 planes, 8 B/sample),
    # not the nominal uint8 pixel bytes — otherwise a maximal declaration
    # allocates 8x the cap before the output cast
    if h * w * 3 * 8 > _JPEG_MAX_BYTES:
        raise ValueError(
            f"JPEG declares {w}x{h}x3 samples, over the "
            f"{_JPEG_MAX_BYTES}-byte decode cap"
        )
    if len(comps) not in (1, 3) or len(scan_comps) != len(comps):
        raise ValueError("unsupported component layout")

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = np.zeros((len(comps), ph, pw), dtype=np.float64)
    rdr = _BitReader(scan_data)
    prev = [0] * len(comps)
    comp_tables = []
    for (cid, tq), (scid, td, ta) in zip(comps, scan_comps):
        if cid != scid:
            raise ValueError("SOS component order differs from SOF")
        if tq not in quant or (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("JPEG references an undefined table")
        comp_tables.append((quant[tq], huff[(0, td)], huff[(1, ta)]))
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for c, (qt, dct, act) in enumerate(comp_tables):
                zz = np.zeros(64, dtype=np.float64)
                size = rdr.huff(dct)
                prev[c] += _extend(rdr.bits(size), size) if size else 0
                zz[0] = prev[c]
                k = 1
                while k < 64:
                    sym = rdr.huff(act)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, sz = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("JPEG AC index out of range")
                    zz[k] = _extend(rdr.bits(sz), sz)
                    k += 1
                coeffs = (zz[_UNZIGZAG].reshape(8, 8)) * qt
                block = _DCT8.T @ coeffs @ _DCT8 + 128.0
                planes[c, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    planes = planes[:, :h, :w]
    if len(comps) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
