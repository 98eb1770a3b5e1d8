"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT,
8-bit): Huffman + DCT in numpy, standard library only.

Closes the last realistic-format gap in the media path: PNG/WAV/PSMF
(functions/codecs.py) covered lossless image, audio, and video, but the
single most common real image format was missing. The reference's
payload contract is opaque bytes the consumer decodes
(/root/reference/server/messages.go:65); a consumer switching from the
reference to this engine brings JPEGs.

Scope (and honest limits):
- Encoder: greyscale (1 component) and RGB via JFIF YCbCr, 4:4:4 or
  4:2:0 subsampling, Annex K quantization tables scaled by the libjpeg
  quality formula, Annex K standard Huffman tables, byte stuffing.
  Edge padding replicates border pixels (the conventional choice that
  minimizes ringing on partial MCUs).
- Decoder: any BASELINE JPEG within 8-bit precision, 1 or 3
  components — it parses DQT/SOF0/DHT/DRI/SOS, entropy-decodes
  MCU-interleaved scans with restart-marker support, dequantizes,
  IDCTs, upsamples chroma by pixel replication, converts YCbCr->RGB,
  and crops the MCU padding. PROGRESSIVE (SOF2) streams dispatch to
  functions/jpeg_progressive.py (spectral selection + successive
  approximation + EOB runs — most real web JPEGs) and ARITHMETIC
  (SOF10) streams to functions/jpeg_arith.py (the QM coder); only
  >8-bit precision stays out of scope. It decodes real-world
  files, not just this encoder's output (tests include hand-assembled
  scans built from the spec, bit by bit, independent of the encoder).

Exactness contract used by the m_jpeg_real oracle: JPEG is lossy, but
a block-constant image (each 8x8 block — 16x16 macroblock under 4:2:0
— holds one value v with v even) round-trips BIT-EXACTLY at quality
50: a constant block has only a DC coefficient 8*(v-128), divisible by
the Annex K luma DC quantizer 16 when v is even, so quantization loses
nothing; grey-valued RGB (R=G=B=v) maps to (Y=v, Cb=Cr=128) exactly
and back. That gives DuckDB a closed-form prediction of the DECODED
pixels while the bytes on the wire are a genuine entropy-coded JPEG.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K quantization tables (natural row-major order) ---
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Zigzag scan: ZIGZAG[k] = natural index of the k-th zigzagged coeff.
def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        idx = [(s - j, j) for j in range(s + 1) if 0 <= s - j < 8 and j < 8]
        order.extend(idx if s % 2 else idx[::-1])
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# --- Annex K standard Huffman tables: (BITS[1..16], HUFFVAL) ---
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    if sum(bits) > len(values):
        raise ValueError("invalid DHT: more codes than symbols")
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffTable(dict):
    """(length, code) -> symbol dict plus an 8-bit prefix LUT: lut[b]
    is (symbol, length) when the code for some symbol is a prefix of
    the byte b, None when the code is longer than 8 bits (fall back to
    the bit-serial walk). The standard libjpeg-style fast path."""

    __slots__ = ("lut",)


def _decode_table(bits: list[int], values: list[int]) -> "_HuffTable":
    """(length, code) -> symbol, plus the 8-bit prefix LUT. Memoized:
    a corpus decode pass parses the same DHTs (often the Annex K
    standard tables) once per FILE, and the LUT build was 20-40% of
    per-blob decode CPU (r8 profile); tables are read-only after
    construction, so sharing one instance across blobs is safe."""
    return _decode_table_cached(tuple(bits), tuple(values))


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=64)
def _decode_table_cached(
    bits: tuple[int, ...], values: tuple[int, ...]
) -> "_HuffTable":
    enc = _canonical_codes(bits, values)
    # A Kraft-violating DHT (e.g. bits=[3,0,...]) assigns a code that
    # doesn't fit its own length; such a table can never decode a valid
    # stream, so reject it here rather than corrupting the LUT below.
    for sym, (code, length) in enc.items():
        if code >= (1 << length):
            raise ValueError("invalid DHT: over-full Huffman code table")
    tab = _HuffTable(
        ((length, code), sym) for sym, (code, length) in enc.items()
    )
    lut: list[tuple[int, int] | None] = [None] * 256
    for sym, (code, length) in enc.items():
        if length <= 8:
            base = code << (8 - length)
            for i in range(1 << (8 - length)):
                lut[base + i] = (sym, length)
    tab.lut = lut
    return tab


# Orthonormal 8-point DCT-II matrix: forward F = M @ b @ M.T
_M = np.array([
    [
        (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 keeps Annex K tables verbatim."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.round(np.stack([y, cb, cr], axis=2)), 0, 255)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _pad_replicate(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (bh - h % bh) % bh
    pw = (bw - w % bw) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # drop the emitted high bits: an unmasked acc grows 8 bits per
        # byte FOREVER and every later shift goes quadratic (the same
        # bigint trap as _BitReader._fill)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended bits (ones-complement negs)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    writer: _BitWriter,
    coeffs: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = coeffs.flatten()[ZIGZAG]
    diff = int(zz[0]) - pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    end = (last_nz[-1] + 2) if last_nz.size else 1
    for k in range(1, end):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if end < 64:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a padded plane -> quantized coeffs
    (nby, nbx, 8, 8), vectorized: one einsum over every block."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        .astype(np.float64) - 128.0
    )
    f = np.einsum("ux,bcxy,vy->bcuv", _M, blocks, _M)
    return np.round(f / qt).astype(np.int32)


def jpeg_encode(
    arr: np.ndarray, quality: int = 50, subsampling: str = "4:2:0"
) -> bytes:
    """Encode uint8 (h, w) greyscale or (h, w, 3) RGB as a baseline
    JFIF JPEG. `subsampling` applies to RGB only: '4:4:4' or '4:2:0'."""
    if arr.dtype != np.uint8:
        raise ValueError("jpeg_encode wants uint8")
    grey = arr.ndim == 2
    if not grey and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("jpeg_encode wants (h,w) or (h,w,3)")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    h, w = arr.shape[0], arr.shape[1]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad dimensions")
    qt_l = _quality_scale(QUANT_LUMA, quality)
    qt_c = _quality_scale(QUANT_CHROMA, quality)

    sub = not grey and subsampling == "4:2:0"
    if grey:
        planes = [arr.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        cb, cr = ycc[:, :, 1], ycc[:, :, 2]
        if sub:
            pcb = _pad_replicate(cb, 2, 2)
            pcr = _pad_replicate(cr, 2, 2)
            cb = pcb.reshape(pcb.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            cr = pcr.reshape(pcr.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            cb, cr = np.round(cb), np.round(cr)
        planes = [ycc[:, :, 0], cb, cr]

    mcu = 16 if sub else 8
    coeffs = []
    for i, p in enumerate(planes):
        pad = _pad_replicate(p, mcu if i == 0 else 8, mcu if i == 0 else 8)
        coeffs.append(_fdct_quant(pad, qt_l if i == 0 else qt_c))

    # --- headers ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, qt in ((0, qt_l),) if grey else ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(v) for v in qt.flatten()[ZIGZAG])
    ncomp = 1 if grey else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    samp_y = 0x22 if sub else 0x11
    comps = [(1, samp_y, 0)] if grey else [
        (1, samp_y, 0), (2, 0x11, 1), (3, 0x11, 1)
    ]
    for cid, samp, tq in comps:
        out += struct.pack("BBB", cid, samp, tq)
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not grey:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid, _samp, tq in comps:
        out += struct.pack("BB", cid, 0x00 if tq == 0 else 0x11)
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0

    # --- entropy-coded scan, MCU-interleaved ---
    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    writer = _BitWriter()
    preds = [0] * ncomp
    mby = coeffs[0].shape[0] // (2 if sub else 1)
    mbx = coeffs[0].shape[1] // (2 if sub else 1)
    for my in range(mby):
        for mx in range(mbx):
            if sub:
                for dy in range(2):
                    for dx in range(2):
                        preds[0] = _encode_block(
                            writer, coeffs[0][2 * my + dy, 2 * mx + dx],
                            preds[0], dc_l, ac_l,
                        )
            else:
                preds[0] = _encode_block(
                    writer, coeffs[0][my, mx], preds[0], dc_l, ac_l
                )
            for c in range(1, ncomp):
                preds[c] = _encode_block(
                    writer, coeffs[c][my, mx], preds[c], dc_c, ac_c
                )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Bit-serial reader over entropy-coded data with FF00 unstuffing;
    stops at any non-stuffing marker (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        # mask to the live window: nbits never exceeds 32, and an
        # unmasked acc grows 8 bits per fill FOREVER — on a megapixel
        # scan the accumulator becomes a multi-kilobyte bigint and
        # every shift goes quadratic
        self.acc = (((self.acc << 8) | b) & 0xFFFFFFFFFF)
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        # bulk read from the accumulator: identical bit order to n
        # bit() calls, without the per-bit call overhead. A valid T.81
        # read never exceeds 16 bits (size symbols cap at 16, EOBn runs
        # at 14), so anything past 16 is a corrupt symbol (a raw DHT
        # value leaking through as a bit count) and must be a clean
        # decode error, not truncated garbage.
        if n > 16:
            raise ValueError(f"corrupt scan: {n}-bit read exceeds T.81 limits")
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_to_marker(self) -> int:
        """Discard pad bits, expect a marker next; return its code."""
        self.acc, self.nbits = 0, 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1  # tolerate stray pad bytes before the marker
        marker = 0xFF00 | self.data[self.pos + 1]
        self.pos += 2
        return marker


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    # fast path: resolve codes of <= 8 bits with one LUT probe. The
    # eager 8-bit fill may hit the trailing marker while a SHORT final
    # code is still decodable from the pad bits — _fill raises BEFORE
    # advancing pos, so swallowing the hit here loses nothing (a later
    # fill re-raises identically) and the bit-serial tail below handles
    # whatever bits remain.
    lut = getattr(table, "lut", None)
    code, length = 0, 0
    if lut is not None:
        if reader.nbits < 8:
            try:
                while reader.nbits < 8:
                    reader._fill()
            except _MarkerHit:
                pass
        if reader.nbits >= 8:
            probe = (reader.acc >> (reader.nbits - 8)) & 0xFF
            hit = lut[probe]
            if hit is not None:
                sym, ln = hit
                reader.nbits -= ln
                return sym
            # longer than 8 bits: consume the probe, walk the rest
            reader.nbits -= 8
            code, length = probe, 8
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _decode_block(
    reader: _BitReader,
    pred: int,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    zz: np.ndarray,
) -> int:
    """Entropy-decode one block's zigzag coefficients into zz (already
    zeroed); returns the new DC predictor. The IDCT happens once for
    the whole scan, vectorized — not per block."""
    size = _read_symbol(reader, dc_tab)
    dc = pred + _extend(reader.bits(size), size)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _read_symbol(reader, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.bits(size), size)
        k += 1
    return dc


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 (h, w) grey or (h, w, 3) RGB.
    Supports 8-bit sequential DCT, 1 or 3 components, any sampling
    factors up to 2x2, standard or custom Huffman tables, restart
    intervals. Progressive (SOF2) and arithmetic (SOF10) streams
    dispatch to their own modules; raises on 12-bit/lossless."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                bpos += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(
                    body[bpos : bpos + 64], dtype=np.uint8
                ).astype(np.int32)
                qts[tq] = tbl[UNZIGZAG].reshape(8, 8)
                bpos += 64
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            fh, fw = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker == 0xC2:  # SOF2: hand the stream to the progressive path
            from streams_spark.functions.jpeg_progressive import (
                jpeg_decode_progressive,
            )

            return jpeg_decode_progressive(data)
        elif marker == 0xCA:  # SOF10: hand the stream to the QM-coder path
            from streams_spark.functions.jpeg_arith import jpeg_decode_arith

            return jpeg_decode_arith(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline, progressive, or arithmetic JPEG supported"
            )
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                values = list(body[bpos + 17 : bpos + 17 + n])
                huff[(tc, th)] = _decode_table(bits, values)
                bpos += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tabs >> 4, tabs & 0x0F))
            return _decode_scan(
                data, pos + seg_len, frame, scan, qts, huff, restart_interval
            )
        pos += seg_len
    raise ValueError("no SOS marker")


def _decode_scan(data, pos, frame, scan, qts, huff, restart_interval):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mbx = (fw + mcu_w - 1) // mcu_w
    mby = (fh + mcu_h - 1) // mcu_h
    by_id = {c[0]: c for c in comps}
    order = []  # (comp index, coeff array, hi, vi, dc_tab, ac_tab, qt)
    for ci, (cs, td, ta) in enumerate(scan):
        cid, hi, vi, tq = by_id[cs]
        coeff = np.zeros((mby * vi, mbx * hi, 64), dtype=np.int32)
        order.append(
            (ci, coeff, hi, vi, huff[(0, td)], huff[(1, ta)], qts[tq])
        )
    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    n_mcu = 0
    for my in range(mby):
        for mx in range(mbx):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                marker = reader.align_to_marker()
                if not 0xFFD0 <= marker <= 0xFFD7:
                    raise ValueError("expected restart marker")
                preds = [0] * len(scan)
            try:
                for ci, coeff, hi, vi, dc_tab, ac_tab, _qt in order:
                    for dy in range(vi):
                        for dx in range(hi):
                            preds[ci] = _decode_block(
                                reader, preds[ci], dc_tab, ac_tab,
                                coeff[my * vi + dy, mx * hi + dx],
                            )
            except _MarkerHit as hit:
                raise ValueError(
                    f"marker {hit.marker:#x} interrupted scan"
                ) from None
            n_mcu += 1
    # dequantize + IDCT the whole scan at once: one einsum over every
    # block beats a per-block matmul inside the entropy loop (the same
    # vectorized reconstruction the progressive path uses)
    planes = []
    for _ci, coeff, hi, vi, _dc, _ac, qt in order:
        nat = coeff[:, :, UNZIGZAG].reshape(
            coeff.shape[0], coeff.shape[1], 8, 8
        ) * qt
        pix = np.einsum("ux,bcuv,vy->bcxy", _M, nat.astype(np.float64), _M)
        pix += 128.0
        plane = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        plane = plane.transpose(0, 2, 1, 3).reshape(
            coeff.shape[0] * 8, coeff.shape[1] * 8
        )
        planes.append((plane, hi, vi))
    if len(scan) == 1:
        return planes[0][0][:fh, :fw].copy()
    full = []
    for plane, hi, vi in planes:
        up = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(up[:fh, :fw])
    return _ycbcr_to_rgb(full[0], full[1], full[2])
