"""Uncompressed/near-uncompressed raster formats — stdlib + numpy only.

Four real interchange formats that round out the image side of the
opaque-payload decode contract (reference parity anchor: consumer-side
decode of opaque payloads, /root/reference/server/messages.go:65):

- **netpbm** (binary PPM ``P6`` / PGM ``P5``): the simplest possible
  truecolor/greyscale container and this repo's cross-format ground
  truth — CPython ships ``python.ppm`` whose raw RGB bytes the BMP,
  TIFF, and GIF decoders are all verified against in
  tests/test_interop.py.
- **BMP** (Windows DIB, BITMAPINFOHEADER through BITMAPV5HEADER):
  bottom-up or top-down rows, 4-byte row padding, 24-bit BGR, 32-bit
  BI_RGB/BI_BITFIELDS with arbitrary contiguous channel masks, and
  8-bit palette images. RLE and 1/4/16-bit depths raise loudly.
- **TIFF** (baseline, TIFF 6.0): both byte orders, single-IFD,
  Compression=1 (none) and 32773 (PackBits), PhotometricInterpretation
  1 (greyscale) and 2 (RGB, with ExtraSamples alpha), multi-strip via
  StripOffsets/StripByteCounts/RowsPerStrip. Everything else —
  LZW/JPEG compression, tiles, planar config 2, non-8-bit samples —
  raises loudly rather than guessing.
- **XBM** (X BitMap): the C-source 1-bit format, LSB-first within each
  byte, rows padded to whole bytes.

All decoders return uint8 numpy arrays — ``(h, w)`` grey, ``(h, w, 3)``
RGB, or ``(h, w, 4)`` RGBA — so downstream checksums are over DECODED
pixels, never container bytes. Encoders exist for the formats the
staged fixture feeds package (PPM, 24-bit BMP, uncompressed RGB TIFF)
so the cross-format dedup operator can prove decoder agreement on
identical content.
"""

from __future__ import annotations

import re
import struct

import numpy as np


class RasterError(ValueError):
    """Raised for malformed or out-of-scope raster payloads."""


# ---------------------------------------------------------------------------
# netpbm (PPM P6 / PGM P5)
# ---------------------------------------------------------------------------


def _pnm_tokens(data: bytes, n: int, pos: int) -> tuple[list[int], int]:
    """Read `n` whitespace/comment-separated ASCII integers from `pos`."""
    out: list[int] = []
    ln = len(data)
    while len(out) < n:
        while pos < ln and data[pos : pos + 1].isspace():
            pos += 1
        if pos < ln and data[pos] == 0x23:  # '#' comment runs to EOL
            while pos < ln and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < ln and data[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise RasterError("netpbm: malformed header integer")
        out.append(int(data[start:pos]))
    if pos >= ln or not data[pos : pos + 1].isspace():
        raise RasterError("netpbm: missing whitespace after header")
    return out, pos + 1  # exactly ONE whitespace byte before raster


def pnm_decode(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6 -> (h,w,3)) or PGM (P5 -> (h,w))."""
    if data[:2] == b"P6":
        ch = 3
    elif data[:2] == b"P5":
        ch = 1
    else:
        raise RasterError("netpbm: only binary P5/P6 supported")
    (w, h, maxval), pos = _pnm_tokens(data, 3, 2)
    if maxval != 255:
        raise RasterError(f"netpbm: only maxval 255 supported, got {maxval}")
    need = w * h * ch
    raster = data[pos : pos + need]
    if len(raster) < need:
        raise RasterError("netpbm: truncated raster")
    arr = np.frombuffer(raster, dtype=np.uint8)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def pnm_encode(arr: np.ndarray) -> bytes:
    """Encode uint8 (h,w) as P5 or (h,w,3) as P6."""
    if arr.dtype != np.uint8:
        raise RasterError("pnm_encode wants uint8")
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise RasterError("pnm_encode wants (h,w) or (h,w,3)")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


# ---------------------------------------------------------------------------
# XBM (X BitMap C source)
# ---------------------------------------------------------------------------

_XBM_DEF = re.compile(rb"#define\s+\w*?_?(width|height)\s+(\d+)")
_XBM_BYTE = re.compile(rb"0[xX]([0-9a-fA-F]{1,2})")


def xbm_decode(data: bytes) -> np.ndarray:
    """Decode an XBM to a (h, w) uint8 array of 0/1 (1 = set bit).

    Bits are LSB-first within each byte; each row starts on a byte
    boundary (rows padded to ceil(w/8) bytes).
    """
    dims = {m.group(1): int(m.group(2)) for m in _XBM_DEF.finditer(data)}
    if b"width" not in dims or b"height" not in dims:
        raise RasterError("xbm: missing width/height #define")
    w, h = dims[b"width"], dims[b"height"]
    body = data[data.find(b"{") :]
    vals = [int(m.group(1), 16) for m in _XBM_BYTE.finditer(body)]
    per_row = (w + 7) // 8
    if len(vals) < per_row * h:
        raise RasterError("xbm: truncated byte array")
    rows = np.array(vals[: per_row * h], dtype=np.uint8).reshape(h, per_row)
    bits = np.unpackbits(rows, axis=1, bitorder="little")
    return bits[:, :w]


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def _mask_shift(mask: int) -> tuple[int, int]:
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    if (mask >> shift) != (1 << width) - 1:
        raise RasterError(f"bmp: non-contiguous channel mask {mask:#x}")
    return shift, width


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a BMP: 24-bit BGR -> (h,w,3); 32-bit BI_RGB/BI_BITFIELDS
    -> (h,w,4) RGBA; 8-bit palette -> (h,w,3)."""
    if data[:2] != b"BM":
        raise RasterError("bmp: bad magic")
    data_off, = struct.unpack_from("<I", data, 10)
    hdr_size, = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise RasterError(f"bmp: core/unknown header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp, = struct.unpack_from("<I", data, 30)
    if planes != 1 or w <= 0 or h_raw == 0:
        raise RasterError("bmp: bad planes/dimensions")
    h = abs(h_raw)
    top_down = h_raw < 0

    if bpp == 8:
        if comp != 0:
            raise RasterError("bmp: RLE8 not supported")
        n_colors, = struct.unpack_from("<I", data, 46)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data, dtype=np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, :w]
        idx = rows if top_down else rows[::-1]
        return pal[idx]

    if bpp == 24:
        if comp != 0:
            raise RasterError("bmp: compressed 24-bit not supported")
        stride = (3 * w + 3) & ~3
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)
        px = rows[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return np.ascontiguousarray(px if top_down else px[::-1])

    if bpp == 32:
        if comp == 0:  # BI_RGB: fixed BGRX
            masks = (0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)
        elif comp == 3:  # BI_BITFIELDS: masks follow the header
            masks = struct.unpack_from("<4I", data, 54)
        else:
            raise RasterError(f"bmp: unsupported 32-bit compression {comp}")
        words = np.frombuffer(
            data, dtype="<u4", count=w * h, offset=data_off
        ).reshape(h, w)
        if not top_down:
            words = words[::-1]
        out = np.zeros((h, w, 4), dtype=np.uint8)
        for i, mask in enumerate(masks):
            if mask == 0 and i == 3:  # no alpha mask -> opaque
                out[:, :, 3] = 255
                continue
            shift, width = _mask_shift(mask)
            if width != 8:
                raise RasterError("bmp: only 8-bit channels supported")
            out[:, :, i] = ((words >> shift) & 0xFF).astype(np.uint8)
        return out

    raise RasterError(f"bmp: unsupported bit depth {bpp}")


def bmp_encode(arr: np.ndarray) -> bytes:
    """Encode uint8 (h,w,3) RGB as a bottom-up 24-bit BI_RGB BMP."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise RasterError("bmp_encode wants uint8 (h,w,3)")
    h, w = arr.shape[:2]
    stride = (3 * w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)  # RGB->BGR, flip
    body = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


# ---------------------------------------------------------------------------
# TIFF (baseline 6.0)
# ---------------------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _tiff_values(data: bytes, endian: str, typ: int, cnt: int, raw: bytes):
    size = _TIFF_TYPE_SIZE.get(typ)
    if size is None:
        raise RasterError(f"tiff: unsupported field type {typ}")
    total = size * cnt
    if total <= 4:
        buf = raw[:4]
    else:
        off = struct.unpack(endian + "I", raw)[0]
        buf = data[off : off + total]
    if len(buf) < total:
        raise RasterError("tiff: truncated field value")
    if typ == 2:
        return buf
    fmt = {1: "B", 3: "H", 4: "I", 5: "II"}[typ]
    vals = struct.unpack(endian + fmt * cnt, buf[:total])
    if typ == 5:
        vals = tuple(
            vals[i] / vals[i + 1] if vals[i + 1] else 0.0
            for i in range(0, len(vals), 2)
        )
    return list(vals)


def _packbits(src: bytes, expect: int) -> bytes:
    """TIFF PackBits (Apple RLE) decompression."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expect:
        ctl = src[i]
        i += 1
        if ctl < 128:
            out += src[i : i + ctl + 1]
            i += ctl + 1
        elif ctl > 128:
            out += src[i : i + 1] * (257 - ctl)
            i += 1
        # ctl == 128: no-op
    if len(out) < expect:
        raise RasterError("tiff: PackBits underrun")
    return bytes(out[:expect])


def tiff_decode(data: bytes) -> np.ndarray:
    """Decode a baseline single-IFD TIFF (see module docstring scope)."""
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise RasterError("tiff: bad magic")
    ifd_off, = struct.unpack_from(endian + "I", data, 4)
    n_entries, = struct.unpack_from(endian + "H", data, ifd_off)
    tags: dict[int, list] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(endian + "HHI", data, off)
        tags[tag] = _tiff_values(data, endian, typ, cnt, data[off + 8 : off + 12])

    def one(tag: int, default=None) -> int:
        if tag not in tags:
            if default is None:
                raise RasterError(f"tiff: missing required tag {tag}")
            return default
        return int(tags[tag][0])

    w, h = one(256), one(257)
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bps = tags.get(258, [8] * spp)
    if any(int(b) != 8 for b in bps):
        raise RasterError(f"tiff: only 8-bit samples supported, got {bps}")
    if one(284, 1) != 1:
        raise RasterError("tiff: planar configuration 2 not supported")
    if comp not in (1, 32773):
        raise RasterError(f"tiff: unsupported compression {comp}")
    if photo not in (1, 2) or (photo == 2 and spp < 3) or (photo == 1 and spp != 1):
        raise RasterError(f"tiff: unsupported photometric {photo}/spp {spp}")

    offsets = [int(v) for v in tags[273]]
    counts = [int(v) for v in tags[279]]
    rows_per = one(278, h)
    if len(offsets) != len(counts):
        raise RasterError("tiff: strip offset/count mismatch")
    row_bytes = w * spp
    chunks = []
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        n_rows = min(rows_per, h - s * rows_per)
        expect = n_rows * row_bytes
        raw = data[off : off + cnt]
        if len(raw) < cnt:
            raise RasterError("tiff: truncated strip")
        chunks.append(raw[:expect] if comp == 1 else _packbits(raw, expect))
        if comp == 1 and len(raw) < expect:
            raise RasterError("tiff: strip shorter than raster")
    raster = b"".join(chunks)
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, spp)
    if photo == 1:
        return arr[:, :, 0].copy()
    return arr[:, :, :4].copy() if spp >= 4 else arr.copy()


def tiff_encode(arr: np.ndarray) -> bytes:
    """Encode uint8 (h,w,3) RGB as a little-endian uncompressed
    single-strip baseline TIFF."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise RasterError("tiff_encode wants uint8 (h,w,3)")
    h, w = arr.shape[:2]
    raster = arr.tobytes()
    strip_off = 8
    ifd_off = strip_off + len(raster)
    entries = [
        (256, 3, 1, w),            # ImageWidth
        (257, 3, 1, h),            # ImageLength
        (258, 3, 3, None),         # BitsPerSample -> external
        (259, 3, 1, 1),            # Compression: none
        (262, 3, 1, 2),            # Photometric: RGB
        (273, 4, 1, strip_off),    # StripOffsets
        (277, 3, 1, 3),            # SamplesPerPixel
        (278, 3, 1, h),            # RowsPerStrip
        (279, 4, 1, len(raster)),  # StripByteCounts
        (284, 3, 1, 1),            # PlanarConfiguration
    ]
    bps_off = ifd_off + 2 + 12 * len(entries) + 4
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 258:
            ifd += struct.pack("<HHII", tag, typ, cnt, bps_off)
        else:
            ifd += struct.pack("<HHI", tag, typ, cnt)
            ifd += struct.pack("<I", val) if typ == 4 else struct.pack("<HH", val, 0)
    ifd += struct.pack("<I", 0)  # next IFD
    ifd += struct.pack("<HHH", 8, 8, 8)
    return b"II*\x00" + struct.pack("<I", ifd_off) + raster + ifd
