"""Unit tests for the uncompressed raster codecs (functions/rasters.py):
netpbm, XBM, BMP, baseline TIFF. External-file pins live in
test_interop.py; these cover round-trips, layout variants, and the
loud-error contract."""

import numpy as np
import pytest

from streams_spark.functions.rasters import (
    RasterError,
    bmp_decode,
    bmp_encode,
    pnm_decode,
    pnm_encode,
    tiff_decode,
    tiff_encode,
    xbm_decode,
)


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# netpbm
# ---------------------------------------------------------------------------


def test_pnm_round_trip_rgb_and_grey():
    img = _img(11, 7)
    assert np.array_equal(pnm_decode(pnm_encode(img)), img)
    grey = img[:, :, 0].copy()
    assert np.array_equal(pnm_decode(pnm_encode(grey)), grey)


def test_pnm_header_comments_and_whitespace():
    img = _img(3, 2, seed=1)
    raw = b"P6 # inline comment\n# full line\n 2\t3 \n255\n" + img.tobytes()
    assert np.array_equal(pnm_decode(raw), img)


def test_pnm_rejects_ascii_variants_and_bad_maxval():
    with pytest.raises(RasterError):
        pnm_decode(b"P3\n1 1\n255\n1 2 3")
    with pytest.raises(RasterError):
        pnm_decode(b"P6\n1 1\n65535\n" + b"\x00" * 6)
    with pytest.raises(RasterError):
        pnm_decode(b"P6\n2 2\n255\n" + b"\x00" * 5)  # truncated


# ---------------------------------------------------------------------------
# XBM
# ---------------------------------------------------------------------------


def test_xbm_lsb_first_rows_and_padding():
    src = (
        b"#define t_width 10\n#define t_height 2\n"
        b"static unsigned char t_bits[] = {\n"
        b"  0x01, 0x02, 0x80, 0x03 };\n"
    )
    bits = xbm_decode(src)
    assert bits.shape == (2, 10)
    # row 0: bytes 0x01,0x02 -> bit 0 set; bit 9 (byte1 bit1) set
    assert bits[0, 0] == 1 and bits[0, 9] == 1 and bits[0, 1:9].sum() == 0
    # row 1: 0x80,0x03 -> bit 7; bits 8,9
    assert bits[1, 7] == 1 and bits[1, 8] == 1 and bits[1, 9] == 1
    assert bits.sum() == 5


def test_xbm_truncated_raises():
    with pytest.raises(RasterError):
        xbm_decode(b"#define t_width 16\n#define t_height 2\n{0x00, 0x01};")


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def test_bmp_24bit_round_trip_with_row_padding():
    # width 5 -> 15-byte rows padded to 16: exercises stride handling
    img = _img(6, 5, seed=2)
    assert np.array_equal(bmp_decode(bmp_encode(img)), img)


def test_bmp_8bit_palette():
    import struct

    pal = np.arange(256 * 4, dtype=np.uint8).reshape(256, 4)
    idx = np.arange(16, dtype=np.uint8).reshape(4, 4)
    hdr = struct.pack("<2sIHHI", b"BM", 0, 0, 0, 54 + 1024)
    hdr += struct.pack(
        "<IiiHHIIiiII", 40, 4, 4, 1, 8, 0, 16, 0, 0, 256, 0
    )
    data = hdr + pal.tobytes() + idx[::-1].tobytes()  # bottom-up
    out = bmp_decode(data)
    # palette rows are BGRX: entry j decodes to (pal[j,2], pal[j,1], pal[j,0])
    expect = pal[idx][:, :, :3][:, :, ::-1]
    assert np.array_equal(out, expect)


def test_bmp_rejects_rle_and_odd_depths():
    img = _img(2, 2, seed=3)
    raw = bytearray(bmp_encode(img))
    raw[28] = 4  # bpp 4
    with pytest.raises(RasterError):
        bmp_decode(bytes(raw))
    raw = bytearray(bmp_encode(img))
    raw[30] = 1  # BI_RLE8 on 24bpp
    with pytest.raises(RasterError):
        bmp_decode(bytes(raw))


def test_bmp_top_down_32bit_bi_rgb():
    import struct

    px = np.random.default_rng(4).integers(0, 256, (3, 2, 4), dtype=np.uint8)
    words = (
        px[:, :, 3].astype("<u4") << 24
        | px[:, :, 0].astype("<u4") << 16
        | px[:, :, 1].astype("<u4") << 8
        | px[:, :, 2].astype("<u4")
    )
    hdr = struct.pack("<2sIHHI", b"BM", 0, 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, 2, -3, 1, 32, 0, 24, 0, 0, 0, 0)
    out = bmp_decode(hdr + words.tobytes())
    assert np.array_equal(out[:, :, 0], px[:, :, 0])  # R from bits 16-23
    assert np.array_equal(out[:, :, 3], px[:, :, 3])  # alpha preserved


# ---------------------------------------------------------------------------
# TIFF
# ---------------------------------------------------------------------------


def test_tiff_round_trip():
    img = _img(9, 13, seed=5)
    assert np.array_equal(tiff_decode(tiff_encode(img)), img)


def test_tiff_big_endian_and_multistrip():
    import struct

    # hand-build a big-endian greyscale TIFF with 2 strips of 2 rows
    grey = np.arange(4 * 3, dtype=np.uint8).reshape(4, 3)
    s0, s1 = grey[:2].tobytes(), grey[2:].tobytes()
    off0 = 8
    off1 = off0 + len(s0)
    ifd_off = off1 + len(s1)
    entries = [
        (256, 3, 1, 3), (257, 3, 1, 4), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (277, 3, 1, 1), (278, 3, 1, 2),
    ]
    ifd = struct.pack(">H", len(entries) + 2)
    for tag, typ, cnt, val in entries:
        ifd += struct.pack(">HHIHH", tag, typ, cnt, val, 0)
    ifd += struct.pack(">HHIII", 273, 4, 2, ifd_off + 2 + 12 * 9 + 4, 0)[:12]
    ifd += struct.pack(">HHIII", 279, 4, 2, ifd_off + 2 + 12 * 9 + 4 + 8, 0)[:12]
    ifd += struct.pack(">I", 0)
    ifd += struct.pack(">II", off0, off1) + struct.pack(">II", len(s0), len(s1))
    data = b"MM\x00*" + struct.pack(">I", ifd_off) + s0 + s1 + ifd
    assert np.array_equal(tiff_decode(data), grey)


def test_tiff_packbits():
    import struct

    # one strip, PackBits: literal run + repeat run per row
    grey = np.array([[7, 7, 7, 7, 1, 2], [3, 3, 3, 3, 3, 3]], dtype=np.uint8)
    packed = bytes([257 - 4, 7, 1, 1, 2]) + bytes([257 - 6, 3])
    strip_off = 8
    ifd_off = strip_off + len(packed)
    entries = [
        (256, 3, 1, 6), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 32773),
        (262, 3, 1, 1), (273, 4, 1, strip_off), (277, 3, 1, 1),
        (278, 3, 1, 2), (279, 4, 1, len(packed)),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 4:
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
        else:
            ifd += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
    ifd += struct.pack("<I", 0)
    data = b"II*\x00" + struct.pack("<I", ifd_off) + packed + ifd
    assert np.array_equal(tiff_decode(data), grey)


def test_tiff_rejects_lzw_tiles_and_16bit():
    img = _img(2, 2, seed=6)
    raw = bytearray(tiff_encode(img))
    # flip Compression (tag 259) value to 5 (LZW): find it in the IFD
    data = tiff_decode(bytes(raw))  # sanity: valid before mutation
    assert data.shape == (2, 2, 3)
    import struct

    ifd_off = struct.unpack_from("<I", raw, 4)[0]
    n = struct.unpack_from("<H", raw, ifd_off)[0]
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", raw, off)[0]
        if tag == 259:
            struct.pack_into("<H", raw, off + 8, 5)
    with pytest.raises(RasterError):
        tiff_decode(bytes(raw))
