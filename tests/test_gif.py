"""Unit tests for the GIF codec (functions/gif.py): LZW corner cases,
interlace, transparency/disposal compositing, palettes, and the
loud-error contract. External-file pins live in test_interop.py."""

import numpy as np
import pytest

from streams_spark.functions.gif import (
    Gif,
    GifError,
    GifFrame,
    GifFrameSpec,
    gif_composite,
    gif_decode,
    gif_encode,
    lzw_decode,
    lzw_encode,
)


def _pal(n, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (n, 3), dtype=np.uint8)


def _idx(h, w, n, seed=0):
    return np.random.default_rng(seed).integers(0, n, (h, w), dtype=np.uint8)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def test_lzw_round_trip_all_min_code_sizes():
    rng = np.random.default_rng(1)
    for mcs in range(2, 9):
        data = rng.integers(0, 1 << mcs, 500, dtype=np.uint8).tobytes()
        assert lzw_decode(lzw_encode(data, mcs), mcs, len(data)) == data


def test_lzw_kwkwk_case():
    # 'aaaa...' forces the code==len(table) branch immediately
    data = b"\x00" * 50
    assert lzw_decode(lzw_encode(data, 2), 2, 50) == data


def test_lzw_table_reset_at_4096():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data, 8), 8, len(data)) == data


def test_lzw_rejects_garbage_codes():
    # a first code beyond the initial table
    import struct

    # min_code_size 2: emit raw 6 (beyond eoi=3 and empty slots) as first code
    raw = struct.pack("<H", (6 << 3) | 4)  # CLEAR(100b) then 110b
    with pytest.raises(GifError):
        lzw_decode(raw, 2, 4)


def test_lzw_underrun_raises():
    enc = lzw_encode(b"\x01\x02\x03", 2)
    with pytest.raises(GifError):
        lzw_decode(enc, 2, 10)


# ---------------------------------------------------------------------------
# container round trips
# ---------------------------------------------------------------------------


def test_round_trip_interlaced_local_palette_transparency():
    pal = _pal(37, seed=3)
    lpal = _pal(16, seed=4)
    f0 = _idx(24, 31, 37, seed=5)
    f1 = _idx(10, 12, 16, seed=6)
    data = gif_encode(
        31, 24,
        [
            GifFrameSpec(f0, interlaced=True),
            GifFrameSpec(f1, x=5, y=3, palette=lpal, transparent=7,
                         disposal=1, delay_cs=10),
        ],
        pal, loop_count=3, comment=b"fixture",
    )
    dec = gif_decode(data)
    assert dec.version == b"89a" and dec.loop_count == 3
    assert dec.comments == [b"fixture"]
    assert np.array_equal(dec.frames[0].indices, f0)
    assert dec.frames[0].interlaced and not dec.frames[0].local_palette
    assert np.array_equal(dec.frames[0].palette[:37], pal)
    fr1 = dec.frames[1]
    assert (fr1.x, fr1.y) == (5, 3) and fr1.transparent == 7
    assert fr1.disposal == 1 and fr1.delay_cs == 10 and fr1.local_palette
    assert np.array_equal(fr1.palette[:16], lpal)
    assert np.array_equal(fr1.indices, f1)


def test_interlace_is_row_permutation():
    pal = _pal(8, seed=7)
    idx = _idx(17, 5, 8, seed=8)  # odd height exercises pass boundaries
    plain = gif_decode(gif_encode(5, 17, [GifFrameSpec(idx)], pal))
    inter = gif_decode(
        gif_encode(5, 17, [GifFrameSpec(idx, interlaced=True)], pal)
    )
    assert np.array_equal(plain.frames[0].indices, inter.frames[0].indices)


def test_odd_palette_size_pads_to_power_of_two():
    pal = _pal(5, seed=9)
    idx = _idx(4, 4, 5, seed=10)
    dec = gif_decode(gif_encode(4, 4, [GifFrameSpec(idx)], pal))
    assert len(dec.frames[0].palette) == 8
    assert np.array_equal(dec.frames[0].palette[:5], pal)


# ---------------------------------------------------------------------------
# compositing
# ---------------------------------------------------------------------------


def test_composite_transparency_keeps_underlying_pixels():
    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0]], dtype=np.uint8)
    base = np.zeros((4, 4), dtype=np.uint8)
    patch = np.array([[1, 2], [2, 1]], dtype=np.uint8)
    data = gif_encode(
        4, 4,
        [
            GifFrameSpec(base),
            GifFrameSpec(patch, x=1, y=1, transparent=2),
        ],
        pal,
    )
    canvas = gif_composite(gif_decode(data))
    assert tuple(canvas[1, 1]) == (200, 0, 0)   # opaque index 1
    assert tuple(canvas[1, 2]) == (10, 10, 10)  # transparent -> base shows
    assert tuple(canvas[2, 1]) == (10, 10, 10)
    assert tuple(canvas[2, 2]) == (200, 0, 0)


def test_composite_disposal_restore_background_and_previous():
    pal = np.array([[1, 1, 1], [50, 0, 0], [0, 50, 0]], dtype=np.uint8)
    base = np.zeros((3, 3), dtype=np.uint8)
    flash = np.full((2, 2), 1, dtype=np.uint8)
    data = gif_encode(
        3, 3,
        [
            GifFrameSpec(base),
            GifFrameSpec(flash, x=0, y=0, disposal=2),  # restore to bg
        ],
        pal,
    )
    canvas = gif_composite(gif_decode(data))
    # disposal 2 cleared the flash region to transparent-black
    assert tuple(canvas[0, 0]) == (0, 0, 0)
    assert tuple(canvas[2, 2]) == (1, 1, 1)

    data3 = gif_encode(
        3, 3,
        [
            GifFrameSpec(base),
            GifFrameSpec(flash, x=0, y=0, disposal=3),  # restore previous
        ],
        pal,
    )
    canvas3 = gif_composite(gif_decode(data3))
    assert tuple(canvas3[0, 0]) == (1, 1, 1)  # base restored


# ---------------------------------------------------------------------------
# loud errors
# ---------------------------------------------------------------------------


def test_rejects_bad_magic_frame_overflow_and_missing_trailer():
    pal = _pal(4, seed=11)
    idx = _idx(2, 2, 4, seed=12)
    good = gif_encode(2, 2, [GifFrameSpec(idx)], pal)
    with pytest.raises(GifError):
        gif_decode(b"JIF89a" + good[6:])
    with pytest.raises(GifError):
        gif_decode(good[:-1])  # trailer gone
    with pytest.raises(GifError):
        gif_encode(2, 2, [GifFrameSpec(idx, x=1)], pal)  # overflows screen


def test_rejects_index_beyond_palette():
    pal = _pal(4, seed=13)
    idx = np.full((2, 2), 9, dtype=np.uint8)
    with pytest.raises(GifError):
        gif_encode(2, 2, [GifFrameSpec(idx)], pal)
    # and on the decode side: craft via a bigger palette then shrink GCT
    big = gif_encode(2, 2, [GifFrameSpec(idx)], _pal(16, seed=14))
    # GCT size field down to 4 entries (flags bits 0-2): 16->4 colors
    raw = bytearray(big)
    raw[10] = (raw[10] & ~0x07) | 0x01
    # drop 12 palette entries (36 bytes) after the 13-byte header
    del raw[13 + 12 : 13 + 48]
    with pytest.raises(GifError):
        gif_decode(bytes(raw))


def test_frame_without_any_palette_raises():
    pal = _pal(4, seed=15)
    idx = _idx(2, 2, 4, seed=16)
    raw = bytearray(gif_encode(2, 2, [GifFrameSpec(idx)], pal))
    raw[10] &= 0x7F  # clear GCT flag
    del raw[13 : 13 + 12]  # remove the GCT bytes
    with pytest.raises(GifError):
        gif_decode(bytes(raw))


def test_gif87a_accepted():
    pal = _pal(4, seed=17)
    idx = _idx(2, 2, 4, seed=18)
    raw = bytearray(gif_encode(2, 2, [GifFrameSpec(idx)], pal))
    raw[3:6] = b"87a"
    dec = gif_decode(bytes(raw))
    assert dec.version == b"87a"
    assert np.array_equal(dec.frames[0].indices, idx)
