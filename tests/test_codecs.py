"""Dependency-free PNG/WAV codec tests (streams_spark/functions/codecs.py).

The m_decode_real oracle proves the Spark-side round-trip end to end;
these pin the codec corners directly: every PNG filter type, grey vs
RGB, mono vs stereo WAV, probe dispatch, and loud failure on
unsupported input.
"""

from __future__ import annotations

import numpy as np
import pytest

from streams_spark.functions.codecs import (
    CHECKSUM_MOD,
    media_probe,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(13, 17), (9, 5, 3), (1, 1), (2, 1, 3)])
def test_png_roundtrip_every_filter(filter_type, shape):
    rng = np.random.default_rng(filter_type * 100 + len(shape))
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = png_decode(png_encode(arr, filter_type))
    assert back.shape == arr.shape
    assert (back == arr).all()


def test_png_decoder_rejects_non_png_and_bad_depth():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    with pytest.raises(ValueError):
        png_encode(np.zeros((4, 4), dtype=np.int32))


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32767, size=(501,)).astype(np.int16)
    s, rate, ch = wav_decode(wav_encode(mono, 8_000))
    assert (rate, ch) == (8_000, 1)
    assert (s[:, 0] == mono).all()
    stereo = rng.integers(-100, 100, size=(64, 2)).astype(np.int16)
    s2, rate2, ch2 = wav_decode(wav_encode(stereo))
    assert (rate2, ch2) == (16_000, 2)
    assert (s2 == stereo).all()


def test_media_probe_dispatch_and_content_checksum():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    w, h, ch, csum = media_probe(png_encode(img, 4))
    assert (w, h, ch) == (4, 4, 3)
    assert csum == int(img.sum()) % CHECKSUM_MOD
    samples = (np.arange(100) - 50).astype(np.int16)
    n, one, ch2, csum2 = media_probe(wav_encode(samples))
    assert (n, one, ch2) == (100, 1, 1)
    assert csum2 == int(samples.astype(np.int64).sum()) % CHECKSUM_MOD
    with pytest.raises(ValueError):
        media_probe(b"\x00" * 32)


def test_frames_container_roundtrip_mixed_shapes():
    from streams_spark.functions.codecs import frames_decode, frames_encode

    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(5, 9), dtype=np.uint8).astype(np.uint8),
        rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8).astype(np.uint8),
        rng.integers(0, 256, size=(3, 3), dtype=np.uint8).astype(np.uint8),
        rng.integers(0, 256, size=(8, 2), dtype=np.uint8).astype(np.uint8),
        rng.integers(0, 256, size=(2, 8), dtype=np.uint8).astype(np.uint8),
        rng.integers(0, 256, size=(4, 4), dtype=np.uint8).astype(np.uint8),
    ]
    # 6 frames -> filter types 0..4 then 0 again: every un-filter path runs
    out = frames_decode(frames_encode(frames))
    assert len(out) == len(frames)
    for got, want in zip(out, frames):
        assert got.shape == want.shape and (got == want).all()
    assert frames_decode(frames_encode([])) == []


def test_frames_container_rejects_torn_and_foreign_bytes():
    from streams_spark.functions.codecs import frames_decode, frames_encode

    good = frames_encode([np.zeros((4, 4), dtype=np.uint8)])
    with pytest.raises(ValueError):
        frames_decode(b"AVI " + good[4:])  # bad magic
    with pytest.raises(ValueError):
        frames_decode(good[:-3])  # torn frame payload
    with pytest.raises(ValueError):
        frames_decode(good + b"\x00\x01")  # trailing garbage
    with pytest.raises(ValueError):
        frames_decode(good[:5])  # magic only, torn header
    with pytest.raises(ValueError):
        frames_decode(good[:7])  # truncated inside the frame count


def test_media_probe_dispatches_frame_containers():
    from streams_spark.functions.codecs import frames_encode, media_probe

    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, size=(6, 9), dtype=np.uint8) for _ in range(3)
    ]
    w, h, nf, csum = media_probe(frames_encode(frames))
    assert (w, h, nf) == (9, 6, 3)
    want = sum(int(a.astype(np.int64).sum()) for a in frames) % CHECKSUM_MOD
    assert csum == want
    assert media_probe(frames_encode([])) == (0, 0, 0, 0)


def test_media_probe_rejects_mixed_shape_frame_container():
    from streams_spark.functions.codecs import frames_encode, media_probe

    mixed = frames_encode(
        [np.zeros((4, 4), dtype=np.uint8), np.zeros((3, 5), dtype=np.uint8)]
    )
    with pytest.raises(ValueError):
        media_probe(mixed)


# ---------------------------------------------------------------------------
# r11 PNG extensions: palette / alpha / Adam7 (synthetic self-checks;
# real-world files are pinned in tests/test_interop.py)
# ---------------------------------------------------------------------------


def _chunk(tag, body):
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    )


def _ihdr(w, h, ctype, interlace=0):
    import struct

    return _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, interlace)
    )


_MAGIC = b"\x89PNG\r\n\x1a\n"


def test_png_palette_with_trns_decodes_to_rgba():
    import zlib as _z

    from streams_spark.functions.codecs import png_decode

    # 2x2 palette image: indices [[0,1],[2,1]]; palette has 3 colors,
    # tRNS covers only the first two (third defaults to opaque 255)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 1])
    png = (
        _MAGIC + _ihdr(2, 2, 3) + _chunk(b"PLTE", plte)
        + _chunk(b"tRNS", bytes([10, 200]))
        + _chunk(b"IDAT", _z.compress(raw)) + _chunk(b"IEND", b"")
    )
    arr = png_decode(png)
    assert arr.shape == (2, 2, 4)
    assert arr[0, 0].tolist() == [255, 0, 0, 10]
    assert arr[0, 1].tolist() == [0, 255, 0, 200]
    assert arr[1, 0].tolist() == [0, 0, 255, 255]  # beyond tRNS: opaque


def test_png_palette_index_out_of_range_rejected():
    import zlib as _z

    import pytest

    from streams_spark.functions.codecs import png_decode

    png = (
        _MAGIC + _ihdr(1, 1, 3)
        + _chunk(b"PLTE", bytes([1, 2, 3]))
        + _chunk(b"IDAT", _z.compress(b"\x00\x05"))  # index 5, 1 entry
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        png_decode(png)


def test_png_adam7_scatter_reconstructs_known_array():
    import zlib as _z

    import numpy as np

    from streams_spark.functions.codecs import png_decode

    # 9x10 greyscale with value = 10*y + x: build the 7 Adam7 passes by
    # the spec's pass grid (filter 0 rows) and confirm the decoder
    # scatters every pass back to its exact (y, x) home
    h, w = 9, 10
    img = np.add.outer(np.arange(h) * 10, np.arange(w)).astype(np.uint8)
    passes = []
    for x0, y0, xs, ys in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        for row in sub:
            passes.append(b"\x00" + row.tobytes())
    png = (
        _MAGIC + _ihdr(w, h, 0, interlace=1)
        + _chunk(b"IDAT", _z.compress(b"".join(passes)))
        + _chunk(b"IEND", b"")
    )
    arr = png_decode(png)
    assert arr.shape == (h, w)
    assert (arr == img).all()


def test_png_grey_alpha_and_rgba_roundtrip_shapes():
    import zlib as _z

    import numpy as np

    from streams_spark.functions.codecs import png_decode

    ga = np.arange(2 * 3 * 2, dtype=np.uint8).reshape(2, 3, 2)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(2))
    png = (
        _MAGIC + _ihdr(3, 2, 4)
        + _chunk(b"IDAT", _z.compress(raw)) + _chunk(b"IEND", b"")
    )
    arr = png_decode(png)
    assert arr.shape == (2, 3, 2) and (arr == ga).all()


def test_wav_8_24_32_bit_synthetic_roundtrip():
    import struct

    import numpy as np

    from streams_spark.functions.codecs import wav_decode

    def wav(width, data, rate=8000, ch=1):
        byterate = rate * ch * width
        fmt = struct.pack(
            "<HHIIHH", 1, ch, rate, byterate, ch * width, 8 * width
        )
        body = (
            b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body) - 4) + body

    s, r, c = wav_decode(wav(1, bytes([0, 128, 255, 64])))
    assert s.ravel().tolist() == [-128, 0, 127, -64]
    vals = [-(1 << 23), -1, 0, 1, (1 << 23) - 1]
    data = b"".join(v.to_bytes(3, "little", signed=True) for v in vals)
    s, r, c = wav_decode(wav(3, data))
    assert s.ravel().tolist() == vals
    vals32 = [-(1 << 31), -257, 0, 65536, (1 << 31) - 1]
    data = b"".join(struct.pack("<i", v) for v in vals32)
    s, r, c = wav_decode(wav(4, data))
    assert s.ravel().tolist() == vals32
