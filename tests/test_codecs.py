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
