"""External-corpus interop smoke (VERDICT r10 #7): decode real,
externally-produced media files found on the host — CPython test-suite
images/audio, nodejs docs JPEGs, the canonical libpng test image —
none of which came from this repo's fixture encoders. This catches the
bug class closed-form oracles cannot: wrong-but-self-consistent
synthesis (an encoder and decoder sharing the same misreading of the
spec agree with each other and with any oracle derived from them).

Every test skips cleanly when its file is absent, so the suite stays
green on hosts without these corpora. Containers/codecs with no
externally-produced sample sourceable offline: MP4, MP3, AAC, H.264,
arithmetic-coded JPEG (SOF10) — recorded here as the honest gap; the
avc1/length-prefix packaging is at least exercised against the 14496-15
byte layout in test_mp4.py.
"""

import os

import numpy as np
import pytest

_PY_TEST = "/root/.pyenv/versions/3.11.7/lib/python3.11/test"


def _need(path):
    if not os.path.exists(path):
        pytest.skip(f"external file not on this host: {path}")
    with open(path, "rb") as fh:
        return fh.read()


# ---------------------------------------------------------------------------
# JPEG: two externally-encoded baseline (SOF0) files and two
# externally-encoded progressive (SOF2) files
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "path,shape,checksum",
    [
        (_PY_TEST + "/imghdrdata/python.jpg", (16, 16, 3), 73591),
        (_PY_TEST + "/imghdrdata/python-raw.jpg", (16, 16, 3), 73591),
        (
            "/usr/share/doc/nodejs/thin-white-stripe.jpg",
            (58, 493, 3), 20012547,
        ),
        (
            "/usr/share/doc/nodejs/full-white-stripe.jpg",
            (312, 493, 3), 115267687,
        ),
    ],
)
def test_external_jpeg_decodes(path, shape, checksum):
    from streams_spark.functions.jpeg import jpeg_decode

    arr = np.asarray(jpeg_decode(_need(path)))
    assert arr.shape == shape and arr.dtype == np.uint8
    # pinned on first successful decode; a decoder change that shifts
    # any pixel of a REAL external file must be a conscious decision
    assert int(arr.astype(np.int64).sum()) == checksum


def test_external_jpeg_pair_is_same_image():
    # python.jpg is python-raw.jpg plus a JFIF APP0 wrapper: identical
    # entropy data, so the decodes must agree pixel-for-pixel
    from streams_spark.functions.jpeg import jpeg_decode

    a = np.asarray(jpeg_decode(_need(_PY_TEST + "/imghdrdata/python.jpg")))
    b = np.asarray(
        jpeg_decode(_need(_PY_TEST + "/imghdrdata/python-raw.jpg"))
    )
    assert (a == b).all()


# ---------------------------------------------------------------------------
# PNG: palette (type 3), RGBA (6), and Adam7 interlacing from real files
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "path,shape,checksum",
    [
        # palette + tRNS -> RGBA
        (_PY_TEST + "/imghdrdata/python.png", (16, 16, 4), 107689),
        # RGBA + Adam7 interlaced (libpng's own canonical test image)
        (
            "/usr/share/doc/libpng-dev/examples/pngtest.png",
            (69, 91, 4), 1407977,
        ),
        # palette, no tRNS -> RGB
        ("/usr/share/gitweb/static/git-logo.png", (27, 72, 3), 1292808),
        # plain RGBA, non-interlaced
        ("/usr/share/doc/python3/_static/file.png", (16, 16, 4), 176330),
    ],
)
def test_external_png_decodes(path, shape, checksum):
    from streams_spark.functions.codecs import png_decode

    arr = png_decode(_need(path))
    assert arr.shape == shape and arr.dtype == np.uint8
    assert int(arr.astype(np.int64).sum()) == checksum


# ---------------------------------------------------------------------------
# WAV: all four integer PCM widths from CPython's audio test data.
# The pluck-pcm* files are the SAME recording at different widths, so
# they cross-check each other: the 32-bit file is EXACTLY the 24-bit
# samples shifted left 8 (byte-order or sign-extension bugs cannot
# pass), while the 16- and 8-bit files are dithered requantizations of
# the same master (within a few LSBs).
# ---------------------------------------------------------------------------


def test_external_wav_pcm_width_family_cross_checks():
    from streams_spark.functions.codecs import wav_decode

    s16, r16, c16 = wav_decode(_need(_PY_TEST + "/audiodata/pluck-pcm16.wav"))
    s24, r24, c24 = wav_decode(_need(_PY_TEST + "/audiodata/pluck-pcm24.wav"))
    s32, r32, c32 = wav_decode(_need(_PY_TEST + "/audiodata/pluck-pcm32.wav"))
    s8, r8, c8 = wav_decode(_need(_PY_TEST + "/audiodata/pluck-pcm8.wav"))
    assert r16 == r24 == r32 == r8 == 11025
    assert c16 == c24 == c32 == c8 == 2
    assert s16.shape == s24.shape == s32.shape == s8.shape == (3307, 2)
    a16 = np.asarray(s16, dtype=np.int64)
    a24 = np.asarray(s24, dtype=np.int64)
    a32 = np.asarray(s32, dtype=np.int64)
    # exact: any byte-order / sign-extension error in the 24-bit walk
    # breaks this on the first negative sample
    assert (a32 >> 8 == a24).all()
    assert a24.min() < 0 < a24.max()  # sign extension genuinely engaged
    # dithered requantizations of the same master: tightly correlated
    assert np.abs((a24 >> 8) - a16).max() <= 8
    assert np.abs(np.asarray(s8, dtype=np.int64) - (a16 >> 8)).max() <= 2
    assert int(a16.sum()) == -463547  # pinned external ground truth


def test_external_wav_sndhdr_header():
    from streams_spark.functions.codecs import wav_decode

    s, rate, ch = wav_decode(_need(_PY_TEST + "/sndhdrdata/sndhdr.wav"))
    assert (rate, ch) == (44100, 2) and s.shape == (5, 2)
