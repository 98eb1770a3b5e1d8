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


# ---------------------------------------------------------------------------
# Raster matrix: CPython ships the SAME python-logo image as PPM, PGM,
# BMP, TIFF, GIF, XBM (test_email/data) and PNG (imghdrdata) — all
# externally produced. The uncompressed PPM is the raw-RGB ground
# truth; every other decoder is checked against it, which catches any
# wrong-but-self-consistent decode the per-format unit tests cannot.
# ---------------------------------------------------------------------------

_PY313 = "/root/.pyenv/versions/3.13.0/lib/python3.13"
_EMAIL = _PY313 + "/test/test_email/data"
_ICONS = _PY313 + "/idlelib/Icons"


def test_external_raster_matrix_cross_checks():
    from streams_spark.functions.codecs import png_decode
    from streams_spark.functions.gif import gif_decode
    from streams_spark.functions.rasters import (
        bmp_decode, pnm_decode, tiff_decode, xbm_decode,
    )

    ppm = pnm_decode(_need(_EMAIL + "/python.ppm"))
    assert ppm.shape == (16, 16, 3)
    assert int(ppm.astype(np.int64).sum()) == 68718  # raw-RGB ground truth

    # BMP (32bpp BI_BITFIELDS, V5 header) and TIFF (RGBA, ExtraSamples)
    # must reproduce the PPM bytes EXACTLY, and agree on alpha
    bmp = bmp_decode(_need(_EMAIL + "/python.bmp"))
    tif = tiff_decode(_need(_EMAIL + "/python.tiff"))
    assert bmp.shape == tif.shape == (16, 16, 4)
    assert (bmp[:, :, :3] == ppm).all()
    assert (tif == bmp).all()

    # ... and PNG of the same logo decodes to the SAME RGBA (third
    # independent codec agreeing byte-for-byte)
    png = png_decode(_need(_PY_TEST + "/imghdrdata/python.png"))
    assert (png == bmp).all()

    # GIF: 64-color externally-quantized palette — opaque pixels match
    # the truecolor ground truth within the producer's quantization
    gif = gif_decode(_need(_EMAIL + "/python.gif"))
    fr = gif.frames[0]
    assert (gif.width, gif.height) == (16, 16) and fr.transparent == 63
    opaque = fr.indices != fr.transparent
    assert int(opaque.sum()) == 149
    diff = np.abs(
        fr.palette[fr.indices].astype(int) - ppm.astype(int)
    )[opaque]
    assert diff.max() <= 3

    # XBM: the 1-bit mask has exactly the GIF's 149 opaque pixels
    xbm = xbm_decode(_need(_EMAIL + "/python.xbm"))
    assert xbm.shape == (16, 16) and int(xbm.sum()) == 149

    # PGM: externally-produced greyscale of the same logo
    pgm = pnm_decode(_need(_EMAIL + "/python.pgm"))
    assert pgm.shape == (16, 16)
    assert int(pgm.astype(np.int64).sum()) == 25193


@pytest.mark.parametrize(
    "name,size,interlaced,checksum",
    [
        # two REAL interlaced GIFs (the only offline interlaced corpus)
        ("folder.gif", (15, 13), True, 87177),
        ("openfolder.gif", (16, 13), True, 76800),
        ("idle_48.gif", (48, 48), False, 1009702),
        ("tk.gif", (14, 11), False, 15810),
    ],
)
def test_external_gif_decodes(name, size, interlaced, checksum):
    from streams_spark.functions.gif import gif_composite, gif_decode

    gif = gif_decode(_need(_ICONS + "/" + name))
    assert (gif.width, gif.height) == size
    assert gif.frames[0].interlaced is interlaced
    canvas = gif_composite(gif)
    assert int(canvas.astype(np.int64).sum()) == checksum


def test_external_gif87a_banner():
    from streams_spark.functions.gif import gif_composite, gif_decode

    path = (
        "/root/.pyenv/versions/3.7.16/lib/python3.7/test/test_email/"
        "data/PyBanner048.gif"
    )
    gif = gif_decode(_need(path))
    assert gif.version == b"87a" and (gif.width, gif.height) == (150, 35)
    assert int(gif_composite(gif).astype(np.int64).sum()) == 2635070


# ---------------------------------------------------------------------------
# Audio container matrix: pluck-pcm{8,16,24,32} exist as WAV, AU, and
# AIFF — the same recording, independently packaged (and for some
# widths independently requantized). pluck-ulaw/-alaw are its G.711
# companded variants. Exact equalities and tight bounds below are
# empirically pinned external ground truth.
# ---------------------------------------------------------------------------


def test_external_au_aiff_wav_pcm_matrix():
    from streams_spark.functions.au_aiff import aiff_decode, au_decode
    from streams_spark.functions.codecs import wav_decode

    A = _PY_TEST + "/audiodata"
    w16 = np.asarray(
        wav_decode(_need(A + "/pluck-pcm16.wav"))[0], dtype=np.int64
    ).ravel()

    au = {}
    af = {}
    for bits in (8, 16, 24, 32):
        s, rate, ch = au_decode(_need(f"{A}/pluck-pcm{bits}.au"))
        assert (rate, ch) == (11025, 2) and len(s) == 6614
        au[bits] = s.astype(np.int64)
        s2, rate2, ch2, b2 = aiff_decode(_need(f"{A}/pluck-pcm{bits}.aiff"))
        assert (rate2, ch2, b2) == (11025, 2, bits) and len(s2) == 6614
        af[bits] = s2.astype(np.int64)

    # exact cross-container equality at 24 bits (byte order / sign
    # extension cannot be wrong in either decoder); the 8-bit files
    # were independently dithered, so they agree only to +-1 LSB
    assert (au[24] == af[24]).all()
    w8 = np.asarray(
        wav_decode(_need(A + "/pluck-pcm8.wav"))[0], dtype=np.int64
    ).ravel()
    assert np.abs(au[8] - af[8]).max() <= 1
    assert np.abs(au[8] - w8).max() <= 1

    # independently requantized variants of the same master: tight bounds
    assert np.abs(au[16] - w16).max() <= 16
    assert np.abs(af[16] - w16).max() <= 16
    assert np.abs((au[24] >> 8) - w16).max() <= 8
    assert np.abs((au[32] >> 16) - (au[24] >> 8)).max() <= 1
    assert int(au[16].sum()) == -463537  # pinned external ground truth


def test_external_g711_companded_family():
    from streams_spark.functions.au_aiff import aiff_decode, au_decode
    from streams_spark.functions.codecs import wav_decode

    A = _PY_TEST + "/audiodata"
    w16 = np.asarray(
        wav_decode(_need(A + "/pluck-pcm16.wav"))[0], dtype=np.int64
    ).ravel()
    u_au, rate, ch = au_decode(_need(A + "/pluck-ulaw.au"))
    assert (rate, ch) == (11025, 2)
    u_af = aiff_decode(_need(A + "/pluck-ulaw.aifc"))[0]
    a_af = aiff_decode(_need(A + "/pluck-alaw.aifc"))[0]

    # mu-law decoded against the uncompanded master: error bounded by
    # one top-segment quantization step (the files were companded from
    # slightly different masters, hence not half-step)
    assert np.abs(u_au.astype(np.int64) - w16).max() <= 1024
    assert np.abs(u_af.astype(np.int64) - w16).max() <= 1024
    assert np.abs(a_af.astype(np.int64) - w16).max() <= 1024
    # the two independently companded mu-law packagings agree within
    # one reconstruction level of each other
    assert np.abs(u_au.astype(np.int64) - u_af.astype(np.int64)).max() <= 512


def test_external_sndhdr_au_is_full_scale_ulaw_speech():
    from streams_spark.functions.au_aiff import au_decode

    s, rate, ch = au_decode(_need(_EMAIL + "/sndhdr.au"))
    assert (rate, ch) == (8012, 1) and len(s) == 28110
    # full-scale mu-law hit: the recording engages the top segment
    assert int(np.abs(s).max()) == 32124
    assert int(s.astype(np.int64).sum()) == 14778128


def test_external_sndhdr_aiff_aifc_headers():
    from streams_spark.functions.au_aiff import aiff_decode

    for name in ("sndhdr.aiff", "sndhdr.aifc"):
        s, rate, ch, bits = aiff_decode(_need(_EMAIL + "/" + name))
        assert (rate, ch, bits) == (44100, 2, 16)
        assert len(s) == 10 and (s == 0).all()
