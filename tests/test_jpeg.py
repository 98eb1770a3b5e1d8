"""Baseline JPEG codec (functions/jpeg.py): exact block-constant round
trips (the m_jpeg_real oracle contract), bounded lossy error in the
general case, decoding of HAND-ASSEMBLED spec-derived byte streams
(independent of the encoder), restart markers, and rejection of
unsupported stream classes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from streams_spark.functions import jpeg as J
from streams_spark.functions.codecs import CHECKSUM_MOD, media_probe


def _block_constant(h: int, w: int, block: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    nby, nbx = (h + block - 1) // block, (w + block - 1) // block
    bv = (2 * rng.integers(0, 128, size=(nby, nbx))).astype(np.uint8)
    return np.repeat(np.repeat(bv, block, axis=0), block, axis=1)[:h, :w]


@pytest.mark.parametrize("shape", [(8, 8), (24, 16), (19, 29), (40, 33)])
def test_grey_block_constant_roundtrip_exact(shape):
    h, w = shape
    img = _block_constant(h, w, 8, seed=h * 100 + w)
    out = J.jpeg_decode(J.jpeg_encode(img, quality=50))
    assert out.shape == (h, w)
    assert np.array_equal(out, img)


@pytest.mark.parametrize("sub,block", [("4:4:4", 8), ("4:2:0", 16)])
@pytest.mark.parametrize("shape", [(16, 16), (32, 48), (23, 37)])
def test_rgb_block_constant_roundtrip_exact(sub, block, shape):
    h, w = shape
    grey = _block_constant(h, w, block, seed=h + w)
    img = np.stack([grey] * 3, axis=2)
    out = J.jpeg_decode(J.jpeg_encode(img, quality=50, subsampling=sub))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, img)


def test_lossy_roundtrip_bounded_error_on_smooth_images():
    y, x = np.mgrid[0:32, 0:32]
    grey = (x * 4 + y * 3 + 20).clip(0, 255).astype(np.uint8)
    out = J.jpeg_decode(J.jpeg_encode(grey, quality=90))
    assert int(np.abs(out.astype(int) - grey.astype(int)).max()) <= 8
    rgb = np.stack(
        [(x * 4 + 20), (y * 4 + 20), ((x + y) * 2 + 50)], axis=2
    ).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        out = J.jpeg_decode(J.jpeg_encode(rgb, quality=90, subsampling=sub))
        assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 10


def test_noise_decodes_and_quality_orders_error():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 24)).astype(np.uint8)
    errs = []
    for q in (10, 50, 95):
        out = J.jpeg_decode(J.jpeg_encode(img, quality=q))
        errs.append(float(np.abs(out.astype(int) - img.astype(int)).mean()))
    assert errs[0] > errs[1] > errs[2]


def _std_headers(h: int, w: int) -> bytearray:
    """SOI + DQT(q50 luma) + SOF0(1 comp) + std luma DHTs + SOS."""
    qt = J._quality_scale(J.QUANT_LUMA, 50)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(int(v) for v in qt.flatten()[J.ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    for tc_th, (bits, values) in [(0x00, J._DC_LUMA), (0x10, J._AC_LUMA)]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    return out


def test_decodes_hand_assembled_spec_bytes():
    # Built bit-by-bit from T.81, never touching the encoder: one 8x8
    # block of constant 130. DC diff = round(8*(130-128)/16) = 1 ->
    # category 1 = code 010 + value bit 1, then EOB = 1010: 0x5A.
    out = _std_headers(8, 8)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
    out += b"\x00\x3f\x00" + bytes([0x5A]) + b"\xff\xd9"
    dec = J.jpeg_decode(bytes(out))
    assert np.array_equal(dec, np.full((8, 8), 130, np.uint8))


def test_decodes_restart_markers_with_dc_reset():
    # Two MCUs, DRI=1: the same 0x5A byte decodes to 130 in BOTH blocks
    # only if the DC predictor resets at RST0.
    out = _std_headers(8, 16)
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)
    sof_at = bytes(out).find(b"\xff\xc0")
    out = bytearray(bytes(out)[:sof_at] + dri + bytes(out)[sof_at:])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
    out += b"\x00\x3f\x00"
    out += bytes([0x5A]) + b"\xff\xd0" + bytes([0x5A]) + b"\xff\xd9"
    dec = J.jpeg_decode(bytes(out))
    assert dec.shape == (8, 16)
    assert np.all(dec == 130)


def test_rejects_progressive_and_foreign_bytes():
    img = _block_constant(8, 8, 8, seed=1)
    good = J.jpeg_encode(img)
    assert good[:2] == b"\xff\xd8"
    with pytest.raises(ValueError):
        J.jpeg_decode(b"\x89PNG\r\n\x1a\nnope")
    progressive = bytearray(good)
    sof = progressive.find(b"\xff\xc0")
    progressive[sof + 1] = 0xC2  # SOF0 -> SOF2
    with pytest.raises(ValueError):
        J.jpeg_decode(bytes(progressive))


def test_encoder_validates_inputs():
    with pytest.raises(ValueError):
        J.jpeg_encode(np.zeros((4, 4), dtype=np.int32))
    with pytest.raises(ValueError):
        J.jpeg_encode(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        J.jpeg_encode(np.zeros((4, 4), dtype=np.uint8), quality=0)
    with pytest.raises(ValueError):
        J.jpeg_encode(
            np.zeros((4, 4, 3), dtype=np.uint8), subsampling="4:2:2"
        )
    with pytest.raises(ValueError):
        J.jpeg_encode(np.zeros((0, 4), dtype=np.uint8))


def test_media_probe_routes_jpeg_checksum_over_decoded_pixels():
    img = _block_constant(19, 26, 8, seed=9)
    w, h, ch, csum = media_probe(J.jpeg_encode(img, quality=50))
    assert (w, h, ch) == (26, 19, 1)
    assert csum == int(img.astype(np.int64).sum()) % CHECKSUM_MOD
    rgb = np.stack([img] * 3, axis=2)
    w, h, ch, csum = media_probe(
        J.jpeg_encode(rgb, quality=50, subsampling="4:2:0")
    )
    assert (w, h, ch) == (26, 19, 3)
    assert csum == 3 * int(img.astype(np.int64).sum()) % CHECKSUM_MOD


# --- property-based coverage (no Spark jobs: pure codec laws) ---

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    block=st.sampled_from([8, 16]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    color=st.booleans(),
)
def test_property_block_constant_roundtrip_exact(h, w, block, seed, color):
    """The oracle contract, for EVERY geometry: block-constant
    even-valued images round-trip bit-exactly at quality 50 (grey and
    grey-valued RGB, both subsampling modes)."""
    img = _block_constant(h, w, block, seed)
    if color:
        rgb = np.stack([img] * 3, axis=2)
        sub = "4:2:0" if block == 16 else "4:4:4"
        out = J.jpeg_decode(J.jpeg_encode(rgb, quality=50, subsampling=sub))
        assert np.array_equal(out, rgb)
    else:
        out = J.jpeg_decode(J.jpeg_encode(img, quality=50))
        assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=32),
    w=st.integers(min_value=1, max_value=32),
    q=st.integers(min_value=5, max_value=95),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_property_arbitrary_image_decodes_in_range(h, w, q, seed):
    """Any uint8 image at any quality must decode without error to the
    stated geometry with in-range pixels — the no-crash/no-garbage law
    a quarantine pipeline relies on."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = J.jpeg_decode(J.jpeg_encode(img, quality=q))
    assert out.shape == (h, w)
    assert out.dtype == np.uint8
