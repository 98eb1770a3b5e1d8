"""Unit tests for Sun AU / AIFF / AIFF-C and G.711 companding
(functions/au_aiff.py). External pluck-corpus pins live in
test_interop.py; these cover closed-form law properties, container
round-trips, the 80-bit extended float, and loud errors."""

import struct

import numpy as np
import pytest

from streams_spark.functions.au_aiff import (
    AudioError,
    aiff_decode,
    aiff_encode,
    alaw_compress,
    alaw_expand,
    au_decode,
    au_encode,
    ext80_decode,
    ext80_encode,
    ulaw_compress,
    ulaw_expand,
)

ALL_CODES = np.arange(256, dtype=np.uint8)


# ---------------------------------------------------------------------------
# G.711
# ---------------------------------------------------------------------------


def test_ulaw_code_round_trip():
    rt = ulaw_compress(ulaw_expand(ALL_CODES))
    bad = np.where(rt != ALL_CODES)[0]
    # the single legal exception: negative zero (0x7F) re-compresses to
    # positive zero (0xFF) — both decode to 0
    assert list(bad) == [0x7F]
    assert ulaw_expand(np.array([0x7F], np.uint8))[0] == 0
    assert ulaw_expand(np.array([0xFF], np.uint8))[0] == 0


def test_alaw_code_round_trip_exact():
    assert np.array_equal(alaw_compress(alaw_expand(ALL_CODES)), ALL_CODES)


def test_g711_known_extremes_audioop_scale():
    # audioop ulaw2lin/alaw2lin width-2 extreme values
    assert ulaw_expand(np.array([0x00], np.uint8))[0] == -32124
    assert ulaw_expand(np.array([0x80], np.uint8))[0] == 32124
    assert alaw_expand(np.array([0x2A], np.uint8))[0] == -32256
    assert alaw_expand(np.array([0xAA], np.uint8))[0] == 32256
    assert alaw_expand(np.array([0x55], np.uint8))[0] == -8
    assert alaw_expand(np.array([0xD5], np.uint8))[0] == 8


def test_g711_monotone_and_odd_symmetric():
    for expand in (ulaw_expand, alaw_expand):
        vals = expand(ALL_CODES)
        neg = np.sort(vals[vals < 0])
        pos = np.sort(vals[vals > 0])
        assert len(np.unique(neg)) == len(neg)
        assert len(np.unique(pos)) == len(pos)
        # symmetric law: the positive and negative levels mirror
        assert np.array_equal(pos, -neg[::-1])


def test_g711_compression_error_bounded():
    rng = np.random.default_rng(0)
    s = rng.integers(-32000, 32000, 5000).astype(np.int32)
    for comp, exp, bound in (
        (ulaw_compress, ulaw_expand, 1024),  # max mu-law step at top segment
        (alaw_compress, alaw_expand, 1024),
    ):
        err = np.abs(exp(comp(s)) - s)
        assert int(err.max()) <= bound


# ---------------------------------------------------------------------------
# 80-bit extended float
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rate", [8000, 8012, 11025, 16000, 22050, 44100, 48000])
def test_ext80_round_trip_common_rates(rate):
    assert ext80_decode(ext80_encode(float(rate))) == rate


def test_ext80_known_bytes():
    # 44100 encodes as 0x400E AC44... (the canonical AIFF constant)
    assert ext80_encode(44100.0)[:4] == b"\x40\x0e\xac\x44"
    assert ext80_decode(b"\x40\x0e\xac\x44\x00\x00\x00\x00\x00\x00") == 44100.0
    assert ext80_decode(b"\x00" * 10) == 0.0
    with pytest.raises(AudioError):
        ext80_decode(b"\x7f\xff" + b"\x00" * 8)  # inf/nan


# ---------------------------------------------------------------------------
# AU container
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("encoding,width", [(2, 1), (3, 2), (4, 3), (5, 4)])
def test_au_pcm_round_trip(encoding, width):
    rng = np.random.default_rng(encoding)
    lim = 1 << (8 * width - 1)
    s = rng.integers(-lim, lim, 777).astype(np.int32)
    out, rate, ch = au_decode(au_encode(s, 16000, 2, encoding, b"note"))
    assert rate == 16000 and ch == 2
    assert np.array_equal(out, s)


@pytest.mark.parametrize("encoding", [1, 27])
def test_au_companded_round_trip(encoding):
    expand = ulaw_expand if encoding == 1 else alaw_expand
    s = expand(ALL_CODES)  # exact code points -> lossless round trip
    out, rate, ch = au_decode(au_encode(s, 8000, 1, encoding))
    assert np.array_equal(out, s)


def test_au_unknown_size_convention_and_errors():
    s = np.arange(-50, 50, dtype=np.int32)
    raw = bytearray(au_encode(s, 8000, 1, 3))
    struct.pack_into(">I", raw, 8, 0xFFFFFFFF)  # size = unknown
    out, _, _ = au_decode(bytes(raw))
    assert np.array_equal(out, s)
    with pytest.raises(AudioError):
        au_decode(b"NOPE" + bytes(raw[4:]))
    bad = bytearray(raw)
    struct.pack_into(">I", bad, 12, 6)  # encoding 6 (float) unsupported
    with pytest.raises(AudioError):
        au_decode(bytes(bad))
    with pytest.raises(AudioError):
        au_decode(au_encode(s, 8000, 1, 3)[:-20])  # truncated, known size


# ---------------------------------------------------------------------------
# AIFF container
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_aiff_pcm_round_trip(bits):
    rng = np.random.default_rng(bits)
    lim = 1 << (bits - 1)
    s = rng.integers(-lim, lim, 321).astype(np.int32)
    out, rate, ch, obits = aiff_decode(aiff_encode(s, 22050, 1, bits))
    assert (rate, ch, obits) == (22050, 1, bits)
    assert np.array_equal(out, s)


def test_aifc_sowt_and_companded():
    s = ulaw_expand(ALL_CODES)
    # hand-build AIFC: COMM with compression fourcc + pascal name
    def aifc(comp_id, raw, bits):
        comm = struct.pack(">hIh", 1, len(raw), bits) + ext80_encode(8000.0)
        comm += comp_id + b"\x04none"
        if len(comm) & 1:
            comm += b"\x00"
        ssnd = struct.pack(">II", 0, 0) + raw
        body = b"AIFC"
        body += b"COMM" + struct.pack(">I", len(comm)) + comm
        body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        if len(ssnd) & 1:
            body += b"\x00"
        return b"FORM" + struct.pack(">I", len(body)) + body

    out, rate, ch, bits = aiff_decode(
        aifc(b"ulaw", ulaw_compress(s).tobytes(), 16)
    )
    assert np.array_equal(out, s) and bits == 16
    out_a, *_ = aiff_decode(
        aifc(b"alaw", alaw_compress(alaw_expand(ALL_CODES)).tobytes(), 16)
    )
    assert np.array_equal(out_a, alaw_expand(ALL_CODES))
    le = np.array([-300, 5, 3000], dtype=np.int32)
    out_s, *_ = aiff_decode(aifc(b"sowt", le.astype("<i2").tobytes(), 16))
    assert np.array_equal(out_s, le)
    with pytest.raises(AudioError):
        aiff_decode(aifc(b"ima4", b"\x00" * 8, 16))


def test_aiff_ssnd_offset_and_odd_chunk_padding():
    s = np.arange(-5, 6, dtype=np.int32)
    raw = s.astype(">i2").tobytes()
    comm = struct.pack(">hIh", 1, len(s), 16) + ext80_encode(8000.0)
    # a COMT chunk with odd length before COMM exercises word alignment
    comt = b"xyz"
    ssnd = struct.pack(">II", 4, 0) + b"\xde\xad\xbe\xef" + raw
    body = b"AIFF"
    body += b"COMT" + struct.pack(">I", len(comt)) + comt + b"\x00"
    body += b"COMM" + struct.pack(">I", len(comm)) + comm
    body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    data = b"FORM" + struct.pack(">I", len(body)) + body
    out, rate, ch, bits = aiff_decode(data)
    assert np.array_equal(out, s)


def test_aiff_missing_chunks_raise():
    with pytest.raises(AudioError):
        aiff_decode(b"FORM" + struct.pack(">I", 4) + b"AIFF")
    with pytest.raises(AudioError):
        aiff_decode(b"RIFF" + b"\x00" * 20)
