"""Sun AU (.snd) and AIFF/AIFF-C audio containers + ITU-T G.711
companding — stdlib + numpy only.

Closes the audio-container matrix around the existing WAV codec
(functions/codecs.py): the same PCM samples packaged as WAV, AU, and
AIFF must decode to identical arrays, and CPython's real test corpus
proves it — ``pluck-pcm{8,16,24,32}.{wav,au,aiff}`` are the SAME
recording in all three containers, and ``pluck-ulaw.au`` /
``pluck-ulaw.aifc`` / ``pluck-alaw.aifc`` are its G.711-companded
variants (tests/test_interop.py pins the cross-container equalities
and the companding error bound against the already-verified WAV
decode).

- **AU**: big-endian header (magic ``.snd``, data offset/size,
  encoding, rate, channels, annotation). Encodings 1 (G.711 mu-law),
  2 (8-bit linear signed), 3/4/5 (16/24/32-bit big-endian PCM), and
  27 (G.711 A-law). Everything else raises.
- **AIFF/AIFF-C**: IFF FORM chunks, COMM with the 80-bit extended
  sample rate, SSND offset/blockSize, big-endian PCM at 8/16/24/32
  bits; AIFC compression types ``NONE``, ``sowt`` (little-endian
  PCM), ``ulaw``, ``alaw``.
- **G.711**: mu-law/A-law expand + compress in closed form (the
  segmented companding laws, not tables-from-elsewhere); expanded
  values are scaled to int16 exactly like CPython's audioop
  (mu-law magnitude << 2, A-law magnitude << 3), which is the scaling
  the external fixtures were produced with.

All decoders return ``(samples, rate, channels)`` where samples is an
int32 numpy array of interleaved frames scaled to the container's
native integer range (int16 range for companded encodings). Reference
parity anchor: consumer-side decode of opaque payloads
(/root/reference/server/messages.go:65).
"""

from __future__ import annotations

import struct

import numpy as np


class AudioError(ValueError):
    """Raised for malformed or out-of-scope audio payloads."""


# ---------------------------------------------------------------------------
# G.711 companding (closed-form segmented laws)
# ---------------------------------------------------------------------------


def ulaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> int16 (audioop ``ulaw2lin`` width-2 scale:
    the segmented law evaluated directly in the 16-bit domain, max
    magnitude 32124)."""
    c = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32)
    sign = c & 0x80
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84  # 0..32124
    return np.where(sign != 0, -mag, mag).astype(np.int32)


def ulaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 -> G.711 mu-law byte (exact inverse of ulaw_expand:
    compress(expand(c)) == c for all 256 codes)."""
    s = np.asarray(samples, dtype=np.int32)
    sign = np.where(s < 0, 0x80, 0)
    biased = np.minimum(np.abs(s), 32635) + 0x84
    # exponent: bit_length(biased) - 8, clamped to [0, 7]
    exp = np.zeros_like(biased)
    for e in range(1, 8):
        exp = np.where(biased >= (0x100 << (e - 1)), e, exp)
    mant = np.clip(((biased >> exp) - 0x84) >> 3, 0, 15)
    return (~(sign | (exp << 4) | mant)).astype(np.uint8)


def alaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law byte -> int16 (audioop ``alaw2lin`` width-2 scale,
    max magnitude 32256; after ^0x55 a SET sign bit means positive)."""
    c = (np.asarray(codes, dtype=np.uint8) ^ 0x55).astype(np.int32)
    sign = c & 0x80
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(exp - 1, 0),
    )
    return np.where(sign != 0, mag, -mag).astype(np.int32)


def alaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 -> G.711 A-law byte (exact inverse of alaw_expand:
    compress(expand(c)) == c for all 256 codes)."""
    s = np.asarray(samples, dtype=np.int32)
    sign = np.where(s >= 0, 0x80, 0)
    mag = np.minimum(np.abs(s), 0x7EFF)
    # seg 0: mag = (mant<<4)+8 < 0x100; seg e>=1: ((mant<<4)+0x108)<<(e-1)
    exp = np.zeros_like(mag)
    for e in range(1, 8):
        exp = np.where(mag >= (0x100 << (e - 1)), e, exp)
    mant = np.where(
        exp == 0,
        np.clip((mag - 8) >> 4, 0, 15),
        np.clip(((mag >> np.maximum(exp - 1, 0)) - 0x108) >> 4, 0, 15),
    )
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


# ---------------------------------------------------------------------------
# PCM helpers (big-endian widths 1/2/3/4)
# ---------------------------------------------------------------------------


def _pcm_be_decode(raw: bytes, width: int) -> np.ndarray:
    if width in (2, 4):
        dt = ">i2" if width == 2 else ">i4"
        return np.frombuffer(raw, dtype=dt).astype(np.int32)
    if width == 1:
        return np.frombuffer(raw, dtype=np.int8).astype(np.int32)
    if width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        val = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        return np.where(val >= 1 << 23, val - (1 << 24), val)
    raise AudioError(f"unsupported PCM width {width}")


def _pcm_be_encode(samples: np.ndarray, width: int) -> bytes:
    s = np.asarray(samples, dtype=np.int32)
    if width == 2:
        return s.astype(">i2").tobytes()
    if width == 4:
        return s.astype(">i4").tobytes()
    if width == 1:
        return s.astype(np.int8).tobytes()
    if width == 3:
        u = np.where(s < 0, s + (1 << 24), s).astype(np.uint32)
        out = np.empty((len(s), 3), dtype=np.uint8)
        out[:, 0] = (u >> 16) & 0xFF
        out[:, 1] = (u >> 8) & 0xFF
        out[:, 2] = u & 0xFF
        return out.tobytes()
    raise AudioError(f"unsupported PCM width {width}")


# ---------------------------------------------------------------------------
# Sun AU
# ---------------------------------------------------------------------------

_AU_PCM_WIDTH = {2: 1, 3: 2, 4: 3, 5: 4}


def au_decode(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a Sun AU file -> (samples int32, rate, channels)."""
    if data[:4] != b".snd":
        raise AudioError("au: bad magic")
    offset, size, enc, rate, channels = struct.unpack_from(">5I", data, 4)
    if offset < 24 or channels < 1:
        raise AudioError("au: bad header")
    if size == 0xFFFFFFFF:  # unknown-length convention
        raw = data[offset:]
    else:
        raw = data[offset : offset + size]
        if len(raw) < size:
            raise AudioError("au: truncated data")
    if enc == 1:
        samples = ulaw_expand(np.frombuffer(raw, dtype=np.uint8))
    elif enc == 27:
        samples = alaw_expand(np.frombuffer(raw, dtype=np.uint8))
    elif enc in _AU_PCM_WIDTH:
        width = _AU_PCM_WIDTH[enc]
        samples = _pcm_be_decode(raw[: len(raw) - len(raw) % width], width)
    else:
        raise AudioError(f"au: unsupported encoding {enc}")
    return samples, rate, channels


def au_encode(
    samples: np.ndarray, rate: int, channels: int = 1,
    encoding: int = 3, annotation: bytes = b"",
) -> bytes:
    """Encode int32 samples as AU (encodings 1/2/3/4/5/27)."""
    if encoding == 1:
        raw = ulaw_compress(samples).tobytes()
    elif encoding == 27:
        raw = alaw_compress(samples).tobytes()
    elif encoding in _AU_PCM_WIDTH:
        raw = _pcm_be_encode(samples, _AU_PCM_WIDTH[encoding])
    else:
        raise AudioError(f"au: unsupported encoding {encoding}")
    ann = annotation + b"\x00" * ((4 - len(annotation) % 4) % 4 or 4)
    header = b".snd" + struct.pack(
        ">5I", 24 + len(ann), len(raw), encoding, rate, channels
    )
    return header + ann + raw


# ---------------------------------------------------------------------------
# 80-bit IEEE 754 extended float (AIFF sample rate)
# ---------------------------------------------------------------------------


def ext80_decode(raw: bytes) -> float:
    if len(raw) != 10:
        raise AudioError("aiff: extended float must be 10 bytes")
    se, = struct.unpack(">H", raw[:2])
    mant, = struct.unpack(">Q", raw[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise AudioError("aiff: inf/nan sample rate")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def ext80_encode(value: float) -> bytes:
    if value == 0:
        return b"\x00" * 10
    sign = 0x8000 if value < 0 else 0
    value = abs(value)
    exp = 16383 + 63
    mant = int(value)
    frac = value - mant
    # normalize integer part into a 64-bit mantissa with top bit set
    while mant >= 1 << 64:
        mant >>= 1
        exp += 1
    while mant < 1 << 63:
        mant <<= 1
        frac *= 2
        add = int(frac)
        mant |= add
        frac -= add
        exp -= 1
    return struct.pack(">H", sign | exp) + struct.pack(">Q", mant)


# ---------------------------------------------------------------------------
# AIFF / AIFF-C
# ---------------------------------------------------------------------------


def aiff_decode(data: bytes) -> tuple[np.ndarray, int, int, int]:
    """Decode AIFF/AIFC -> (samples int32, rate, channels, bits).

    Companded AIFC streams (ulaw/alaw) report bits=16 (expanded scale).
    """
    if data[:4] != b"FORM":
        raise AudioError("aiff: bad FORM magic")
    form_type = data[8:12]
    if form_type not in (b"AIFF", b"AIFC"):
        raise AudioError(f"aiff: bad form type {form_type!r}")
    pos = 12
    end = min(len(data), 8 + struct.unpack(">I", data[4:8])[0])
    comm = None
    ssnd = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        clen, = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise AudioError("aiff: missing COMM or SSND chunk")
    channels, _nframes = struct.unpack(">hI", comm[:6])
    bits, = struct.unpack(">h", comm[6:8])
    rate = ext80_decode(comm[8:18])
    compression = b"NONE"
    if form_type == b"AIFC":
        if len(comm) < 22:
            raise AudioError("aifc: COMM missing compression type")
        compression = comm[18:22]
    off, _block = struct.unpack(">II", ssnd[:8])
    raw = ssnd[8 + off :]
    if compression == b"NONE":
        width = (bits + 7) // 8
        if width not in (1, 2, 3, 4):
            raise AudioError(f"aiff: unsupported sample size {bits}")
        samples = _pcm_be_decode(raw[: len(raw) - len(raw) % width], width)
    elif compression == b"sowt":
        if bits != 16:
            raise AudioError("aifc: sowt only supported at 16 bits")
        samples = np.frombuffer(
            raw[: len(raw) & ~1], dtype="<i2"
        ).astype(np.int32)
    elif compression in (b"ulaw", b"ULAW"):
        samples = ulaw_expand(np.frombuffer(raw, dtype=np.uint8))
        bits = 16
    elif compression in (b"alaw", b"ALAW"):
        samples = alaw_expand(np.frombuffer(raw, dtype=np.uint8))
        bits = 16
    else:
        raise AudioError(f"aifc: unsupported compression {compression!r}")
    return samples, int(round(rate)), channels, bits


def aiff_encode(
    samples: np.ndarray, rate: int, channels: int = 1, bits: int = 16,
) -> bytes:
    """Encode int32 samples as plain big-endian PCM AIFF."""
    width = (bits + 7) // 8
    raw = _pcm_be_encode(samples, width)
    n_frames = len(samples) // channels
    comm = struct.pack(">hIh", channels, n_frames, bits) + ext80_encode(float(rate))
    ssnd = struct.pack(">II", 0, 0) + raw
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        chunks += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks
