"""AAC ADTS (ISO/IEC 14496-3, 1.A.2.2) elementary-stream framing —
stdlib only.

The audio sibling of functions/mp3.py: a scanner that walks REAL ADTS
frame headers (12-bit syncword, layer 00, sampling-frequency index,
channel configuration, 13-bit aac_frame_length, optional CRC, raw-data
-block count) and a census over genuinely framed bytes — frame count,
sample rate, total samples (1024 per raw data block), CRC/multi-block
frame counts, junk and ID3 bytes. Like the MP3 scanner it skips ID3v2
tags (syncsafe size via mp3.id3v2_size) and resyncs past junk with
next-frame validation: a sync candidate counts only when the frame it
implies is followed by EOF or another valid header, so payload bytes
that happen to contain 0xFFF never masquerade as frames.

Decode posture: identical to mp3.py / mp4.py — the census never
pretends to decode; a PCM decoder plugs in downstream via the same
``decode_fn=`` contract. Reference parity anchor: consumer-side decode
of opaque payloads (/root/reference/server/messages.go:65).

The companion ``adts_build`` muxer exists for fixtures: it emits valid
headers with controlled junk/ID3/CRC/multi-block structure and a
deliberately 0xFF-free payload filler (the mp3 TAG-coincidence lesson:
fixture fillers must not collide with structural markers the scanner
keys on; in-payload false syncs are pytest territory, not fixture
territory).
"""

from __future__ import annotations

from typing import NamedTuple

from streams_spark.functions.mp3 import id3v2_size

# Table 1.A.8: sampling_frequency_index -> rate (13 valid entries)
ADTS_RATES = [
    96000, 88200, 64000, 48000, 44100, 32000, 24000,
    22050, 16000, 12000, 11025, 8000, 7350,
]

_HDR = 7  # ADTS fixed+variable header bytes (protection_absent=1)


class AdtsFrame(NamedTuple):
    offset: int
    size: int  # aac_frame_length: header + (crc) + raw data
    sample_rate: int
    channels: int
    blocks: int  # raw_data_blocks (1024 samples each)
    crc: bool


class AdtsScan(NamedTuple):
    frames: list[AdtsFrame]
    junk_bytes: int
    id3_bytes: int


def _parse_header_syntax(buf: bytes, pos: int) -> AdtsFrame | None:
    """Syntactic header parse at pos (the follower check is header-only
    DELIBERATELY, like mp3._walk_frames: a final frame truncated
    mid-body still vouches for its intact predecessor and itself
    degrades to junk). Does NOT require the frame body to fit."""
    if pos + _HDR > len(buf):
        return None
    b = buf[pos : pos + _HDR]
    if b[0] != 0xFF or (b[1] & 0xF0) != 0xF0:
        return None
    if (b[1] & 0x06) != 0:  # layer must be 00
        return None
    protection_absent = b[1] & 0x01
    sfi = (b[2] >> 2) & 0x0F
    if sfi >= len(ADTS_RATES):  # 13..15 reserved
        return None
    channels = ((b[2] & 0x01) << 2) | (b[3] >> 6)
    if channels == 0:  # PCE-in-payload configs out of scope
        return None
    size = ((b[3] & 0x03) << 11) | (b[4] << 3) | (b[5] >> 5)
    crc = not protection_absent
    min_size = _HDR + (2 if crc else 0)
    if size < min_size:
        return None
    blocks = (b[6] & 0x03) + 1
    if crc and blocks > 1:
        # multi-block CRC frames interleave per-block positions in the
        # error-check payload (1.A.2.2.1) — out of scope, reject the
        # candidate rather than miscount samples
        return None
    return AdtsFrame(
        pos, size, ADTS_RATES[sfi], channels, blocks, crc
    )


def _parse_header(buf: bytes, pos: int) -> AdtsFrame | None:
    """Full-frame validity: syntactic header AND the body fits."""
    fr = _parse_header_syntax(buf, pos)
    if fr is None or pos + fr.size > len(buf):
        return None
    return fr


def adts_scan(buf: bytes) -> AdtsScan:
    """Walk an ADTS elementary stream: skip a leading ID3v2 tag,
    resync past junk (a candidate frame counts only when followed by
    EOF or another valid header), hop frame-to-frame by
    aac_frame_length."""
    id3 = id3v2_size(buf)
    pos = id3
    frames: list[AdtsFrame] = []
    junk = 0
    n = len(buf)
    while pos < n:
        fr = _parse_header(buf, pos)
        if fr is not None:
            nxt = pos + fr.size
            if nxt == n or _parse_header_syntax(buf, nxt) is not None:
                frames.append(fr)
                pos = nxt
                continue
        junk += 1
        pos += 1
    return AdtsScan(frames, junk, id3)


# ---------------------------------------------------------------------------
# Fixture muxer
# ---------------------------------------------------------------------------


def adts_header(
    size: int, sfi: int, channels: int, blocks: int = 1, crc: bool = False
) -> bytes:
    """One ADTS header (MPEG-4 ID, AAC-LC profile, VBR fullness)."""
    if not 0 <= sfi < len(ADTS_RATES):
        raise ValueError("bad sampling_frequency_index")
    if not 0 < size < (1 << 13):
        raise ValueError("aac_frame_length out of range")
    if crc and blocks > 1:
        # The scanner documents multi-block CRC frames as out of scope
        # (per-block CRC positions, 1.A.2.2.1) and rejects them on
        # parse — so emitting one from the fixture muxer would silently
        # degrade everything after it to junk until resync. Fail at
        # build time instead.
        raise ValueError("multi-block CRC frames are out of scope")
    b = bytearray(7)
    b[0] = 0xFF
    b[1] = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc else 1)
    b[2] = (0x01 << 6) | (sfi << 2) | ((channels >> 2) & 0x01)
    b[3] = ((channels & 0x03) << 6) | ((size >> 11) & 0x03)
    b[4] = (size >> 3) & 0xFF
    b[5] = ((size & 0x07) << 5) | 0x1F  # fullness hi
    b[6] = (0x3F << 2) | (blocks - 1)  # fullness lo + block count
    return bytes(b)


def _filler(n: int, seed: int) -> bytes:
    """Deterministic payload bytes that never contain 0xFF (no false
    syncs by construction — see module docstring)."""
    out = bytearray(n)
    x = (seed * 2654435761 + 12345) & 0xFFFFFFFF
    for i in range(n):
        x = (1103515245 * x + 12345) & 0x7FFFFFFF
        out[i] = (x >> 16) % 255  # 0..254
    return bytes(out)


def adts_build(
    frames: list[tuple[int, int, bool]],
    sfi: int,
    channels: int,
    lead_junk: int = 0,
    trail_junk: int = 0,
    id3_size: int = 0,
    seed: int = 0,
) -> bytes:
    """A full ADTS stream: optional ID3v2 tag (`id3_size` includes the
    10-byte header), junk, then frames given as (payload_len, blocks,
    crc) triples."""
    out = bytearray()
    if id3_size:
        if id3_size < 10:
            raise ValueError("ID3v2 tag is at least 10 bytes")
        body = id3_size - 10
        out += b"ID3\x04\x00\x00" + bytes(
            [(body >> 21) & 0x7F, (body >> 14) & 0x7F,
             (body >> 7) & 0x7F, body & 0x7F]
        )
        out += _filler(body, seed ^ 0x1D3)
    out += _filler(lead_junk, seed ^ 0xA5)
    for i, (payload, blocks, crc) in enumerate(frames):
        size = _HDR + (2 if crc else 0) + payload
        out += adts_header(size, sfi, channels, blocks, crc)
        if crc:
            out += b"\x00\x00"  # CRC placeholder (not validated here)
        out += _filler(payload, seed + 31 * i)
    out += _filler(trail_junk, seed ^ 0x77)
    return bytes(out)
