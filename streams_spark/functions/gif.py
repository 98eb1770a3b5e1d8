"""GIF87a/GIF89a codec (W3C/CompuServe GIF89a specification) —
stdlib + numpy only.

Decoder: logical screen descriptor, global and local color tables,
variable-code-width LZW with CLEAR/EOI semantics and deferred-clear
streams (code width capped at 12), Adam-style 4-pass row interlace,
graphic control extensions (transparency index, disposal methods 0-3,
delay), NETSCAPE looping extension, comment/application extension
skip, and multi-frame animations with sub-rectangle frames.
``gif_composite`` replays disposal semantics to produce the final RGB
canvas — the quantity the encoding-invariant dedup operators key on.

Encoder (fixture-side): emits valid multi-frame GIF89a with controlled
palette size, interlace, transparency, disposal, and local color
tables; its LZW packer resets the table via CLEAR at 4096 entries so
streams of any length decode everywhere.

Like every codec in this package it raises (``GifError``) rather than
silently guessing on malformed input, and decodes REAL externally
produced files — CPython's ``python.gif`` and the IDLE icon set are
pinned against the sibling PPM/BMP ground truth in
tests/test_interop.py. Reference parity anchor: consumer-side decode
of opaque payloads (/root/reference/server/messages.go:65).
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np


class GifError(ValueError):
    """Raised for malformed or out-of-scope GIF payloads."""


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class GifFrame(NamedTuple):
    x: int
    y: int
    indices: np.ndarray          # (h, w) uint8 palette indices
    palette: np.ndarray          # (n, 3) uint8 — local if present else global
    local_palette: bool
    interlaced: bool
    transparent: int | None      # transparency index, or None
    disposal: int                # 0..3 (GIF89a GCE)
    delay_cs: int                # centiseconds


class Gif(NamedTuple):
    width: int
    height: int
    background: int
    global_palette: np.ndarray | None
    frames: list[GifFrame]
    loop_count: int | None       # NETSCAPE 2.0 extension, None if absent
    comments: list[bytes]
    version: bytes               # b"87a" | b"89a"


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    """GIF-flavor LZW: little-endian bit packing, CLEAR/EOI codes,
    code width grows at table fill, capped at 12 (deferred clear)."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"gif: bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total = len(data) * 8
    while bitpos + code_size <= total:
        byte = bitpos >> 3
        code = (
            int.from_bytes(data[byte : byte + 3], "little") >> (bitpos & 7)
        ) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("gif: first LZW code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError("gif: LZW code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        if len(out) >= expect:
            break
    if len(out) < expect:
        raise GifError(f"gif: LZW underrun {len(out)} < {expect}")
    return bytes(out[:expect])


def lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    """Greedy LZW packer; emits CLEAR whenever the table hits 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for px in pixels:
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        next_code += 1
        if next_code > 4095:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = eoi + 1
        w = bytes([px])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def _interlace_order(h: int) -> list[int]:
    return [
        y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
    ]


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise GifError("gif: truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + size])
        if len(chunks[-1]) < size:
            raise GifError("gif: truncated sub-block")
        pos += size


def gif_decode(data: bytes) -> Gif:
    if data[:3] != b"GIF" or data[3:6] not in (b"87a", b"89a"):
        raise GifError("gif: bad magic/version")
    version = data[3:6]
    w, h, flags, background, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    global_pal: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(
            data, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n

    frames: list[GifFrame] = []
    comments: list[bytes] = []
    loop_count: int | None = None
    transparent: int | None = None
    disposal = 0
    delay_cs = 0

    while True:
        if pos >= len(data):
            raise GifError("gif: missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifError("gif: truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise GifError("gif: short graphic control extension")
                disposal = (body[0] >> 2) & 0x07
                delay_cs = struct.unpack_from("<H", body, 1)[0]
                transparent = body[3] if body[0] & 0x01 else None
            elif label == 0xFE:
                comments.append(body)
            elif label == 0xFF and body[:11] == b"NETSCAPE2.0":
                if len(body) >= 14 and body[11] == 1:
                    loop_count = struct.unpack_from("<H", body, 12)[0]
            continue
        if block != 0x2C:
            raise GifError(f"gif: unknown block {block:#x}")
        fx, fy, fw, fh, lflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise GifError("gif: frame rectangle outside logical screen")
        local = bool(lflags & 0x80)
        if local:
            n = 2 << (lflags & 0x07)
            pal = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        elif global_pal is not None:
            pal = global_pal
        else:
            raise GifError("gif: frame without any color table")
        if pos >= len(data):
            raise GifError("gif: missing LZW minimum code size")
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(
            lzw_decode(lzw, min_code, fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        interlaced = bool(lflags & 0x40)
        if interlaced:
            idx = _deinterlace(idx)
        if int(idx.max()) >= len(pal):
            raise GifError("gif: pixel index beyond color table")
        frames.append(
            GifFrame(
                fx, fy, idx, pal, local, interlaced,
                transparent, disposal, delay_cs,
            )
        )
        transparent = None
        disposal = 0
        delay_cs = 0

    if not frames:
        raise GifError("gif: no image data")
    return Gif(w, h, background, global_pal, frames, loop_count, comments, version)


def gif_composite(gif: Gif) -> np.ndarray:
    """Replay frames with disposal semantics onto the logical screen;
    returns the FINAL (h, w, 3) RGB canvas. Pixels never painted by
    any frame read as black (the conventional transparent rendering).
    Disposal: 0/1 leave, 2 restore-to-background (transparent), 3
    restore-to-previous."""
    canvas = np.zeros((gif.height, gif.width, 3), dtype=np.uint8)
    painted = np.zeros((gif.height, gif.width), dtype=bool)
    for fr in gif.frames:
        ys = slice(fr.y, fr.y + fr.indices.shape[0])
        xs = slice(fr.x, fr.x + fr.indices.shape[1])
        before_px = canvas[ys, xs].copy()
        before_mask = painted[ys, xs].copy()
        rgb = fr.palette[fr.indices]
        opaque = (
            np.ones(fr.indices.shape, dtype=bool)
            if fr.transparent is None
            else fr.indices != fr.transparent
        )
        region_px = canvas[ys, xs]
        region_px[opaque] = rgb[opaque]
        painted[ys, xs] |= opaque
        if fr.disposal == 2:
            canvas[ys, xs] = 0
            painted[ys, xs] = False
        elif fr.disposal == 3:
            canvas[ys, xs] = before_px
            painted[ys, xs] = before_mask
    return canvas


# ---------------------------------------------------------------------------
# encode (fixture-side)
# ---------------------------------------------------------------------------


class GifFrameSpec(NamedTuple):
    indices: np.ndarray            # (h, w) uint8
    x: int = 0
    y: int = 0
    palette: np.ndarray | None = None   # local color table if set
    interlaced: bool = False
    transparent: int | None = None
    disposal: int = 0
    delay_cs: int = 0


def _pal_block(pal: np.ndarray) -> tuple[bytes, int]:
    """Pad a palette to a power-of-two size >= 2; return (bytes, size_field)."""
    n = len(pal)
    if not 2 <= n <= 256:
        raise GifError("gif: palette size out of range")
    bits = max(1, (n - 1).bit_length())
    full = np.zeros((1 << bits, 3), dtype=np.uint8)
    full[:n] = pal
    return full.tobytes(), bits - 1


def _blockify(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_encode(
    width: int,
    height: int,
    frames: list[GifFrameSpec],
    global_palette: np.ndarray,
    background: int = 0,
    loop_count: int | None = None,
    comment: bytes | None = None,
) -> bytes:
    pal_bytes, size_field = _pal_block(global_palette)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (7 << 4) | size_field, background, 0)
    out += pal_bytes
    if loop_count is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop_count) + b"\x00"
    if comment is not None:
        out += b"\x21\xfe" + _blockify(comment)
    for fr in frames:
        fh, fw = fr.indices.shape
        if fr.indices.dtype != np.uint8:
            raise GifError("gif: frame indices must be uint8")
        if fr.x + fw > width or fr.y + fh > height:
            raise GifError("gif: frame outside logical screen")
        if fr.transparent is not None or fr.disposal or fr.delay_cs:
            gce_flags = (fr.disposal & 7) << 2 | (
                1 if fr.transparent is not None else 0
            )
            out += b"\x21\xf9\x04" + bytes([gce_flags])
            out += struct.pack("<H", fr.delay_cs)
            out += bytes([fr.transparent or 0, 0])
        pal = fr.palette
        lflags = 0
        lct = b""
        if pal is not None:
            lct, lbits = _pal_block(pal)
            lflags |= 0x80 | lbits
        else:
            pal = global_palette
        if fr.interlaced:
            lflags |= 0x40
        if int(fr.indices.max()) >= len(pal):
            raise GifError("gif: index beyond palette")
        out += b"\x2c" + struct.pack("<HHHHB", fr.x, fr.y, fw, fh, lflags)
        out += lct
        rows = fr.indices
        if fr.interlaced:
            rows = rows[_interlace_order(fh)]
        min_code = max(2, int(len(pal) - 1).bit_length())
        out += bytes([min_code])
        out += _blockify(lzw_encode(rows.tobytes(), min_code))
    out += b"\x3b"
    return bytes(out)
