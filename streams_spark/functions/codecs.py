"""Dependency-free media codecs: PNG (stdlib zlib), WAV (stdlib wave),
and the PSMF multi-frame container (length-prefixed PNG stream).

The reference's payload contract is opaque bytes the consumer decodes
(/root/reference/server/messages.go:65). The container ships no Pillow/
ffmpeg, so until round 4 the engine's decode step was a declared
deterministic fake. These codecs close that gap for three real formats
using ONLY the standard library + numpy:

- PNG: 8-bit greyscale (color type 0) and RGB (color type 2), no
  interlace. The encoder can emit any of the five PNG scanline filters
  (None/Sub/Up/Average/Paeth, RFC 2083 §6); the decoder un-filters all
  five, so it decodes real-world non-interlaced 8-bit PNGs, not just
  our own output.
- WAV: PCM int16 via the stdlib `wave` module.

`media_probe` is a `decode_media(decode_fn=...)`-compatible codec that
sniffs the magic bytes and returns (width, height, n_channels,
content_checksum) where the checksum is over the DECODED samples — so a
passing oracle proves the zlib round-trip actually recovered the
pixels, not merely that headers parsed. JPEG payloads (FFD8) route to
the baseline Huffman+IDCT decoder in functions/jpeg.py.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
CHECKSUM_MOD = 1_000_000_007


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an 8-bit image array — (h, w) greyscale or (h, w, 3) RGB —
    as a valid non-interlaced PNG, applying `filter_type` (0..4) to
    every scanline."""
    if arr.dtype != np.uint8:
        raise ValueError("png_encode wants uint8")
    if arr.ndim == 2:
        h, w, ch, color_type = arr.shape[0], arr.shape[1], 1, 0
        pixels = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, ch, color_type = arr.shape[0], arr.shape[1], 3, 2
        pixels = arr
    else:
        raise ValueError("png_encode wants (h,w) or (h,w,3)")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")

    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        line = pixels[y].astype(np.int32)
        left = np.zeros_like(line)
        left[1:] = line[:-1]
        upleft = np.zeros_like(prev)
        upleft[1:] = prev[:-1]
        if filter_type == 0:
            out = line
        elif filter_type == 1:  # Sub
            out = line - left
        elif filter_type == 2:  # Up
            out = line - prev
        elif filter_type == 3:  # Average
            out = line - (left + prev) // 2
        else:  # Paeth
            out = line - _paeth(left, prev, upleft)
        raw.append(filter_type)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Un-filter one filtered sub-image (the whole picture, or one
    Adam7 pass): all five scanline filter types per PNG §4.5."""
    stride = w * ch
    out = np.zeros((h, w, ch), dtype=np.int32)
    prev = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32).reshape(w, ch)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft == 1:  # Sub: prefix sum along x (mod distributes)
            cur = np.cumsum(line, axis=0) % 256
        elif ft in (3, 4):  # Average/Paeth: inherently sequential in x;
            # plain-int Python loop beats numpy scalar ops ~5x on the
            # small tiles the media ops decode
            lin = line.tolist()
            prv = prev.tolist()
            out_rows = []
            left = [0] * ch
            upleft = [0] * ch
            for x in range(w):
                up = prv[x]
                row = lin[x]
                if ft == 3:
                    px = [
                        (row[c] + (left[c] + up[c]) // 2) % 256
                        for c in range(ch)
                    ]
                else:
                    px = []
                    for c in range(ch):
                        a, b2, c2 = left[c], up[c], upleft[c]
                        p = a + b2 - c2
                        pa, pb, pc = abs(p - a), abs(p - b2), abs(p - c2)
                        pred = (
                            a
                            if pa <= pb and pa <= pc
                            else (b2 if pb <= pc else c2)
                        )
                        px.append((row[c] + pred) % 256)
                out_rows.append(px)
                left = px
                upleft = up
            cur = np.array(out_rows, dtype=np.int32).reshape(w, ch)
        else:
            raise ValueError(f"bad filter {ft}")
        out[y] = cur
        prev = cur
    return out


# Adam7 pass grid (PNG §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit-depth PNG to an array: greyscale (0) -> (h, w),
    RGB (2) / palette (3, expanded via PLTE, +tRNS -> RGBA) -> (h, w,
    3|4), grey+alpha (4) -> (h, w, 2), RGBA (6) -> (h, w, 4); both
    non-interlaced and Adam7-interlaced layouts (each interlace pass is
    an independently filtered sub-image scattered onto the output
    grid). Un-filters all five scanline filter types, so the input
    need not come from png_encode — the real-world shapes (palette
    logos, RGBA icons, interlaced libpng output) are pytest-proven
    against externally-produced files."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, w = 8, b"", None
    plte = trns = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in (0, 2, 3, 4, 6):
                raise ValueError(
                    "supported: 8-bit grey/RGB/palette/grey-alpha/RGBA"
                )
            if interlace not in (0, 1):
                raise ValueError(f"bad interlace method {interlace}")
            ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("no IHDR")
    raw = zlib.decompress(idat)
    if not interlace:
        out = _png_unfilter(raw, w, h, ch)
    else:  # Adam7: 7 independently-filtered passes
        out = np.zeros((h, w, ch), dtype=np.int32)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs if w > x0 else 0
            ph = (h - y0 + ys - 1) // ys if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            size = ph * (pw * ch + 1)
            out[y0::ys, x0::xs] = _png_unfilter(
                raw[off : off + size], pw, ph, ch
            )
            off += size
        if off != len(raw):
            raise ValueError("Adam7 data size mismatch")
    arr = out.astype(np.uint8)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]
        if trns is None:
            return rgb
        alpha = np.full(len(plte), 255, dtype=np.uint8)
        alpha[: len(trns)] = trns
        return np.dstack([rgb, alpha[idx]])
    return arr[:, :, 0] if ch == 1 else arr


def wav_encode(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Encode int16 PCM samples — (n,) mono or (n, ch) — as a WAV."""
    if samples.dtype != np.int16:
        raise ValueError("wav_encode wants int16")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(ch)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a PCM WAV to (samples (n, ch), rate, ch). All four real-
    world integer PCM widths: 8-bit (unsigned per RIFF, recentred to
    signed), 16-bit (int16), 24-bit (sign-extended to int32), 32-bit
    (int32) — proven against externally-produced CPython test-suite
    files in tests/test_codecs.py."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        ch = wv.getnchannels()
        width = wv.getsampwidth()
        rate = wv.getframerate()
        frames = wv.readframes(wv.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2")
    elif width == 1:
        # RIFF stores 8-bit PCM unsigned with a 128 bias
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128
        )
    elif width == 4:
        samples = np.frombuffer(frames, dtype="<i4")
    elif width == 3:
        b = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        samples = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int8).astype(np.int32) << 16)
        )
    else:
        raise ValueError(f"supported PCM widths: 8/16/24/32, got {width}")
    return samples.reshape(-1, ch), rate, ch


_FRAMES_MAGIC = b"PSMF\x01"


def frames_encode(frames: list[np.ndarray]) -> bytes:
    """Encode a frame sequence as a multi-frame container: magic+version,
    big-endian frame count, then length-prefixed PNG-encoded frames
    (each a full png_encode output; the filter cycles per frame so a
    decode exercises every un-filter path). An APNG-lite: same idea as
    APNG's PNG-stream-per-frame, minus the animation-timing chunks the
    engine has no use for."""
    parts = [_FRAMES_MAGIC, struct.pack(">I", len(frames))]
    for i, arr in enumerate(frames):
        png = png_encode(arr, filter_type=i % 5)
        parts.append(struct.pack(">I", len(png)))
        parts.append(png)
    return b"".join(parts)


def frames_decode(data: bytes) -> list[np.ndarray]:
    """Decode a frames_encode container back to its list of arrays.
    Raises on bad magic, a torn frame, or trailing garbage — undecodable
    video blobs are quarantined explicitly, like media_probe."""
    if data[: len(_FRAMES_MAGIC)] != _FRAMES_MAGIC:
        raise ValueError("not a PSMF frame container")
    if len(data) < 9:
        raise ValueError("torn frame container header")
    (n,) = struct.unpack(">I", data[5:9])
    pos, frames = 9, []
    for _ in range(n):
        if pos + 4 > len(data):
            raise ValueError("torn frame container")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        if pos + length > len(data):
            raise ValueError("torn frame payload")
        frames.append(png_decode(data[pos : pos + length]))
        pos += length
    if pos != len(data):
        raise ValueError("trailing bytes after last frame")
    return frames


def media_probe(payload: bytes) -> tuple[int, int, int, int]:
    """decode_media-compatible codec over REAL bytes: sniffs the format
    and returns (width, height, multiplicity, checksum-of-decoded-content)
    where multiplicity is the format's natural third axis. PNG →
    (w, h, channels, Σpixels mod M); WAV → (n_samples, 1, channels,
    Σsamples mod M — Python mod, so non-negative); PSMF multi-frame →
    (w, h, n_frames, Σ all frames' pixels mod M). Raises on anything
    else: a real pipeline quarantines undecodable blobs explicitly
    (m_decode_media's deterministic fake is the stand-in for that path).
    """
    if payload[:8] == _PNG_MAGIC:
        arr = png_decode(payload)
        ch = 1 if arr.ndim == 2 else arr.shape[2]
        h, w = arr.shape[0], arr.shape[1]
        return w, h, ch, int(arr.astype(np.int64).sum()) % CHECKSUM_MOD
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, _rate, ch = wav_decode(payload)
        return (
            samples.shape[0],
            1,
            ch,
            int(samples.astype(np.int64).sum()) % CHECKSUM_MOD,
        )
    if payload[:2] == b"\xff\xd8":
        from streams_spark.functions.jpeg import jpeg_decode

        arr = jpeg_decode(payload)
        ch = 1 if arr.ndim == 2 else arr.shape[2]
        h, w = arr.shape[0], arr.shape[1]
        return w, h, ch, int(arr.astype(np.int64).sum()) % CHECKSUM_MOD
    if payload[: len(_FRAMES_MAGIC)] == _FRAMES_MAGIC:
        frames = frames_decode(payload)
        if not frames:
            return 0, 0, 0, 0
        h, w = frames[0].shape[0], frames[0].shape[1]
        if any(a.shape[:2] != (h, w) for a in frames[1:]):
            # the container format permits mixed shapes, but the probe's
            # (w, h, n_frames) geometry contract is only meaningful when
            # frames agree — quarantine rather than report frames[0]'s
            # size as if it covered all of them
            raise ValueError("mixed-shape frame container")
        csum = sum(int(a.astype(np.int64).sum()) for a in frames)
        return w, h, len(frames), csum % CHECKSUM_MOD
    raise ValueError("unrecognized media payload")
