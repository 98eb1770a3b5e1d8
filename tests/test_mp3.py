"""MP3 frame-header scan: false syncs, truncation, resync, reserved
fields — the cases the closed-form m_mp3_census oracle can't express."""

import pytest

from streams_spark.functions.mp3 import (
    BITRATES_KBPS,
    SAMPLE_RATES,
    frame_header,
    frame_length,
    id3v2_size,
    mp3_build,
    mp3_scan,
)


def test_cbr_round_trip():
    blob = mp3_build([(5, 0, 0)] * 6, fill_seed=3)
    scan = mp3_scan(blob)
    assert len(scan.frames) == 6
    assert scan.junk_bytes == 0 and scan.id3_bytes == 0
    assert {f.bitrate_kbps for f in scan.frames} == {64}
    assert {f.sample_rate for f in scan.frames} == {44100}
    assert all(f.size == frame_length(5, 0, 0) for f in scan.frames)
    # frames tile the stream exactly
    assert sum(f.size for f in scan.frames) == len(blob)


def test_vbr_padding_and_all_bitrates():
    specs = [(i, 2, i % 2) for i in range(1, 15)]
    scan = mp3_scan(mp3_build(specs))
    assert [f.bitrate_kbps for f in scan.frames] == BITRATES_KBPS[1:]
    assert [f.padding for f in scan.frames] == [i % 2 for i in range(1, 15)]
    assert {f.sample_rate for f in scan.frames} == {32000}


def test_id3v2_skip():
    blob = mp3_build([(9, 1, 0)] * 3, id3_payload=b"\x00" * 200)
    scan = mp3_scan(blob)
    assert scan.id3_bytes == 210
    assert len(scan.frames) == 3 and scan.junk_bytes == 0
    assert id3v2_size(blob) == 210


def test_id3_size_is_syncsafe():
    # payload of 200 -> syncsafe bytes (0, 0, 1, 72), none with MSB set
    blob = mp3_build([(9, 1, 0)], id3_payload=b"x" * 200)
    assert all(b & 0x80 == 0 for b in blob[6:10])


def test_leading_junk_resync():
    blob = mp3_build([(3, 0, 1)] * 4, leading_junk=b"\xff\xe0 garbage!")
    scan = mp3_scan(blob)
    assert len(scan.frames) == 4
    assert scan.junk_bytes == 11  # junk is masked to 0x7F, never a sync


def test_false_sync_inside_payload_rejected():
    # hand-place 0xFF 0xFB (a plausible sync) inside a frame body; the
    # scanner must not resync there because the implied frame isn't
    # followed by a valid header
    blob = bytearray(mp3_build([(14, 0, 0)] * 2))
    blob[100:102] = b"\xff\xfb"
    scan = mp3_scan(bytes(blob))
    assert len(scan.frames) == 2
    assert scan.frames[1].offset == frame_length(14, 0, 0)


def test_truncated_final_frame_becomes_junk():
    blob = mp3_build([(5, 0, 0)] * 3)
    cut = blob[: len(blob) - 10]  # last frame can't fit
    scan = mp3_scan(cut)
    assert len(scan.frames) == 2
    assert scan.junk_bytes == frame_length(5, 0, 0) - 10


def test_reserved_fields_rejected():
    with pytest.raises(ValueError):
        frame_header(0, 0, 0)  # free-format bitrate not synthesized
    with pytest.raises(ValueError):
        frame_header(15, 0, 0)  # bad bitrate
    with pytest.raises(ValueError):
        frame_header(5, 3, 0)  # reserved sample rate
    # a crafted MPEG-2 header (version bits 10) must not parse
    hdr = bytearray(frame_header(5, 0, 0))
    hdr[1] = (hdr[1] & ~0x18) | 0x10
    assert mp3_scan(bytes(hdr) + b"\x00" * 500).frames == []


def test_frame_length_formula():
    # 144 * 128000 / 44100 = 417.9... -> 417, +1 when padded
    assert frame_length(9, 0, 0) == 417
    assert frame_length(9, 0, 1) == 418
    assert frame_length(14, 1, 0) == 144_000 * 320 // 48000
    assert SAMPLE_RATES == [44100, 48000, 32000]


def test_empty_and_garbage_only():
    assert mp3_scan(b"") == ([], 0, 0, 0, -1)
    scan = mp3_scan(b"\x01\x02\x03" * 50)
    assert scan.frames == [] and scan.junk_bytes == 150


def test_xing_header_detected():
    blob = mp3_build([(9, 0, 0)] * 7, xing=True)
    scan = mp3_scan(blob)
    assert len(scan.frames) == 7  # the Xing frame is a real frame
    assert scan.xing_frames == 7
    # without the header the probe reports absence
    assert mp3_scan(mp3_build([(9, 0, 0)] * 7)).xing_frames == -1


def test_xing_fits_even_the_smallest_legal_frame():
    # 32 kbps @ 48 kHz is the smallest MPEG-1 Layer III frame (96
    # bytes); its 92-byte body still fits side-info(32) + 'Xing' +
    # flags + count (12), so the guard never trips on legal specs —
    # prove it by building and re-scanning one
    blob = mp3_build([(1, 1, 0)] * 2, xing=True)
    assert mp3_scan(blob).xing_frames == 2


def test_id3v1_trailer_skipped():
    blob = mp3_build([(5, 0, 0)] * 3, id3v1=True)
    scan = mp3_scan(blob)
    assert scan.id3v1_bytes == 128
    assert len(scan.frames) == 3
    assert scan.junk_bytes == 0
    # trailer bytes are NOT part of the frame region
    assert sum(f.size for f in scan.frames) == len(blob) - 128


def test_id3v1_with_id3v2_and_junk():
    blob = mp3_build(
        [(7, 2, 1)] * 4,
        id3_payload=b"x" * 40,
        leading_junk=b"??" * 5,
        xing=True,
        id3v1=True,
    )
    scan = mp3_scan(blob)
    assert scan.id3_bytes == 50
    assert scan.id3v1_bytes == 128
    assert scan.junk_bytes == 10
    assert len(scan.frames) == 4
    assert scan.xing_frames == 4


def test_id3v24_footer_flag_counted():
    # ID3v2.4 footer flag (header byte 5 & 0x10) adds a 10-byte trailer
    # after the payload; footered real-world tags must not count those
    # 10 bytes as junk
    payload = b"\x00" * 100
    n = len(payload)
    size = bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    footer = b"3DI" + bytes([4, 0, 0x10]) + size
    tag = b"ID3" + bytes([4, 0, 0x10]) + size + payload + footer
    body = mp3_build([(9, 1, 0)] * 2)
    blob = tag + body
    assert id3v2_size(blob) == 10 + 100 + 10 == len(tag)
    scan = mp3_scan(blob)
    assert scan.id3_bytes == len(tag)
    assert len(scan.frames) == 2 and scan.junk_bytes == 0


def test_id3v2_truncated_tag_clamped_to_buffer():
    # a truncated tag must never report more id3 bytes than exist
    n = 1000
    size = bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    buf = b"ID3" + bytes([4, 0, 0]) + size + b"short"
    assert id3v2_size(buf) == len(buf)
    scan = mp3_scan(buf)
    assert scan.id3_bytes == len(buf)
    assert len(scan.frames) == 0 and scan.junk_bytes == 0


def test_tag_in_final_frame_payload_is_not_a_trailer():
    # 'TAG' landing at exactly end-128 INSIDE a legitimate final
    # frame's payload (~2^-21 per doc) must not reclassify that frame
    # as junk: the frame walk without the trailer tiles the stream, so
    # the trailer is not honored
    blob = bytearray(mp3_build([(9, 1, 0)] * 2))
    at = len(blob) - 128
    # ensure the patch site is inside the FINAL frame's body, clear of
    # its 4-byte header
    final_size = frame_length(9, 1, 0)
    assert len(blob) - final_size + 4 < at < len(blob) - 3
    blob[at : at + 3] = b"TAG"
    scan = mp3_scan(bytes(blob))
    assert scan.id3v1_bytes == 0
    assert len(scan.frames) == 2
    assert scan.junk_bytes == 0
    assert sum(f.size for f in scan.frames) == len(blob)


def test_true_trailer_after_truncated_final_frame_still_honored():
    # a REAL trailer behind a truncated final frame: the no-trailer
    # walk fails to tile -> trailer honored, truncated frame degrades
    # to junk (its bytes), intact frames kept
    full = mp3_build([(5, 0, 0)] * 3)
    cut = 7  # drop 7 bytes of the last frame's body
    trailer = b"TAG" + bytes(125)
    blob = full[:-cut] + trailer
    scan = mp3_scan(blob)
    assert scan.id3v1_bytes == 128
    assert len(scan.frames) == 2
    assert scan.junk_bytes == frame_length(5, 0, 0) - cut


def test_footer_flag_ignored_on_id3v23():
    # 0x10 is undefined in v2.3 flags; spec says ignore unknown flags,
    # so no 10-byte footer may be invented
    payload = b"\x00" * 50
    size = bytes([0, 0, 0, 50])
    tag = b"ID3" + bytes([3, 0, 0x10]) + size + payload
    blob = tag + mp3_build([(9, 1, 0)])
    assert id3v2_size(blob) == len(tag)
    scan = mp3_scan(blob)
    assert len(scan.frames) == 1 and scan.junk_bytes == 0


def test_false_sync_inside_true_trailer_still_honored():
    # a REAL trailer whose bytes contain a false sync that parses as a
    # legal frame ending exactly at EOF: both walks tile, and the
    # tie-break must prefer the trailer reading
    body = mp3_build([(9, 1, 0)] * 2)
    inner = frame_header(1, 0, 0)  # 32kbps/44.1k -> 104-byte frame
    inner_frame = inner + bytes((b % 0x60) + 0x20 for b in range(100))
    trailer = bytearray(b"TAG" + bytes((b % 0x60) + 0x20 for b in range(125)))
    trailer[128 - 104 :] = inner_frame  # ends exactly at EOF
    blob = body + bytes(trailer)
    scan = mp3_scan(blob)
    assert scan.id3v1_bytes == 128
    assert len(scan.frames) == 2
    assert scan.junk_bytes == 0
