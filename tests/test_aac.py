"""AAC ADTS scanner tests: header round-trips, junk resync with
next-frame validation, false-sync defence, truncation, reserved
sampling-frequency indices, ID3v2 skipping (incl. the v2.4 footer via
the shared mp3 helper), CRC and multi-block accounting, and the
documented trailing-junk demotion semantics.
"""

import pytest

from streams_spark.functions.aac import (
    ADTS_RATES,
    AdtsFrame,
    _parse_header,
    adts_build,
    adts_header,
    adts_scan,
)


def test_header_round_trip_all_rates_and_channels():
    for sfi in range(13):
        for ch in (1, 2, 6):
            for crc in (False, True):
                size = 57 + sfi
                hdr = adts_header(size, sfi, ch, blocks=1, crc=crc)
                fr = _parse_header(hdr + b"\x00" * size, 0)
                assert fr is not None
                assert fr.size == size
                assert fr.sample_rate == ADTS_RATES[sfi]
                assert fr.channels == ch
                assert fr.crc is crc


def test_basic_stream_census():
    buf = adts_build(
        [(30, 1, False), (40, 2, False), (25, 1, True)],
        sfi=4, channels=2, lead_junk=3, seed=9,
    )
    scan = adts_scan(buf)
    assert len(scan.frames) == 3
    assert scan.junk_bytes == 3
    assert scan.id3_bytes == 0
    assert [f.blocks for f in scan.frames] == [1, 2, 1]
    assert [f.crc for f in scan.frames] == [False, False, True]
    assert [f.size for f in scan.frames] == [37, 47, 34]
    assert sum(f.blocks for f in scan.frames) * 1024 == 4096
    assert scan.frames[0].sample_rate == 44100


def test_id3v2_tag_skipped():
    buf = adts_build([(30, 1, False)], sfi=0, channels=1, id3_size=25,
                     seed=3)
    scan = adts_scan(buf)
    assert scan.id3_bytes == 25
    assert len(scan.frames) == 1
    assert scan.junk_bytes == 0


def test_false_sync_in_junk_rejected():
    # a 0xFF 0xF1 pair in leading junk implies a frame whose follower
    # is garbage: next-frame validation must reject it
    real = adts_build([(30, 1, False), (30, 1, False)], sfi=2,
                      channels=1, seed=5)
    fake = bytes(adts_header(20, 2, 1))  # valid-looking header...
    buf = fake[:5] + real  # ...but truncated mid-header into junk
    scan = adts_scan(buf)
    assert len(scan.frames) == 2
    assert scan.junk_bytes == 5


def test_false_sync_implying_valid_length_but_bad_follower():
    real = adts_build([(30, 1, False), (30, 1, False)], sfi=2,
                      channels=1, seed=5)
    # a complete fake header whose implied frame lands mid-junk: the
    # follower at that offset is filler (no sync), so the candidate is
    # demoted byte-by-byte into junk
    fake = adts_header(12, 2, 1) + b"\x00\x00\x00\x00\x00" + b"\x11" * 9
    buf = fake + real
    scan = adts_scan(buf)
    assert len(scan.frames) == 2
    assert scan.junk_bytes == len(fake)


def test_truncated_final_frame_is_junk():
    buf = adts_build([(30, 1, False), (30, 1, False)], sfi=2,
                     channels=1, seed=7)
    cut = buf[:-10]  # final frame now extends past EOF
    scan = adts_scan(cut)
    assert len(scan.frames) == 1
    assert scan.junk_bytes == 37 - 10


def test_trailing_junk_demotes_last_frame():
    # documented scanner semantics (shared with the mp3 census): a
    # candidate counts only when followed by EOF or a valid header, so
    # junk AFTER the last frame demotes that frame too
    buf = adts_build([(30, 1, False), (30, 1, False)], sfi=2,
                     channels=1, trail_junk=4, seed=7)
    scan = adts_scan(buf)
    assert len(scan.frames) == 1
    assert scan.junk_bytes == 37 + 4


def test_reserved_sfi_not_a_frame():
    hdr = bytearray(adts_header(37, 4, 1))
    hdr[2] = (hdr[2] & 0xC3) | (13 << 2)  # sfi 13: reserved
    assert _parse_header(bytes(hdr) + b"\x00" * 37, 0) is None
    hdr[2] = (hdr[2] & 0xC3) | (15 << 2)
    assert _parse_header(bytes(hdr) + b"\x00" * 37, 0) is None


def test_layer_bits_must_be_zero():
    hdr = bytearray(adts_header(37, 4, 1))
    hdr[1] |= 0x02  # layer != 00
    assert _parse_header(bytes(hdr) + b"\x00" * 37, 0) is None


def test_channel_config_zero_rejected():
    hdr = bytearray(adts_header(37, 4, 1))
    hdr[2] &= 0xFE
    hdr[3] &= 0x3F  # channel_configuration = 0 (PCE in payload)
    assert _parse_header(bytes(hdr) + b"\x00" * 37, 0) is None


def test_multi_block_crc_frame_rejected():
    # per-block CRC positions are out of scope: such a header must not
    # be accepted as a frame (loud junk, not silent miscounting). The
    # muxer refuses to emit one, so assemble it by flipping the block
    # count on a valid single-block CRC header.
    with pytest.raises(ValueError):
        adts_header(40, 4, 1, blocks=2, crc=True)
    hdr = bytearray(adts_header(40, 4, 1, blocks=1, crc=True))
    hdr[6] = (hdr[6] & 0xFC) | 1  # number_of_raw_data_blocks_minus1 = 1
    assert _parse_header(bytes(hdr) + b"\x00" * 40, 0) is None


def test_frame_length_below_header_rejected():
    with pytest.raises(ValueError):
        adts_header(0, 4, 1)
    hdr = bytearray(adts_header(37, 4, 1))
    # aac_frame_length = 3 < 7: candidate invalid
    hdr[3] = (hdr[3] & 0xFC)
    hdr[4] = 0
    hdr[5] = (3 << 5) | 0x1F
    assert _parse_header(bytes(hdr) + b"\x00" * 64, 0) is None


def test_empty_and_all_junk_streams():
    assert adts_scan(b"") == ([], 0, 0)
    scan = adts_scan(b"\x12\x34" * 50)
    assert scan.frames == [] and scan.junk_bytes == 100


def test_filler_never_contains_ff():
    buf = adts_build([(2000, 1, False)], sfi=4, channels=2, seed=11)
    assert b"\xff" not in buf[7:]  # only the header carries the sync
