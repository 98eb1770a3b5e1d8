"""FMO (slice groups, 8.2.2) and ASO coverage.

Map derivations are pinned against hand-computed 2-D expectations for
every slice_group_map_type; end-to-end decodes are pinned against an
independent per-row Python model (group membership -> DC-prediction
chaining, in-group position -> mb_qp_delta accumulation), so a wrong
NextMbAddress walk, wrong map, or wrong QP sequencing all surface as
pixel mismatches. Reference contract: consumer-side decode of opaque
payloads (/root/reference/server/messages.go:65)."""

import numpy as np
import pytest

from streams_spark.functions.h264 import (
    H264Decoder,
    H264Error,
    BitWriter,
    _fmo_fixture_map,
    _nal,
    annexb_split,
    dc_offset,
    ebsp_to_rbsp,
    encode_pps,
    encode_sps,
    h264_decode,
    h264_encode_fmo,
    h264_encode_sliced_rows,
    parse_pps,
    parse_sps,
    slice_group_map,
)


def _map2d(w, h, fmo, cycle=0):
    pps = parse_pps(ebsp_to_rbsp(encode_pps(fmo=fmo)[5:]))
    sps = parse_sps(ebsp_to_rbsp(encode_sps(w, h)[5:]))
    return slice_group_map(pps, sps, cycle).reshape(h, w).tolist()


def test_map_type0_interleaved_runs():
    m = _map2d(3, 3, {"n_groups": 2, "map_type": 0, "run_length": (2, 3)})
    assert m == [[0, 0, 1], [1, 1, 0], [0, 1, 1]]


def test_map_type1_dispersed_two_groups_is_checkerboard():
    m = _map2d(4, 3, {"n_groups": 2, "map_type": 1})
    assert m == [
        [0, 1, 0, 1],
        [1, 0, 1, 0],
        [0, 1, 0, 1],
    ]


def test_map_type1_dispersed_three_groups():
    # ((x) + ((y * 3) // 2)) % 3 per 8.2.2.2
    m = _map2d(4, 3, {"n_groups": 3, "map_type": 1})
    assert m == [
        [0, 1, 2, 0],
        [1, 2, 0, 1],
        [0, 1, 2, 0],
    ]


def test_map_type2_rectangles_lower_group_wins_overlap():
    m = _map2d(
        4, 4,
        {
            "n_groups": 3,
            "map_type": 2,
            # group 0: (1,1)-(2,2); group 1: (0,0)-(1,1) — they overlap
            # at map unit 5 and the 8.2.2.3 downward loop gives it to 0
            "top_left": (5, 0),
            "bottom_right": (10, 5),
        },
    )
    assert m == [
        [1, 1, 2, 2],
        [1, 0, 0, 2],
        [2, 0, 0, 2],
        [2, 2, 2, 2],
    ]


def test_map_type3_box_out_structure():
    fmo = {
        "n_groups": 2, "map_type": 3,
        "change_direction": 0, "change_rate": 1,
    }
    m = np.array(
        _map2d(3, 3, fmo, cycle=5)
    )
    # exactly MapUnitsInSliceGroup0 = min(5*1, 9) zeros, grown as a box
    # around the center map unit
    assert int((m == 0).sum()) == 5
    assert m[1, 1] == 0  # the center seeds group 0
    # group 0 stays within the 1-step bounding box of the center after
    # 5 placements on a 3x3 picture
    ys, xs = np.nonzero(m == 0)
    assert ys.max() - ys.min() <= 2 and xs.max() - xs.min() <= 2
    # hand-walk of the transcribed 8.2.2.4 cursor: center, left, up,
    # then the top edge rightward
    assert m.tolist() == [[0, 0, 0], [0, 0, 1], [1, 1, 1]]


def test_map_type3_cycle_zero_and_full():
    fmo = {
        "n_groups": 2, "map_type": 3,
        "change_direction": 1, "change_rate": 1,
    }
    assert (np.array(_map2d(3, 3, fmo, cycle=0)) == 1).all()
    assert (np.array(_map2d(3, 3, fmo, cycle=9)) == 0).all()


def test_map_type4_raster_both_directions():
    fmo = {
        "n_groups": 2, "map_type": 4,
        "change_direction": 0, "change_rate": 2,
    }
    assert _map2d(3, 2, fmo, cycle=1) == [[0, 0, 1], [1, 1, 1]]
    fmo["change_direction"] = 1
    assert _map2d(3, 2, fmo, cycle=1) == [[1, 1, 1], [1, 0, 0]]


def test_map_type5_wipe_is_column_major():
    fmo = {
        "n_groups": 2, "map_type": 5,
        "change_direction": 0, "change_rate": 1,
    }
    assert _map2d(3, 2, fmo, cycle=3) == [[0, 0, 1], [0, 1, 1]]
    fmo["change_direction"] = 1
    assert _map2d(3, 2, fmo, cycle=3) == [[1, 1, 0], [1, 0, 0]]


def test_map_type6_explicit():
    ids = (0, 1, 1, 0, 2, 2)
    m = _map2d(3, 2, {"n_groups": 3, "map_type": 6, "slice_group_id": ids})
    assert m == [[0, 1, 1], [0, 2, 2]]


def test_pps_fmo_syntax_round_trips():
    for fmo in (
        {"n_groups": 3, "map_type": 0, "run_length": (1, 4, 2)},
        {"n_groups": 2, "map_type": 1},
        {"n_groups": 2, "map_type": 2, "top_left": (3,),
         "bottom_right": (7,)},
        {"n_groups": 2, "map_type": 3, "change_direction": 1,
         "change_rate": 3},
        {"n_groups": 2, "map_type": 4, "change_direction": 0,
         "change_rate": 2},
        {"n_groups": 2, "map_type": 5, "change_direction": 1,
         "change_rate": 1},
        {"n_groups": 4, "map_type": 6,
         "slice_group_id": (0, 3, 2, 1, 0, 1)},
    ):
        pps = parse_pps(ebsp_to_rbsp(encode_pps(fmo=fmo)[5:]))
        assert pps.num_slice_groups == fmo["n_groups"]
        assert pps.slice_group_map_type == fmo["map_type"]
        if fmo["map_type"] == 0:
            assert pps.run_length == fmo["run_length"]
        elif fmo["map_type"] == 2:
            assert pps.top_left == fmo["top_left"]
            assert pps.bottom_right == fmo["bottom_right"]
        elif fmo["map_type"] in (3, 4, 5):
            assert pps.change_direction == fmo["change_direction"]
            assert pps.change_rate == fmo["change_rate"]
        elif fmo["map_type"] == 6:
            assert pps.slice_group_id == fmo["slice_group_id"]


def test_malformed_fmo_rejected():
    # type-2 rectangle past the picture
    fmo = {"n_groups": 2, "map_type": 2, "top_left": (2,),
           "bottom_right": (99,)}
    with pytest.raises(H264Error, match="rectangle out of bounds"):
        _map2d(2, 2, fmo)
    # type-2 corners inverted (xtl > xbr)
    fmo = {"n_groups": 2, "map_type": 2, "top_left": (1,),
           "bottom_right": (2,)}
    with pytest.raises(H264Error, match="corners inverted"):
        _map2d(2, 3, fmo)
    # type-6 map shorter than the picture
    fmo = {"n_groups": 2, "map_type": 6, "slice_group_id": (0, 1)}
    with pytest.raises(H264Error, match="covers 2 of 4"):
        _map2d(2, 2, fmo)
    # type-6 slice_group_id value out of range (3 groups code 2-bit
    # ids, so the value 3 fits the field but names no group)
    fmo = {"n_groups": 3, "map_type": 6, "slice_group_id": (0, 1, 3, 2)}
    with pytest.raises(H264Error, match="slice_group_id out of range"):
        parse_pps(ebsp_to_rbsp(encode_pps(fmo=fmo)[5:]))
    # num_slice_groups > 8 violates A.2.1
    bw = BitWriter()
    bw.ue(0)
    bw.ue(0)
    bw.u(0, 1)
    bw.u(0, 1)
    bw.ue(8)  # num_slice_groups_minus1 = 8 -> 9 groups
    bw.rbsp_trailing()
    with pytest.raises(H264Error, match="exceeds 8"):
        parse_pps(bw.to_bytes())


def _expected_rows(mb_h, levels, deltas, fmo, cycle=0, qp=30):
    """Independent model of the fixture decode: same-group adjacency
    chains DC prediction; in-group position drives the QP ladder."""
    m = _fmo_fixture_map(mb_h, fmo, cycle)
    vals = []
    for y in range(mb_h):
        g = m[y]
        pos = sum(1 for u in range(y) if m[u] == g)
        qpv = qp + sum(deltas[g][: pos + 1])
        top = vals[y - 1] if y > 0 and m[y - 1] == g else 128
        vals.append(top + dc_offset(levels[y], qpv))
    return m, vals


_E2E_CASES = [
    ({"n_groups": 2, "map_type": 0, "run_length": (2, 1)}, 0),
    ({"n_groups": 2, "map_type": 1}, 0),
    ({"n_groups": 2, "map_type": 2, "top_left": (1,),
      "bottom_right": (3,)}, 0),
    ({"n_groups": 2, "map_type": 3, "change_direction": 0,
      "change_rate": 1}, 3),
    ({"n_groups": 2, "map_type": 4, "change_direction": 1,
      "change_rate": 1}, 2),
    ({"n_groups": 2, "map_type": 5, "change_direction": 0,
      "change_rate": 2}, 1),
    ({"n_groups": 2, "map_type": 6,
      "slice_group_id": (0, 1, 1, 0, 1, 0)}, 0),
    ({"n_groups": 3, "map_type": 0, "run_length": (1, 2, 1)}, 0),
]


@pytest.mark.parametrize("fmo,cycle", _E2E_CASES)
def test_fmo_decode_matches_model(fmo, cycle):
    mb_h = 6
    mags = [0, 1, 2, 5, 9, 20, 26]
    m = _fmo_fixture_map(mb_h, fmo, cycle)
    levels = [
        mags[(3 * r + 1) % 7] * (1 if r % 2 == 0 else -1)
        for r in range(mb_h)
    ]
    deltas = [
        [((g + p) % 3) - 1 for p in range(sum(1 for v in m if v == g))]
        for g in range(fmo["n_groups"])
    ]
    _, want = _expected_rows(mb_h, levels, deltas, fmo, cycle)
    for order in (None, list(reversed(range(fmo["n_groups"])))):
        fr = h264_decode(
            h264_encode_fmo(
                mb_h, levels, deltas, fmo, cycle, slice_order=order
            )
        )
        got = [int(fr.y[16 * r, 0]) for r in range(mb_h)]
        assert got == want, (fmo, order)
        # every MB decodes flat (the closed form's precondition)
        for r in range(mb_h):
            blk = fr.y[16 * r : 16 * r + 16, :]
            assert int(blk.min()) == int(blk.max())
        assert int(fr.cb.min()) == int(fr.cb.max()) == 128


def test_fmo_poisoned_single_group_decoder_diverges():
    """A decoder that ignored the map (treated the picture as one
    raster slice) would chain DC prediction across group boundaries —
    assert the FMO result actually differs from that reading."""
    fmo = {"n_groups": 2, "map_type": 1}
    mb_h = 4
    levels = [9, 9, 9, 9]
    deltas = [[0, 0], [0, 0]]
    fr = h264_decode(h264_encode_fmo(mb_h, levels, deltas, fmo))
    got = [int(fr.y[16 * r, 0]) for r in range(mb_h)]
    # checkerboard: no row has a same-group row above -> all independent
    off = dc_offset(9, 30)
    assert got == [128 + off] * 4
    # the single-slice reading would accumulate 128 + off*(r+1)
    assert got != [128 + off * (r + 1) for r in range(mb_h)]


def test_fmo_p_skip_copies_reference():
    fmo = {"n_groups": 2, "map_type": 1}
    mb_h = 5
    m = _fmo_fixture_map(mb_h, fmo, 0)
    deltas = [[0] * sum(1 for v in m if v == g) for g in range(2)]
    idr = h264_encode_fmo(mb_h, [7, -3, 12, 0, 5], deltas, fmo)

    def p_skip_slice(first_mb, nmb):
        bw = BitWriter()
        bw.ue(first_mb)
        bw.ue(5)  # P slice
        bw.ue(0)
        bw.u(1, 4)  # frame_num 1
        bw.u(0, 1)
        bw.u(0, 1)
        bw.u(0, 1)  # sliding-window marking
        bw.se(0)
        bw.ue(1)  # deblock off
        bw.ue(nmb)  # one skip run covers the whole group
        bw.rbsp_trailing()
        return _nal(1, bw.to_bytes(), ref_idc=2)

    pau = b""
    for g in (1, 0):  # ASO too
        addrs = [i for i in range(mb_h) if m[i] == g]
        pau += p_skip_slice(addrs[0], len(addrs))
    dec = H264Decoder()
    f0 = dec.decode(idr)
    f1 = dec.decode(pau)
    assert np.array_equal(f0.y, f1.y)
    assert np.array_equal(f0.cb, f1.cb)
    assert np.array_equal(f0.cr, f1.cr)


def test_aso_reversed_slices_decode_identically():
    buf = h264_encode_sliced_rows(4, [5, -2, 9, 1])
    nals = annexb_split(buf)
    sc = b"\x00\x00\x00\x01"
    shuffled = sc + sc.join([nals[0], nals[1]] + nals[2:][::-1])
    assert np.array_equal(h264_decode(buf).y, h264_decode(shuffled).y)


def test_fmo_missing_group_slice_rejected():
    fmo = {"n_groups": 2, "map_type": 1}
    mb_h = 4
    m = _fmo_fixture_map(mb_h, fmo, 0)
    deltas = [[0] * sum(1 for v in m if v == g) for g in range(2)]
    buf = h264_encode_fmo(mb_h, [1, 2, 3, 4], deltas, fmo)
    nals = annexb_split(buf)
    sc = b"\x00\x00\x00\x01"
    # drop the second group's slice: half the MBs are never decoded
    broken = sc + sc.join(nals[:3])
    with pytest.raises(H264Error, match="cover 2 of 4"):
        h264_decode(broken)


def test_fmo_duplicated_slice_rejected():
    fmo = {"n_groups": 2, "map_type": 1}
    mb_h = 4
    m = _fmo_fixture_map(mb_h, fmo, 0)
    deltas = [[0] * sum(1 for v in m if v == g) for g in range(2)]
    buf = h264_encode_fmo(mb_h, [1, 2, 3, 4], deltas, fmo)
    nals = annexb_split(buf)
    sc = b"\x00\x00\x00\x01"
    dup = sc + sc.join([nals[0], nals[1], nals[2], nals[3], nals[3]])
    with pytest.raises(H264Error, match="overlapping slices"):
        h264_decode(dup)


def test_fmo_byte_flip_never_wrong_silently():
    """Flipping any single byte of a slice NAL either still decodes
    (to the SAME geometry) or raises H264Error — never crashes with a
    non-H264Error and never hangs."""
    fmo = {"n_groups": 2, "map_type": 0, "run_length": (2, 1)}
    mb_h = 6
    m = _fmo_fixture_map(mb_h, fmo, 0)
    deltas = [
        [((g + p) % 3) - 1 for p in range(sum(1 for v in m if v == g))]
        for g in range(2)
    ]
    buf = bytearray(
        h264_encode_fmo(mb_h, [1, -2, 5, 9, -1, 2], deltas, fmo)
    )
    rng = np.random.default_rng(17)
    for _ in range(80):
        i = int(rng.integers(5, len(buf)))
        old = buf[i]
        buf[i] ^= 1 << int(rng.integers(0, 8))
        try:
            fr = h264_decode(bytes(buf))
            assert fr.y.shape[1] == 16
        except H264Error:
            pass
        buf[i] = old
