"""Multi-slice picture tests: slice-bounded prediction availability
(intra samples, MV predictors, CAVLC nC), per-slice QP/deblock
parameters incl. the idc-2 not-across-slice-boundaries mode, slice
tiling validation (FMO/ASO rejection), and the single-slice fast path
staying byte-identical.
"""

import numpy as np
import pytest

from streams_spark.functions.h264 import (
    _DB_ALPHA,
    _nal,
    BitWriter,
    H264Decoder,
    H264Error,
    dc_offset,
    encode_pps,
    encode_sps,
    h264_decode,
    h264_encode_p_rows,
    h264_encode_rows,
    h264_encode_sliced_rows,
    write_residual_block,
)


def _sliced_closed_form(levels, mb_h, idc):
    ALPHA = _DB_ALPHA[36]
    rows = np.array(
        [128 + dc_offset(lv) for lv in levels for _ in range(16)],
        dtype=np.int64,
    )
    if idc != 0:
        return rows
    out = rows.copy()
    for R in range(1, mb_h):
        y0 = 16 * R
        a, b = rows[y0 - 1], rows[y0]
        dd = abs(a - b)
        if dd >= ALPHA:
            continue
        if dd < (ALPHA >> 2) + 2:
            q1p = (3 * b + a + 2) >> 2
            q2p = (7 * b + a + 4) >> 3
            out[y0 - 3] = (7 * a + b + 4) >> 3
            out[y0 - 2] = (3 * a + b + 2) >> 2
            out[y0 - 1] = (5 * a + 3 * b + 4) >> 3
            out[y0] = (5 * b + 3 * a + 4) >> 3
            out[y0 + 1] = q1p
            out[y0 + 2] = q2p + min(max((q1p + b - 2 * q2p) >> 1, -4), 4)
        else:
            out[y0 - 1] = (3 * a + b + 2) >> 2
            out[y0] = (3 * b + a + 2) >> 2
    return out


@pytest.mark.parametrize("d", range(9))
def test_sliced_pictures_match_closed_form(d):
    mags = [0, 1, 2, 5, 9, 20, 26]
    mb_h = 2 + d % 4
    idc = d % 3
    levels = [
        mags[(d + 2 * r) % 7] * (1 if (d + r) % 2 == 0 else -1)
        for r in range(mb_h)
    ]
    fr = h264_decode(
        h264_encode_sliced_rows(mb_h, levels, deblock_idc=idc)
    )
    want = _sliced_closed_form(levels, mb_h, idc)
    assert (fr.y == want[:, None]).all()
    assert (fr.cb == 128).all()


def test_slice_boundary_blocks_intra_prediction():
    """The same picture content as a SINGLE slice decodes differently:
    with one slice, MB row 1's DC prediction sees row 0 (value a0);
    split into two slices it sees nothing (128). A decoder whose
    availability ignores slice boundaries cannot pass both this test
    and the sliced closed form above."""
    sliced = h264_decode(
        h264_encode_sliced_rows(2, [3, 0], deblock_idc=1)
    )
    assert int(sliced.y[0, 0]) == 128 + dc_offset(3)
    assert int(sliced.y[16, 0]) == 128  # NOT predicted from row 0
    # single-slice equivalent: DC anchor + DC-predicted second MB
    single = h264_decode(
        h264_encode_rows(1, 2, 128 + dc_offset(3), [0], anchor_level=3)
    )
    # in one slice, row 1 V-predicts from row 0 (level 0 -> equal)
    assert int(single.y[16, 0]) == 128 + dc_offset(3)
    assert int(sliced.y[16, 0]) != int(single.y[16, 0])


def test_slices_must_tile_the_raster():
    # gap: second slice starts at MB 2 in a 1x3 picture after the
    # first slice decoded only MB 0
    au = h264_encode_sliced_rows(3, [0, 0, 0], deblock_idc=1)
    # rebuild dropping the middle slice NAL
    from streams_spark.functions.h264 import annexb_split, rbsp_to_ebsp

    nals = annexb_split(au)
    kept = [n for i, n in enumerate(nals) if i != 3]  # sps,pps,s0,s1,s2
    buf = b"".join(b"\x00\x00\x00\x01" + n for n in kept)
    # with ASO supported the gap is caught by the coverage check
    with pytest.raises(H264Error, match="cover 2 of 3"):
        h264_decode(buf)


def test_slice_overlap_rejected():
    au = h264_encode_sliced_rows(2, [0, 0], deblock_idc=1)
    from streams_spark.functions.h264 import annexb_split

    nals = annexb_split(au)
    # duplicate the first slice: second copy starts at MB 0 again
    buf = b"".join(
        b"\x00\x00\x00\x01" + n for n in [nals[0], nals[1], nals[2], nals[2]]
    )
    with pytest.raises(H264Error, match="overlapping slices at MB 0"):
        h264_decode(buf)


def test_undersized_multislice_picture_rejected():
    au = h264_encode_sliced_rows(3, [0, 0, 0], deblock_idc=1)
    from streams_spark.functions.h264 import annexb_split

    nals = annexb_split(au)
    buf = b"".join(b"\x00\x00\x00\x01" + n for n in nals[:-1])
    with pytest.raises(H264Error, match="cover 2 of 3"):
        h264_decode(buf)


def test_multislice_p_picture_with_slice_bounded_mvp():
    """A P picture split into two slices (one per MB row): the second
    slice's first MB has NO same-slice above neighbor, so its skip-MV
    and MVP derivations run against an unavailable B — decode must
    still reconstruct the pure-MC result exactly."""
    mb_w, mb_h = 2, 2
    idr = h264_encode_rows(mb_w, mb_h, 100, [1])
    # build two P slice NALs, each one MB row, zero MV, no residual
    from streams_spark.functions.h264 import (
        _CBP_INTER_INV,
    )

    def p_slice(first_mb, n_mbs):
        bw = BitWriter()
        bw.ue(first_mb)
        bw.ue(5)
        bw.ue(0)
        bw.u(1, 4)
        bw.u(0, 1)
        bw.u(0, 1)
        bw.u(0, 1)
        bw.se(-8)
        bw.ue(1)
        for _ in range(n_mbs):
            bw.ue(0)  # skip run
            bw.ue(0)  # P_L0_16x16
            bw.se(0)  # mvd x against whatever the predictor is... (0)
            bw.se(0)
            bw.ue(_CBP_INTER_INV[0])
        bw.rbsp_trailing()
        return _nal(1, bw.to_bytes(), ref_idc=2)

    p_au = p_slice(0, 2) + p_slice(2, 2)
    dec = H264Decoder()
    f0 = dec.decode(idr)
    f1 = dec.decode(p_au)
    # zero MV + zero mvd in both slices: identical to the reference
    assert (f1.y == f0.y).all()


def test_single_slice_behavior_unchanged():
    # the multi-slice machinery must not perturb single-slice decode
    au = h264_encode_rows(3, 3, 90, [1, 2], deblock=True, anchor_level=None)
    fr1 = h264_decode(au)
    fr2 = h264_decode(au)
    assert (fr1.y == fr2.y).all()
    gop = [
        h264_encode_rows(2, 2, 100, [2]),
        h264_encode_p_rows(2, 2, (5, 7), [1, -1], frame_num=1),
    ]
    from streams_spark.functions.h264 import h264_decode_gop

    frames = h264_decode_gop(gop)
    assert frames[1].y.shape == (32, 32)


def test_per_slice_qp():
    """Two slices with different slice_qp_delta: each MB's level must
    rescale at ITS slice's QP (dc_offset(1, 36)=3 vs dc_offset(1, 30)
    differs)."""
    from streams_spark.functions.h264 import dc_offset as dco

    out = encode_sps(1, 2) + encode_pps(36)
    for r, qpd in ((0, 0), (1, -6)):
        bw = BitWriter()
        bw.ue(r)
        bw.ue(7)
        bw.ue(0)
        bw.u(0, 4)
        bw.ue(0)
        bw.u(0, 1)
        bw.u(0, 1)
        bw.se(qpd)
        bw.ue(1)
        bw.ue(1 + 2)  # I16x16 DC cbp 0
        bw.ue(0)
        bw.se(0)
        write_residual_block(bw, [1] + [0] * 15, 0)
        bw.rbsp_trailing()
        out += _nal(5, bw.to_bytes())
    fr = h264_decode(out)
    assert int(fr.y[0, 0]) == 128 + dco(1, 36)
    assert int(fr.y[16, 0]) == 128 + dco(1, 30)
    assert dco(1, 36) != dco(1, 30)


def test_multislice_byte_flip_sweep_never_hangs_or_crashes():
    au = h264_encode_sliced_rows(3, [2, -5, 9], deblock_idc=0)
    ok = err = 0
    for i in range(5, len(au)):
        corrupt = bytearray(au)
        corrupt[i] ^= 0x55
        try:
            fr = h264_decode(bytes(corrupt))
            assert fr.y.shape == (48, 16)
            ok += 1
        except H264Error:
            err += 1
    assert ok + err == len(au) - 5 and err > 0
