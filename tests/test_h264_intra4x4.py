"""Intra_4x4 decode tests: the nine 8.3.1 prediction modes against an
independent spec transcription, decode-order sample availability and
the above-right substitution, mode-coding (prev flag / rem against the
min(A,B) predictor), the intra Table 9-4 CBP column, and end-to-end
mixed-macroblock pictures vs the m_h264_intra4x4 closed form.
"""

import numpy as np
import pytest

from streams_spark.functions.h264 import (
    _BLK_ORDER,
    _CBP_INTRA,
    _CBP_INTRA_INV,
    _i4x4_pred_mode,
    _nal,
    BitWriter,
    H264Error,
    dc_offset,
    encode_pps,
    encode_sps,
    h264_decode,
    h264_encode_i4x4_rows,
    inter_dc_offset,
    predict_4x4,
)

# ---------------------------------------------------------------------------
# Table 9-4 (intra column) structural pins
# ---------------------------------------------------------------------------


def test_cbp_intra_table_is_permutation():
    assert sorted(_CBP_INTRA) == list(range(48))


def test_cbp_intra_anchor_rows():
    # spec Table 9-4 Intra_4x4 column: codeNum 0 -> 47, 1 -> 31,
    # 2 -> 15, 3 -> 0; and the fixture's cbp 5 sits at codeNum 18
    assert _CBP_INTRA[0] == 47
    assert _CBP_INTRA[1] == 31
    assert _CBP_INTRA[2] == 15
    assert _CBP_INTRA[3] == 0
    assert _CBP_INTRA_INV[5] == 18


# ---------------------------------------------------------------------------
# The nine prediction modes vs an independent spec transcription
# ---------------------------------------------------------------------------


def _predict_4x4_spec(p, mode, has_left, has_top, has_corner, has_tr):
    """Literal 8.3.1.2.1-9 transcription over a sample accessor
    p(x, y) in the spec's coordinates (x along the top, y down the
    left, -1 the shared edge). Returns None where the mode's required
    samples are unavailable (the implementation must raise there)."""

    def top(x):  # p[x, -1], with above-right substitution for x > 3
        if x <= 3:
            return p(x, -1)
        return p(x, -1) if has_tr else p(3, -1)

    out = np.empty((4, 4), dtype=np.int64)
    if mode == 0:
        if not has_top:
            return None
        for y in range(4):
            for x in range(4):
                out[y, x] = p(x, -1)
    elif mode == 1:
        if not has_left:
            return None
        for y in range(4):
            for x in range(4):
                out[y, x] = p(-1, y)
    elif mode == 2:
        if has_top and has_left:
            dc = (sum(p(x, -1) for x in range(4))
                  + sum(p(-1, y) for y in range(4)) + 4) >> 3
        elif has_top:
            dc = (sum(p(x, -1) for x in range(4)) + 2) >> 2
        elif has_left:
            dc = (sum(p(-1, y) for y in range(4)) + 2) >> 2
        else:
            dc = 128
        out[:] = dc
    elif mode == 3:
        if not has_top:
            return None
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    out[y, x] = (top(6) + 3 * top(7) + 2) >> 2
                else:
                    out[y, x] = (
                        top(x + y) + 2 * top(x + y + 1) + top(x + y + 2) + 2
                    ) >> 2
    elif mode == 4:
        if not (has_top and has_left and has_corner):
            return None
        for y in range(4):
            for x in range(4):
                if x > y:
                    out[y, x] = (
                        p(x - y - 2, -1) + 2 * p(x - y - 1, -1)
                        + p(x - y, -1) + 2
                    ) >> 2
                elif x < y:
                    out[y, x] = (
                        p(-1, y - x - 2) + 2 * p(-1, y - x - 1)
                        + p(-1, y - x) + 2
                    ) >> 2
                else:
                    out[y, x] = (p(0, -1) + 2 * p(-1, -1) + p(-1, 0) + 2) >> 2
    elif mode == 5:
        if not (has_top and has_left and has_corner):
            return None
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z in (0, 2, 4, 6):
                    out[y, x] = (
                        p(x - (y >> 1) - 1, -1) + p(x - (y >> 1), -1) + 1
                    ) >> 1
                elif z in (1, 3, 5):
                    out[y, x] = (
                        p(x - (y >> 1) - 2, -1)
                        + 2 * p(x - (y >> 1) - 1, -1)
                        + p(x - (y >> 1), -1) + 2
                    ) >> 2
                elif z == -1:
                    out[y, x] = (p(-1, 0) + 2 * p(-1, -1) + p(0, -1) + 2) >> 2
                else:
                    out[y, x] = (
                        p(-1, y - 2 * x - 1) + 2 * p(-1, y - 2 * x - 2)
                        + p(-1, y - 2 * x - 3) + 2
                    ) >> 2
    elif mode == 6:
        if not (has_top and has_left and has_corner):
            return None
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z in (0, 2, 4, 6):
                    out[y, x] = (
                        p(-1, y - (x >> 1) - 1) + p(-1, y - (x >> 1)) + 1
                    ) >> 1
                elif z in (1, 3, 5):
                    out[y, x] = (
                        p(-1, y - (x >> 1) - 2)
                        + 2 * p(-1, y - (x >> 1) - 1)
                        + p(-1, y - (x >> 1)) + 2
                    ) >> 2
                elif z == -1:
                    out[y, x] = (p(-1, 0) + 2 * p(-1, -1) + p(0, -1) + 2) >> 2
                else:
                    out[y, x] = (
                        p(x - 2 * y - 1, -1) + 2 * p(x - 2 * y - 2, -1)
                        + p(x - 2 * y - 3, -1) + 2
                    ) >> 2
    elif mode == 7:
        if not has_top:
            return None
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    out[y, x] = (top(i) + top(i + 1) + 1) >> 1
                else:
                    out[y, x] = (top(i) + 2 * top(i + 1) + top(i + 2) + 2) >> 2
    elif mode == 8:
        if not has_left:
            return None
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                i = y + (x >> 1)
                if z in (0, 2, 4):
                    out[y, x] = (p(-1, i) + p(-1, i + 1) + 1) >> 1
                elif z in (1, 3):
                    out[y, x] = (
                        p(-1, i) + 2 * p(-1, i + 1) + p(-1, i + 2) + 2
                    ) >> 2
                elif z == 5:
                    out[y, x] = (p(-1, 2) + 3 * p(-1, 3) + 2) >> 2
                else:
                    out[y, x] = p(-1, 3)
    return out


def _context(rng, bx=1, by=1, tr=True):
    """A plane with everything left/above the target block decoded
    (and optionally the above-right block)."""
    plane = rng.integers(0, 256, size=(16, 16)).astype(np.int64)
    decoded = np.zeros((4, 4), dtype=bool)
    decoded[:by, :] = True
    decoded[by, :bx] = True
    if not tr:
        decoded[by - 1, bx + 1 : ] = False
    return plane, decoded


@pytest.mark.parametrize("mode", range(9))
@pytest.mark.parametrize("tr", [True, False])
def test_predict_4x4_modes_match_spec(mode, tr):
    rng = np.random.default_rng(100 + mode)
    for trial in range(8):
        plane, decoded = _context(rng, tr=tr)
        bx, by = 1, 1
        x0, y0 = 4 * bx, 4 * by

        def p(x, y):
            return int(plane[y0 + y, x0 + x])

        want = _predict_4x4_spec(
            p, mode,
            has_left=True, has_top=True, has_corner=True, has_tr=tr,
        )
        got = predict_4x4(plane, decoded, bx, by, mode)
        assert (got == want).all(), (mode, tr, trial)
        plane, decoded = _context(rng, tr=tr)  # fresh texture per trial


def test_predict_4x4_requires_samples():
    plane = np.full((16, 16), 90, dtype=np.int64)
    none_decoded = np.zeros((4, 4), dtype=bool)
    for mode, msg in [(0, "without top"), (1, "without left"),
                      (3, "without top"), (7, "without top"),
                      (8, "without left")]:
        with pytest.raises(H264Error, match=msg):
            predict_4x4(plane, none_decoded, 1, 1, mode)
    for mode in (4, 5, 6):
        with pytest.raises(H264Error, match="left/top/corner"):
            predict_4x4(plane, none_decoded, 1, 1, mode)


def test_predict_4x4_dc_fallbacks():
    plane = np.zeros((16, 16), dtype=np.int64)
    plane[3, 4:8] = [10, 20, 30, 40]   # top row of block (1,1)
    plane[4:8, 3] = [50, 60, 70, 80]   # left col of block (1,1)
    both = np.zeros((4, 4), dtype=bool)
    both[0, 1] = both[1, 0] = True
    assert predict_4x4(plane, both, 1, 1, 2)[0, 0] == (100 + 260 + 4) >> 3
    only_top = np.zeros((4, 4), dtype=bool)
    only_top[0, 1] = True
    assert predict_4x4(plane, only_top, 1, 1, 2)[0, 0] == (100 + 2) >> 2
    only_left = np.zeros((4, 4), dtype=bool)
    only_left[1, 0] = True
    assert predict_4x4(plane, only_left, 1, 1, 2)[0, 0] == (260 + 2) >> 2
    assert predict_4x4(
        plane, np.zeros((4, 4), dtype=bool), 1, 1, 2
    )[0, 0] == 128


def test_above_right_substitution_changes_ddl():
    rng = np.random.default_rng(42)
    plane = rng.integers(0, 256, size=(16, 16)).astype(np.int64)
    with_tr, without_tr = _context(rng)[1], None
    with_tr = np.zeros((4, 4), dtype=bool)
    with_tr[0, :], with_tr[1, 0] = True, True
    without_tr = with_tr.copy()
    without_tr[0, 2:] = False
    a = predict_4x4(plane, with_tr, 1, 1, 3)
    b = predict_4x4(plane, without_tr, 1, 1, 3)
    # bottom-right samples depend on the above-right block; with the
    # substitution they flatten to p[3,-1]-dominated values
    assert (b[3, 3] == plane[3, 7]).all()
    if plane[3, 8] != plane[3, 7]:
        assert not (a == b).all()


def test_i4x4_pred_mode_min_rule():
    modes = np.full((4, 4), -1, dtype=np.int64)
    assert _i4x4_pred_mode(modes, 0, 0) == 2  # nothing known -> DC
    modes[1, 0] = 1  # left of (1,1) is H
    modes[0, 1] = 7  # above is VL
    assert _i4x4_pred_mode(modes, 1, 1) == 1
    modes[1, 0] = -1  # left not Intra_4x4 -> counts as DC (2)
    assert _i4x4_pred_mode(modes, 1, 1) == 2


# ---------------------------------------------------------------------------
# End-to-end: all nine modes in one decoded macroblock
# ---------------------------------------------------------------------------


def _ipcm_mb(bw, samples, chroma=128):
    bw.ue(25)
    bw.align_zero()
    for v in samples.reshape(-1):
        bw.u(int(v), 8)
    for _ in range(128):
        bw.u(chroma, 8)


def test_all_nine_modes_decode_on_textured_neighbors():
    """2x2-MB picture: three I_PCM texture MBs, then one Intra_4x4 MB
    whose 16 blocks cycle modes (k*7+k)%9 — expectation computed by
    replaying the Z-order with the INDEPENDENT spec transcription."""
    rng = np.random.default_rng(77)
    tex = [rng.integers(0, 256, size=(16, 16)) for _ in range(3)]
    mode_of = [(3 * k + k // 2) % 9 for k in range(16)]

    bw = BitWriter()
    bw.ue(0)
    bw.ue(7)
    bw.ue(0)
    bw.u(0, 4)
    bw.ue(0)
    bw.u(0, 1)
    bw.u(0, 1)
    bw.se(0)
    bw.ue(1)
    for t in tex:
        _ipcm_mb(bw, t)
    # the Intra_4x4 MB at (1,1): mode bits against the min(A,B)
    # predictor (all neighbors are I_PCM -> DC), cbp 0
    bw.ue(0)  # mb_type I_4x4
    modes_grid = np.full((8, 8), -1, dtype=np.int64)
    for k, (brow, bcol) in enumerate(_BLK_ORDER):
        aby, abx = 4 + brow, 4 + bcol
        pm = _i4x4_pred_mode(modes_grid, abx, aby)
        mode = mode_of[k]
        if mode == pm:
            bw.u(1, 1)
        else:
            bw.u(0, 1)
            bw.u(mode if mode < pm else mode - 1, 3)
        modes_grid[aby, abx] = mode
    bw.ue(0)  # chroma DC
    bw.ue(_CBP_INTRA_INV[0])
    bw.rbsp_trailing()
    au = encode_sps(2, 2) + encode_pps(36) + _nal(5, bw.to_bytes())

    fr = h264_decode(au)
    assert (fr.y[:16, :16] == tex[0]).all()
    assert (fr.y[:16, 16:] == tex[1]).all()
    assert (fr.y[16:, :16] == tex[2]).all()

    # independent replay of the bottom-right MB
    plane = fr.y.astype(np.int64).copy()
    plane[16:, 16:] = -1  # poison: every read must be a decoded sample
    decoded = np.zeros((8, 8), dtype=bool)
    decoded[:4, :], decoded[4:, :4] = True, True
    for k, (brow, bcol) in enumerate(_BLK_ORDER):
        aby, abx = 4 + brow, 4 + bcol
        x0, y0 = 4 * abx, 4 * aby

        def p(x, y):
            v = int(plane[y0 + y, x0 + x])
            assert v >= 0, "read an undecoded sample"
            return v

        def ok(bbx, bby):
            return 0 <= bbx < 8 and 0 <= bby < 8 and bool(decoded[bby, bbx])

        want = _predict_4x4_spec(
            p, mode_of[k],
            has_left=ok(abx - 1, aby), has_top=ok(abx, aby - 1),
            has_corner=ok(abx - 1, aby - 1), has_tr=ok(abx + 1, aby - 1),
        )
        assert want is not None, f"mode {mode_of[k]} lacks samples at {k}"
        got = fr.y[4 * aby : 4 * aby + 4, 4 * abx : 4 * abx + 4]
        assert (got == np.clip(want, 0, 255)).all(), (k, mode_of[k])
        plane[4 * aby : 4 * aby + 4, 4 * abx : 4 * abx + 4] = got
        decoded[aby, abx] = True


# ---------------------------------------------------------------------------
# Fixture pictures: closed form + lattice pins
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("d", [0, 1, 5, 9, 27, 40])
def test_i4x4_fixture_matches_closed_form(d):
    mb_w, mb_h = 2 + d % 3, 2 + (d // 3) % 3
    v0 = 40 + (7 * d) % 160
    r16 = [(d + r) % 3 for r in range(1, mb_h)]
    r4 = [[[0, 1, -1][(d + 2 * r + 3 * q) % 3] for q in range(4)]
          for r in range(1, mb_h)]
    fr = h264_decode(h264_encode_i4x4_rows(mb_w, mb_h, v0, r16, r4))
    a = [v0]
    for R in range(1, mb_h):
        a.append(a[-1] + dc_offset(r16[R - 1]))
    for y in range(16 * mb_h):
        R = y // 16
        assert (fr.y[y, :16] == a[R]).all()
        b = a[R] if R == 0 else (
            a[R] + inter_dc_offset(r4[R - 1][(y % 16) // 4], 36)
        )
        assert (fr.y[y, 16:] == b).all(), (y, R)
    assert (fr.cb == 128).all() and (fr.cr == 128).all()


def test_i4x4_lattice_pins():
    # the oracle hardcodes [0, 10, -10] for the 4x4 AC path at qp 36
    assert [inter_dc_offset(v, 36) for v in (0, 1, -1)] == [0, 10, -10]


def test_i4x4_fixture_needs_interior_column():
    with pytest.raises(ValueError, match="interior"):
        h264_encode_i4x4_rows(1, 2, 80, [1], [[0, 0, 0, 0]])


def test_bad_rem_mode_still_decodes_or_raises_cleanly():
    # rem_intra4x4_pred_mode is 3 bits (0..7): every value yields a
    # legal mode 0..8 after the predictor adjustment, so a random mode
    # plan must either decode or raise H264Error (never crash)
    rng = np.random.default_rng(5)
    for _ in range(10):
        bw = BitWriter()
        bw.ue(0)
        bw.ue(7)
        bw.ue(0)
        bw.u(0, 4)
        bw.ue(0)
        bw.u(0, 1)
        bw.u(0, 1)
        bw.se(0)
        bw.ue(1)
        _ipcm_mb(bw, rng.integers(0, 256, size=(16, 16)))
        _ipcm_mb(bw, rng.integers(0, 256, size=(16, 16)))
        _ipcm_mb(bw, rng.integers(0, 256, size=(16, 16)))
        bw.ue(0)
        for _ in range(16):
            if rng.integers(0, 2):
                bw.u(1, 1)
            else:
                bw.u(0, 1)
                bw.u(int(rng.integers(0, 8)), 3)
        bw.ue(0)
        bw.ue(_CBP_INTRA_INV[0])
        bw.rbsp_trailing()
        au = encode_sps(2, 2) + encode_pps(36) + _nal(5, bw.to_bytes())
        try:
            fr = h264_decode(au)
            assert fr.y.shape == (32, 32)
        except H264Error:
            pass


def test_i4x4_byte_flip_sweep_never_hangs_or_crashes():
    au = h264_encode_i4x4_rows(3, 2, 90, [1], [[0, 1, -1, 0]],
                               deblock=True)
    ok = err = 0
    # flip every byte of the slice NAL body (skip SPS/PPS + start code)
    start = au.rfind(b"\x00\x00\x00\x01") + 5
    for i in range(start, len(au)):
        corrupt = bytearray(au)
        corrupt[i] ^= 0x55
        try:
            fr = h264_decode(bytes(corrupt))
            assert fr.y.shape == (32, 48)
            ok += 1
        except H264Error:
            err += 1
    assert ok + err == len(au) - start and err > 0
