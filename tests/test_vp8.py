"""Clean-room VP8 key-frame codec (scale/_vp8.py).

Verification layers (no reference codec exists in this container — see
the module's confidence note):

1. boolean-coder round-trips (property-style, seeded);
2. transform identities with hand-computed DC cases;
3. decoder == encoder closed-loop recon, bit-exact, across dims /
   quantizers / skip MBs / both loop filters;
4. CRAFTED bitstreams built with raw ``write_bool`` calls (tree paths
   hand-derived, not via the encoder) whose expected pixels are
   computed by hand from the spec — pinning header parse, mode trees,
   DC/V/H/TM prediction and border conventions independently;
5. loop-filter arithmetic vs a scalar spec transcription in this file;
6. WebP container routing + the multimodal image kernel.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from trackintel_spark.scale._vp8 import (
    AC_QLOOKUP,
    BoolDecoder,
    BoolEncoder,
    COEF_UPDATE_PROBS,
    DC_QLOOKUP,
    decode_vp8,
    encode_vp8,
    encode_webp_lossy,
    idct4x4,
    iwht4x4,
    _fdct4x4,
    _fwht4x4,
    _normal_filter,
    _simple_filter,
)


# ---------------------------------------------------------------------------
# 1. boolean coder
# ---------------------------------------------------------------------------


def test_bool_coder_round_trip():
    rng = random.Random(7)
    for _ in range(100):
        seq = [(rng.randint(1, 254), rng.randint(0, 1)) for _ in range(rng.randint(1, 500))]
        e = BoolEncoder()
        for p, b in seq:
            e.write_bool(p, b)
        d = BoolDecoder(e.finish())
        for p, b in seq:
            assert d.read_bool(p) == b


def test_bool_coder_literals_and_carry():
    e = BoolEncoder()
    # low-prob 1s force carry propagation through 0xff runs
    for _ in range(50):
        e.write_bool(1, 1)
    e.write_literal(16, 0xBEEF)
    e.write_signed(7, -100)
    d = BoolDecoder(e.finish())
    for _ in range(50):
        assert d.read_bool(1) == 1
    assert d.read_literal(16) == 0xBEEF
    assert d.read_signed(7) == -100


# ---------------------------------------------------------------------------
# 2. transforms
# ---------------------------------------------------------------------------


def test_idct_dc_only():
    # DC coefficient c: every output pixel is (c + 4) >> 3
    out = idct4x4([100] + [0] * 15)
    assert (out == (100 + 4) >> 3).all()
    out = idct4x4([-100] + [0] * 15)
    assert (out == (-100 + 4) >> 3).all()


def test_iwht_dc_only():
    # WHT DC c spreads (c/4-ish with the +3>>3 rounding) to all 16
    out = iwht4x4([16] + [0] * 15)
    assert (out == 2).all()


def test_transform_pairs_invert():
    rng = np.random.default_rng(5)
    for _ in range(50):
        x = rng.integers(-255, 255, (4, 4)).astype(np.float64)
        co = np.round(_fdct4x4(x)).astype(int).reshape(16)
        assert np.abs(idct4x4(co) - x).max() <= 1
        co = np.round(_fwht4x4(x)).astype(int).reshape(16)
        assert np.abs(iwht4x4(co) - x).max() <= 1


def test_quant_tables_monotone():
    assert list(DC_QLOOKUP) == sorted(DC_QLOOKUP) and len(DC_QLOOKUP) == 128
    assert list(AC_QLOOKUP) == sorted(AC_QLOOKUP) and len(AC_QLOOKUP) == 128


# ---------------------------------------------------------------------------
# 3. decoder == encoder closed loop
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape,qi,flt",
    [
        ((16, 16), 4, 0),
        ((33, 49), 4, 0),
        ((48, 64), 60, 0),
        ((32, 32), 110, 0),
        ((1, 1), 4, 0),
        ((127, 1), 8, 0),
    ],
)
def test_round_trip_exact(shape, qi, flt):
    rng = np.random.default_rng(shape[0] * 100003 + shape[1])
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    data, Yr, Ur, Vr = encode_vp8(img, qi=qi, filter_level=flt, return_recon=True)
    Y, U, V, w, h = decode_vp8(data, return_yuv=True)
    assert (w, h) == (shape[1], shape[0])
    assert (Y == Yr).all() and (U == Ur).all() and (V == Vr).all()


def test_round_trip_skip_macroblocks():
    # flat 16x16 tiles quantize to all-zero -> skip path (coeff-less MBs)
    img = np.full((32, 32, 3), 100, dtype=np.uint8)
    data, Yr, Ur, Vr = encode_vp8(img, qi=60, return_recon=True)
    assert len(data) < 80  # skip MBs carry no tokens
    Y, U, V, _, _ = decode_vp8(data, return_yuv=True)
    assert (Y == Yr).all() and (U == Ur).all() and (V == Vr).all()


def test_loop_filters_run_and_stay_bounded():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    base = decode_vp8(encode_vp8(img, qi=60, filter_level=0))
    for ftype in (0, 1):
        filt = decode_vp8(encode_vp8(img, qi=60, filter_level=30, filter_type=ftype))
        delta = np.abs(base.astype(int) - filt.astype(int))
        assert delta.any()  # the filter did something
        assert delta.max() < 64  # and stayed a smoothing, not a rewrite


def test_fidelity_tracks_quantizer():
    yy, xx = np.mgrid[0:48, 0:48]
    img = np.stack([(xx * 5) % 256, (yy * 3) % 256, ((xx + yy) * 4) % 256], -1).astype(
        np.uint8
    )
    err = []
    for qi in (0, 40, 110):
        d = decode_vp8(encode_vp8(img, qi=qi))
        err.append(np.abs(d.astype(int) - img.astype(int)).mean())
    assert err[0] < 3.0  # near-exact at the finest quantizer
    assert err[0] <= err[1] <= err[2]


# ---------------------------------------------------------------------------
# 4. crafted bitstreams (hand-derived tree paths, hand-computed pixels)
# ---------------------------------------------------------------------------


def _craft_frame(mb_w, mb_h, mode_bits_per_mb, filter_level=0, qi=4):
    """Build a key frame with raw write_bool calls: default header,
    skip=1 for every MB, per-MB ymode from explicit (prob, bit) lists.
    Chroma mode is always DC ((0bit, prob 142))."""
    e = BoolEncoder()
    e.write_literal(1, 0)  # color space
    e.write_literal(1, 0)  # clamping
    e.write_literal(1, 0)  # segmentation off
    e.write_literal(1, 0)  # normal filter
    e.write_literal(6, filter_level)
    e.write_literal(3, 0)  # sharpness
    e.write_literal(1, 0)  # lf deltas
    e.write_literal(2, 0)  # one partition
    e.write_literal(7, qi)
    for _ in range(5):
        e.write_literal(1, 0)
    e.write_literal(1, 0)  # refresh entropy
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    e.write_bool(COEF_UPDATE_PROBS[i][j][k][l], 0)
    e.write_literal(1, 1)  # mb_no_coeff_skip
    e.write_literal(8, 128)
    for mb in range(mb_w * mb_h):
        e.write_bool(128, 1)  # skip
        for p, b in mode_bits_per_mb[mb]:
            e.write_bool(p, b)  # ymode path (hand-derived)
        e.write_bool(142, 0)  # uv DC ("0")
    part1 = e.finish()
    import struct as _s

    b0 = (1 << 4) | ((len(part1) & 7) << 5)
    tag = bytes([b0, (len(part1) >> 3) & 0xFF, (len(part1) >> 11) & 0xFF])
    dims = _s.pack("<HH", mb_w * 16, mb_h * 16)
    # empty token partition: skip MBs read no tokens
    return tag + b"\x9d\x01\x2a" + dims + part1 + b"\x00\x00"


# hand-derived kf ymode tree paths (tree: -B,2,4,6,-DC,-V,-H,-TM;
# probs 145,156,163,128): DC="100", V="101", H="110", TM="111", B="0"
_DC_BITS = [(145, 1), (156, 0), (163, 0)]
_V_BITS = [(145, 1), (156, 0), (163, 1)]
_H_BITS = [(145, 1), (156, 1), (128, 0)]
_TM_BITS = [(145, 1), (156, 1), (128, 1)]


def test_crafted_all_skip_dc_frame_is_uniform():
    """Skip MBs, DC prediction, no neighbors anywhere relevant: every
    reconstructed Y/U/V sample must be exactly 128 (the spec's
    no-neighbor DC), hand-computed without the encoder."""
    data = _craft_frame(2, 2, [_DC_BITS] * 4)
    Y, U, V, w, h = decode_vp8(data, return_yuv=True)
    assert (w, h) == (32, 32)
    assert (Y == 128).all() and (U == 128).all() and (V == 128).all()


def test_crafted_v_h_tm_prediction_chain():
    """MB(0,0)=DC fills 128; MB(0,1)=H copies its left column (128);
    MB(1,0)=V copies above (128); MB(1,1)=TM with above=left=al=128
    gives 128 — so any deviation in mode trees, edge conventions or
    predictors shows up as a non-128 pixel."""
    data = _craft_frame(2, 2, [_DC_BITS, _H_BITS, _V_BITS, _TM_BITS])
    Y, U, V, _, _ = decode_vp8(data, return_yuv=True)
    assert (Y == 128).all()


def test_crafted_top_row_v_pred_uses_127_border():
    """A V_PRED macroblock on the TOP row copies the above border row,
    which the spec pins at 127 — distinguishable from DC's 128."""
    data = _craft_frame(1, 1, [_V_BITS])
    Y, _, _, _, _ = decode_vp8(data, return_yuv=True)
    assert (Y == 127).all()


def test_crafted_left_col_h_pred_uses_129_border():
    data = _craft_frame(1, 1, [_H_BITS])
    Y, _, _, _, _ = decode_vp8(data, return_yuv=True)
    assert (Y == 129).all()


def test_crafted_tm_pred_border_arithmetic():
    """TM at (0,0): pred = clamp(left + above - above_left)
    = 129 + 127 - 127 = 129 everywhere."""
    data = _craft_frame(1, 1, [_TM_BITS])
    Y, _, _, _, _ = decode_vp8(data, return_yuv=True)
    assert (Y == 129).all()


def test_crafted_uniform_frame_filter_is_noop():
    # loop filter on a perfectly flat frame must change nothing
    data = _craft_frame(2, 2, [_DC_BITS] * 4, filter_level=30)
    Y, U, V, _, _ = decode_vp8(data, return_yuv=True)
    assert (Y == 128).all() and (U == 128).all() and (V == 128).all()


# ---------------------------------------------------------------------------
# 5. loop-filter arithmetic vs scalar spec transcription
# ---------------------------------------------------------------------------


def _sc(v):
    return max(-128, min(127, v))


def _spec_subblock_filter(p1, p0, q0, q1, E, I, hev_t):
    mask = (
        abs(p1 - p0) <= I and abs(q1 - q0) <= I
        and abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= E
    )
    hev = abs(p1 - p0) > hev_t or abs(q1 - q0) > hev_t
    ps1, ps0, qs0, qs1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    fv = _sc((_sc(ps1 - qs1) if hev else 0) + 3 * (qs0 - ps0)) if mask else 0
    F1 = _sc(fv + 4) >> 3
    F2 = _sc(fv + 3) >> 3
    qs0 = _sc(qs0 - F1)
    ps0 = _sc(ps0 + F2)
    if not hev:
        u = (F1 + 1) >> 1
        qs1 = _sc(qs1 - u)
        ps1 = _sc(ps1 + u)
    return ps1 + 128, ps0 + 128, qs0 + 128, qs1 + 128


def test_subblock_filter_matches_scalar_spec():
    rng = np.random.default_rng(9)
    for _ in range(300):
        px = rng.integers(0, 256, 8)
        E, I, hev_t = int(rng.integers(1, 60)), int(rng.integers(1, 10)), int(rng.integers(0, 3))
        seg = px[None, :].astype(np.int32)
        # interior-limit terms involving p3/p2/q2/q3 must pass for the
        # scalar 4-tap comparison: set them equal to their neighbors
        seg = seg.copy()
        seg[0, 0] = seg[0, 1] = seg[0, 2]
        seg[0, 7] = seg[0, 6] = seg[0, 5]
        got = _normal_filter(seg.copy(), E, I, hev_t, mb_edge=False)[0]
        exp = _spec_subblock_filter(int(seg[0, 2]), int(seg[0, 3]), int(seg[0, 4]), int(seg[0, 5]), E, I, hev_t)
        assert tuple(got[2:6]) == exp


def test_simple_filter_matches_scalar_spec():
    rng = np.random.default_rng(21)
    for _ in range(300):
        p1, p0, q0, q1 = (int(x) for x in rng.integers(0, 256, 4))
        E = int(rng.integers(1, 80))
        seg = np.array([[p1, p0, q0, q1]], dtype=np.int32)
        got = _simple_filter(seg, E)[0]
        mask = abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= E
        ps1, ps0, qs0, qs1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
        fv = _sc(_sc(ps1 - qs1) + 3 * (qs0 - ps0)) if mask else 0
        F1 = _sc(fv + 4) >> 3
        F2 = _sc(fv + 3) >> 3
        assert got[2] == _sc(qs0 - F1) + 128 and got[1] == _sc(ps0 + F2) + 128


# ---------------------------------------------------------------------------
# 6. container + kernel integration
# ---------------------------------------------------------------------------


def test_webp_container_round_trip(monkeypatch):
    monkeypatch.setenv("SPARK_TRACKINTEL_VP8_EXPERIMENTAL", "1")
    from trackintel_spark.scale._vp8l import decode_webp

    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([(xx * 5) % 256, (yy * 3) % 256, ((xx + yy) * 4) % 256], -1).astype(
        np.uint8
    )
    rgba = decode_webp(encode_webp_lossy(img, qi=8))
    assert rgba.shape == (32, 48, 4) and (rgba[..., 3] == 255).all()
    assert np.abs(rgba[..., :3].astype(int) - img.astype(int)).mean() < 6


def test_image_decode_kernel_routes_lossy_webp(monkeypatch):
    monkeypatch.setenv("SPARK_TRACKINTEL_VP8_EXPERIMENTAL", "1")
    from trackintel_spark.scale.multimodal import _decode_image_rgb, probe_webp

    img = np.full((24, 40, 3), (10, 200, 60), dtype=np.uint8)
    payload = encode_webp_lossy(img, qi=4)
    probe = probe_webp(payload)
    assert probe["variant"] == "lossy" and (probe["width"], probe["height"]) == (40, 24)
    out = _decode_image_rgb(payload)
    assert out.shape == (24, 40, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_round_trip_multiple_token_partitions():
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (80, 64, 3), dtype=np.uint8)
    for lp in (1, 2, 3):
        data, Yr, Ur, Vr = encode_vp8(img, qi=20, log2_partitions=lp, return_recon=True)
        Y, U, V, _, _ = decode_vp8(data, return_yuv=True)
        assert (Y == Yr).all() and (U == Ur).all() and (V == Vr).all(), lp


def test_crafted_bpred_all_bdc_frame():
    """One skip B_PRED macroblock, all 16 submodes B_DC (hand-derived
    paths: ymode '0' @145, each submode '0' @KF_BMODE_PROB[0][0][0]).
    Sequential 4x4 DC recon from the 127/129 borders gives exactly
    rows 0-3 = 128 and rows 4-15 = 129 (hand-computed: first block
    (4*127 + 4*129 + 4) >> 3 = 128, blocks right of it inherit 128;
    every block from subblock-row 1 down resolves to 129)."""
    bpred_bits = [(145, 0)] + [(231, 0)] * 16
    data = _craft_frame(1, 1, [bpred_bits])
    Y, U, V, _, _ = decode_vp8(data, return_yuv=True)
    assert (Y[0:4, :] == 128).all()
    assert (Y[4:16, :] == 129).all()
    assert (U == 128).all() and (V == 128).all()


def test_crafted_segmentation_and_lf_delta_headers_parse():
    """Segmentation (map + abs feature data + tree probs) and loop-
    filter deltas in the header, per-MB segment ids in the mode stream:
    any mis-parse desyncs the boolean decoder and corrupts the ymode
    reads, so the uniform-128 expectation doubles as a desync canary.
    Segment tree paths with probs 128: seg0='00' seg1='01' seg2='10'
    seg3='11'."""
    e = BoolEncoder()
    e.write_literal(1, 0)  # color space
    e.write_literal(1, 0)  # clamping
    e.write_literal(1, 1)  # segmentation ENABLED
    e.write_literal(1, 1)  # update mb segmentation map
    e.write_literal(1, 1)  # update segment feature data
    e.write_literal(1, 1)  # absolute values
    for qv in (10, 60, 90, 120):  # per-segment quantizers (skip MBs: unused)
        e.write_literal(1, 1)
        e.write_literal(7, qv)
        e.write_bool(128, 0)  # sign +
    for lf in (0, 0, 0, 0):  # per-segment loop filter: off
        e.write_literal(1, 1)
        e.write_literal(6, lf)
        e.write_bool(128, 0)
    for _ in range(3):  # segment tree probs = 128
        e.write_literal(1, 1)
        e.write_literal(8, 128)
    e.write_literal(1, 0)  # normal filter
    e.write_literal(6, 0)  # level 0
    e.write_literal(3, 0)  # sharpness
    e.write_literal(1, 1)  # lf delta ENABLED
    e.write_literal(1, 1)  # update deltas
    for d in (3, -2, 1, 0):  # ref deltas
        e.write_literal(1, 1)
        e.write_literal(6, abs(d))
        e.write_bool(128, 1 if d < 0 else 0)
    for d in (-1, 2, 0, 4):  # mode deltas
        e.write_literal(1, 1)
        e.write_literal(6, abs(d))
        e.write_bool(128, 1 if d < 0 else 0)
    e.write_literal(2, 0)  # one token partition
    e.write_literal(7, 4)  # frame qi
    for _ in range(5):
        e.write_literal(1, 0)
    e.write_literal(1, 0)  # refresh entropy
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    e.write_bool(COEF_UPDATE_PROBS[i][j][k][l], 0)
    e.write_literal(1, 1)  # mb_no_coeff_skip
    e.write_literal(8, 128)
    seg_paths = [[(128, 0), (128, 0)], [(128, 0), (128, 1)],
                 [(128, 1), (128, 0)], [(128, 1), (128, 1)]]
    for mb in range(4):
        for p, b in seg_paths[mb]:  # segment id (one per MB: 0,1,2,3)
            e.write_bool(p, b)
        e.write_bool(128, 1)  # skip
        for p, b in _DC_BITS:
            e.write_bool(p, b)
        e.write_bool(142, 0)  # uv DC
    part1 = e.finish()
    import struct as _s

    b0 = (1 << 4) | ((len(part1) & 7) << 5)
    tag = bytes([b0, (len(part1) >> 3) & 0xFF, (len(part1) >> 11) & 0xFF])
    data = tag + b"\x9d\x01\x2a" + _s.pack("<HH", 32, 32) + part1 + b"\x00\x00"
    Y, U, V, w, h = decode_vp8(data, return_yuv=True)
    assert (w, h) == (32, 32)
    assert (Y == 128).all() and (U == 128).all() and (V == 128).all()


def test_bpred_modes_match_spec_tables():
    """Every B_PRED subblock predictor vs the spec's per-pixel formula
    tables, transcribed here independently (avg2/avg3 over above A0-A7,
    left L0-L3, above-left X). Distinct prime-ish inputs so any index
    slip changes some pixel."""
    from trackintel_spark.scale._vp8 import _bpred4

    A = [13, 29, 47, 61, 79, 101, 113, 131]  # above + above-right
    L = [17, 37, 53, 73]
    X = 97

    def a2(a, b):
        return (a + b + 1) >> 1

    def a3(a, b, c):
        return (a + 2 * b + c + 2) >> 2

    exp = {}
    exp[0] = [[(sum(A[:4]) + sum(L) + 4) >> 3] * 4] * 4  # B_DC
    exp[1] = [[max(0, min(255, A[c] + L[r] - X)) for c in range(4)] for r in range(4)]  # B_TM
    ve = [a3(X, A[0], A[1]), a3(A[0], A[1], A[2]), a3(A[1], A[2], A[3]), a3(A[2], A[3], A[4])]
    exp[2] = [ve] * 4  # B_VE
    he = [a3(X, L[0], L[1]), a3(L[0], L[1], L[2]), a3(L[1], L[2], L[3]), a3(L[2], L[3], L[3])]
    exp[3] = [[he[r]] * 4 for r in range(4)]  # B_HE
    ld = [a3(A[i], A[i + 1], A[i + 2]) for i in range(6)] + [a3(A[6], A[7], A[7])]
    exp[4] = [[ld[r + c] for c in range(4)] for r in range(4)]  # B_LD
    rd = [a3(L[3], L[2], L[1]), a3(L[2], L[1], L[0]), a3(L[1], L[0], X),
          a3(L[0], X, A[0]), a3(X, A[0], A[1]), a3(A[0], A[1], A[2]), a3(A[1], A[2], A[3])]
    exp[5] = [[rd[3 + c - r] for c in range(4)] for r in range(4)]  # B_RD
    vr0 = [a2(X, A[0]), a2(A[0], A[1]), a2(A[1], A[2]), a2(A[2], A[3])]
    vr1 = [a3(L[0], X, A[0]), a3(X, A[0], A[1]), a3(A[0], A[1], A[2]), a3(A[1], A[2], A[3])]
    exp[6] = [vr0, vr1,
              [a3(L[1], L[0], X)] + vr0[:3],
              [a3(L[2], L[1], L[0])] + vr1[:3]]  # B_VR
    vl0 = [a2(A[0], A[1]), a2(A[1], A[2]), a2(A[2], A[3]), a2(A[3], A[4])]
    vl1 = [a3(A[0], A[1], A[2]), a3(A[1], A[2], A[3]), a3(A[2], A[3], A[4]), a3(A[3], A[4], A[5])]
    exp[7] = [vl0, vl1,
              vl0[1:] + [a3(A[4], A[5], A[6])],
              vl1[1:] + [a3(A[5], A[6], A[7])]]  # B_VL
    hd0 = [a2(X, L[0]), a3(A[0], X, L[0]), a3(A[1], A[0], X), a3(A[2], A[1], A[0])]
    hd1 = [a2(L[0], L[1]), a3(X, L[0], L[1])] + hd0[:2]
    hd2 = [a2(L[1], L[2]), a3(L[0], L[1], L[2])] + hd1[:2]
    hd3 = [a2(L[2], L[3]), a3(L[1], L[2], L[3])] + hd2[:2]
    exp[8] = [hd0, hd1, hd2, hd3]  # B_HD
    hu = [a2(L[0], L[1]), a3(L[0], L[1], L[2]), a2(L[1], L[2]), a3(L[1], L[2], L[3]),
          a2(L[2], L[3]), a3(L[2], L[3], L[3]), L[3], L[3], L[3], L[3]]
    exp[9] = [[hu[min(2 * r + c, 9)] for c in range(4)] for r in range(4)]  # B_HU

    a = np.array(A[:4], dtype=np.int32)
    ar = np.array(A[4:], dtype=np.int32)
    ll = np.array(L, dtype=np.int32)
    for mode in range(10):
        got = _bpred4(mode, a, ll, X, ar)
        assert got.tolist() == exp[mode], f"mode {mode}: {got.tolist()} != {exp[mode]}"


def test_corrupt_input_raises_valueerror_fast():
    """Crawl-data hygiene: corrupt/truncated/garbage VP8 payloads must
    raise ValueError (the per-row error the Spark kernels absorb) —
    never IndexError/hangs — and must fail FAST even when the corrupted
    header claims a 16383x16383 raster (the raster-vs-bytes bound)."""
    import time

    rng = random.Random(77)
    img = (np.arange(32 * 32 * 3) % 256).astype(np.uint8).reshape(32, 32, 3)
    good = bytearray(encode_vp8(img, qi=30))
    t0 = time.time()
    for _ in range(150):
        data = bytearray(good)
        for _ in range(rng.randint(1, 10)):
            data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
        try:
            decode_vp8(bytes(data))
        except ValueError:
            pass
    for n in (0, 3, 9, 10, 40, 200):
        try:
            decode_vp8(bytes([rng.randrange(256) for _ in range(n)]))
        except ValueError:
            pass
    for cut in range(0, len(good), 31):
        try:
            decode_vp8(bytes(good[:cut]))
        except ValueError:
            pass
    assert time.time() - t0 < 30


def test_vp8x_alpha_round_trip_all_filters(monkeypatch):
    monkeypatch.setenv("SPARK_TRACKINTEL_VP8_EXPERIMENTAL", "1")
    """VP8X stills with a raw ALPH plane: all four prediction filters
    round-trip the alpha exactly (mod-256 residuals are lossless), the
    lossy RGB matches the encoder recon, and animation stays gated."""
    from trackintel_spark.scale._vp8 import encode_webp_vp8x
    from trackintel_spark.scale._vp8l import decode_webp

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    alpha = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    for flt in range(4):
        out = decode_webp(encode_webp_vp8x(img, alpha, qi=20, alph_filter=flt))
        assert out.shape == (24, 40, 4)
        assert (out[:, :, 3] == alpha).all(), f"filter {flt}"
    out = decode_webp(encode_webp_vp8x(img, None, qi=20))
    assert (out[:, :, 3] == 255).all()
    # flipping the animation flag on a still (r12: animations decode
    # now) leaves a VP8X with ZERO ANMF frames — a clean ValueError
    anim = bytearray(encode_webp_vp8x(img, alpha, qi=20))
    anim[20] |= 0x02  # animation flag inside the VP8X body
    with pytest.raises(ValueError, match="no ANMF"):
        decode_webp(bytes(anim))


def test_external_vp8_gate_default_off():
    """r12 ADVICE: the decoder's default entropy tables are partially
    transcribed, and a range decoder with wrong probabilities
    mis-decodes SILENTLY — so externally-encoded lossy WebP must not
    reach image_features / resize_images by default. The gate is the
    container path: without the env opt-in decode_webp raises the
    per-row ValueError (kernels absorb it), and resize passes the
    payload through UNCHANGED instead of re-encoding garbage over it.
    Module-produced streams still round-trip via decode_vp8 directly."""
    import os

    import pytest

    from trackintel_spark.scale._vp8l import decode_webp
    from trackintel_spark.scale.multimodal import _decode_image_rgb

    assert os.environ.get("SPARK_TRACKINTEL_VP8_EXPERIMENTAL") != "1"
    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    lossy = encode_webp_lossy(img, qi=4)
    with pytest.raises(ValueError, match="experimental"):
        decode_webp(lossy)
    with pytest.raises(ValueError, match="experimental"):
        _decode_image_rgb(lossy)
    # direct frame decode (module-internal contract) stays available
    body = lossy[20:]  # strip RIFF/WEBP/VP8 -chunk header
    assert decode_vp8(body).shape == (16, 16, 3)


def test_truncated_partition_size_table_raises_valueerror():
    """r12 ADVICE: a frame whose header claims log2_parts > 0 but is cut
    inside the 3-byte partition-size table must raise the decoder
    contract's ValueError, never IndexError (which would fail the whole
    Spark task)."""
    import pytest

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    data = encode_vp8(img, qi=4, log2_partitions=2)
    b0, b1, b2 = data[0], data[1], data[2]
    part1 = (b0 >> 5) | (b1 << 3) | (b2 << 11)
    # cut mid-way through the size triplets (3 partitions -> 9 bytes)
    for cut in range(10 + part1, min(10 + part1 + 9, len(data))):
        with pytest.raises(ValueError):
            decode_vp8(data[:cut])


def test_quantizer_and_token_tables_second_transcription():
    """r12 (r11 verdict #7): the high-confidence constant tables,
    transcribed a SECOND time from RFC 6386 into this test (not
    imported, not derived from the module), pin against the module's
    copies — a transcription typo in either copy fails loudly. The
    partially-transcribed probability tables (DEFAULT_COEF_PROBS tail,
    COEF_UPDATE_PROBS, KF_BMODE_PROB contexts) are deliberately NOT
    pinned here: they are documented stubs behind the external-VP8
    gate, and pinning a stub would launder it into a spec claim."""
    from trackintel_spark.scale import _vp8 as m

    # RFC 6386 section 14.1 dc_qlookup / ac_qlookup, second transcription
    dc_q = (
        4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
        18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
        29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
        44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
        59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
        75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
        91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
        122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
    )
    ac_q = (
        4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
        20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
        36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
        52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
        78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
        110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
        155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
        213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
    )
    assert tuple(m.DC_QLOOKUP) == dc_q
    assert tuple(m.AC_QLOOKUP) == ac_q

    # section 13.2 token extra-bit probabilities (Pcat1..Pcat6)
    assert m.CAT_PROBS == {
        m.TOK_CAT1: (159,),
        m.TOK_CAT2: (165, 145),
        m.TOK_CAT3: (173, 148, 140),
        m.TOK_CAT4: (176, 155, 140, 135),
        m.TOK_CAT5: (180, 157, 141, 134, 130),
        m.TOK_CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
    }
    # extra-bit base values: EOB-relative bases 5,7,11,19,35,67
    assert m.CAT_BASE == {m.TOK_CAT1: 5, m.TOK_CAT2: 7, m.TOK_CAT3: 11,
                          m.TOK_CAT4: 19, m.TOK_CAT5: 35, m.TOK_CAT6: 67}

    # section 13.3 coefficient band map + 8.1 zigzag
    assert m.COEF_BANDS == (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
    assert m.ZIGZAG == (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

    # mode trees (sections 11.2, 11.3): structural re-transcription
    assert m.KF_YMODE_TREE == (-m.B_PRED, 2, 4, 6, -m.DC_PRED, -m.V_PRED,
                               -m.H_PRED, -m.TM_PRED)
    assert m.KF_YMODE_PROB == (145, 156, 163, 128)
    assert m.UV_MODE_TREE == (-m.DC_PRED, 2, -m.V_PRED, 4, -m.H_PRED, -m.TM_PRED)
    assert m.KF_UV_MODE_PROB == (142, 114, 183)
    assert m.COEF_TREE == (
        -m.TOK_EOB, 2, -m.TOK_0, 4, -m.TOK_1, 6, 8, 12,
        -m.TOK_2, 10, -m.TOK_3, -m.TOK_4, 14, 16,
        -m.TOK_CAT1, -m.TOK_CAT2, 18, 20, -m.TOK_CAT3, -m.TOK_CAT4,
        -m.TOK_CAT5, -m.TOK_CAT6,
    )


def test_vp8_golden_files_env_gated():
    """Staged external validation (r11 verdict #7): when a reference
    codec ever lands, drop pairs <name>.webp + <name>.npy (RGB uint8
    array from the reference decoder) into a directory and point
    SPARK_TRACKINTEL_VP8_GOLDEN_DIR at it — this test then decodes
    every .webp with the clean-room decoder and requires near-exact
    pixels. Until then it skips, keeping the harness checked in."""
    import os

    import pytest

    d = os.environ.get("SPARK_TRACKINTEL_VP8_GOLDEN_DIR")
    if not d:
        pytest.skip("no reference-codec golden dir configured")
    from trackintel_spark.scale._vp8l import decode_webp

    cases = [f for f in os.listdir(d) if f.endswith(".webp")]
    assert cases, "golden dir has no .webp files"
    for f in cases:
        want = np.load(os.path.join(d, f[:-5] + ".npy"))
        got = decode_webp(open(os.path.join(d, f), "rb").read())[:, :, :3]
        assert got.shape == want.shape, f
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, f
