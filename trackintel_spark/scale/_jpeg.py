"""Baseline + progressive JPEG (ITU-T T.81 / JFIF) decode + encode,
numpy + stdlib.

JPEG needs no codec LIBRARY either — sequential DCT is Huffman coding
+ dequantize + 8x8 inverse DCT + chroma upsample, all of which numpy
expresses directly; progressive (SOF2, r12) adds multi-scan spectral
selection + successive approximation (T.81 Annex G) over the same
reconstruction. This closes the last common web image formats in the
real-decode family (PPM/PNG/WAV siblings in multimodal.py);
arithmetic/12-bit/lossless/hierarchical variants raise ValueError and
stay on the documented stub path.

Decoder scope: baseline (SOF0/1) and progressive (SOF2), 8-bit, 1 or
3 components, any sampling factors, restart intervals, EOB runs.
Encoder scope (fixture/test siblings, like encode_png):
:func:`encode_jpeg` — 4:4:4 or 4:2:0, Annex K example tables,
optional restart interval; :func:`encode_jpeg_progressive` — the same
quantized coefficients through a 10-scan progressive script, so the
two encodings of any image must decode pixel-identically (the
strongest internal cross-check available without a reference codec:
the scan structures share no code, only the coefficients).

Reference: reference io/ has no image codecs (multimodal columns are
an extension surface); tables and layout follow the public T.81 spec.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 example quantization tables (natural order via
# zigzag below; stored here in zigzag order exactly as they'd ship in
# a DQT segment).
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 DCT basis: C[u, x] = c(u) * cos((2x+1) u pi / 16) / 2 — IDCT is
# C.T @ B @ C, FDCT is C @ X @ C.T, both exactly orthonormal.
_C = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _canonical_codes(bits, vals):
    """(code, length) per symbol in canonical Huffman order (T.81 C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """(length, code) -> symbol lookup for the bit-reader."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes with 0xFF00
    unstuffing and RSTn awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # a real marker: pad with zero bits, do not consume
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Skip to just after the next RSTn marker (restart handling)."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JFIF payload to
    (h, w, 3) uint8 RGB (grayscale replicates). Raises ValueError on
    arithmetic, 12-bit, hierarchical, or malformed input — corrupt
    streams (bit
    flips, truncation: normal in crawl corpora) always surface as
    ValueError, the per-row error the Spark kernels absorb, never as a
    stray IndexError/KeyError that would fail the whole task."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, KeyError, OverflowError, struct.error) as e:
        raise ValueError(f"corrupt JPEG stream: {type(e).__name__}: {e}") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    prog = None  # progressive coefficient state, allocated at first SOS
    restart = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        ln = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        seg = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZZ] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            sof = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0/1) and progressive (SOF2) DCT supported")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if len(seg) < 4 + 2 * ns:
                raise ValueError("truncated SOS header")
            if not sof["progressive"]:
                sel = {}
                for c in range(ns):
                    cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                    sel[cs] = (tda >> 4, tda & 0xF)
                return _decode_scan(payload, pos, sof, sel, qt, huff, restart)
            # progressive: one of MANY scans — decode it into the
            # persistent per-component coefficient arrays, then keep
            # walking markers (DHT/DRI may be redefined between scans)
            if prog is None:
                prog = _prog_state(sof, len(payload))
            # crawl-data hygiene: each scan is O(blocks) work, so a
            # crafted file with thousands of near-empty scans is a
            # per-record DoS. Real encoders emit ~10; cap generously
            # (libjpeg-turbo caps at 100).
            prog["scans"] = prog.get("scans", 0) + 1
            if prog["scans"] > 100:
                raise ValueError("more than 100 progressive scans (likely crafted input)")
            scomps = []
            for c in range(ns):
                cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                match = [cc for cc in sof["comps"] if cc["id"] == cs]
                if not match:
                    raise ValueError("scan references unknown component")
                scomps.append((match[0], tda >> 4, tda & 0xF))
            ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos = _decode_progressive_scan(
                payload, pos, prog, scomps, ss, se, ahl >> 4, ahl & 0xF,
                huff, restart,
            )
        elif marker == 0xD9:  # EOI
            break
    if prog is not None:
        maxh = max(c["h"] for c in sof["comps"])
        maxv = max(c["v"] for c in sof["comps"])
        return _reconstruct(sof["comps"], qt, maxh, maxv, sof["h"], sof["w"])
    raise ValueError("no scan data found")


def _decode_scan(payload, pos, sof, sel, qt, huff, restart):
    h, w, comps = sof["h"], sof["w"], sof["comps"]
    if h < 1 or w < 1:
        raise ValueError("invalid dimensions")
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError(f"invalid sampling factors {c['h']}x{c['v']}")
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    for c in comps:
        # integer-replication upsampling only handles factors that
        # divide the max (1:1, 2:1, 4:1, ...) — non-divisible combos
        # (e.g. 3:2) would build mis-sized planes and die in np.stack
        # with an opaque shape error, so reject them up front.
        if maxh % c["h"] != 0 or maxv % c["v"] != 0:
            raise ValueError(
                "unsupported sampling factors: %dx%d vs max %dx%d"
                % (c["h"], c["v"], maxh, maxv)
            )
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    # crawl-data hygiene: a bit-flipped SOF can claim a 65535x65535
    # raster that takes minutes of numpy work before failing. Baseline
    # entropy coding spends >= 2 bits per 8x8 block (one DC code), so a
    # frame whose block count exceeds 4x the remaining entropy BYTES is
    # structurally impossible — reject it in microseconds instead.
    total_blocks = sum(mcux * c["h"] * mcuy * c["v"] for c in comps)
    if total_blocks > max(4096, (len(payload) - pos) * 4):
        raise ValueError(
            f"implausible {w}x{h} raster for {len(payload) - pos} "
            "entropy bytes (likely corrupt SOF)"
        )
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        c["coef"] = np.zeros((bh, bw, 8, 8), dtype=np.int64)
        if c["tq"] not in qt:
            raise ValueError("missing quantization table")
        td, ta = sel[c["id"]]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("missing Huffman table")
        c["dc_tbl"], c["ac_tbl"] = huff[(0, td)], huff[(1, ta)]

    reader = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.align_to_marker()
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(reader, c["dc_tbl"])
                        diff = _extend(reader.receive(t), t)
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, c["ac_tbl"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC coefficient run past block end")
                            blk[_ZZ[k]] = _extend(reader.receive(s), s)
                            k += 1
                        c["coef"][my * c["v"] + by, mx * c["h"] + bx] = blk.reshape(8, 8)

    return _reconstruct(comps, qt, maxh, maxv, h, w)


def _reconstruct(comps, qt, maxh, maxv, h, w):
    """Dequantize + IDCT + upsample + color-convert decoded coefficient
    arrays — shared by the baseline and progressive paths (identical
    coefficients MUST give identical pixels; the progressive round-trip
    tests rely on this)."""
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("missing quantization table")
        deq = c["coef"] * qt[c["tq"]][None, None]
        # one vectorized IDCT over every block: (bh, bw, 8, 8)
        spatial = np.einsum("xu,ijuv,vy->ijxy", _C.T, deq.astype(np.float64), _C)
        bh, bw = deq.shape[:2]
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        # upsample to full-resolution grid, then crop
        plane = np.repeat(np.repeat(plane, maxv // c["v"], axis=0), maxh // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# progressive DCT (SOF2) — ITU-T T.81 Annex G spectral selection +
# successive approximation. Scans accumulate into persistent
# per-component coefficient arrays; reconstruction is shared with the
# baseline path, so a complete progressive encoding of the same
# quantized coefficients MUST decode to pixel-identical output (the
# round-trip tests pin exactly that).


def _prog_state(sof, payload_len):
    """Allocate per-component coefficient arrays + block grids for a
    progressive frame (called at the first SOS)."""
    h, w, comps = sof["h"], sof["w"], sof["comps"]
    if h < 1 or w < 1:
        raise ValueError("invalid dimensions")
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError(f"invalid sampling factors {c['h']}x{c['v']}")
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    for c in comps:
        if maxh % c["h"] != 0 or maxv % c["v"] != 0:
            raise ValueError(
                "unsupported sampling factors: %dx%d vs max %dx%d"
                % (c["h"], c["v"], maxh, maxv)
            )
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    # crawl-data hygiene (same bound as baseline, against the WHOLE
    # payload: the mandatory first DC scan spends >= 2 bits per block)
    total_blocks = sum(mcux * c["h"] * mcuy * c["v"] for c in comps)
    if total_blocks > max(4096, payload_len * 4):
        raise ValueError(
            f"implausible {w}x{h} raster for {payload_len} "
            "payload bytes (likely corrupt SOF)"
        )
    for c in comps:
        c["coef"] = np.zeros((mcuy * c["v"], mcux * c["h"], 8, 8), dtype=np.int64)
        # non-interleaved (single-component) scans cover the component's
        # OWN block grid, not the MCU-padded one (T.81 A.2.2)
        comp_w = -(-(w * c["h"]) // maxh)
        comp_h = -(-(h * c["v"]) // maxv)
        c["cbw"] = -(-comp_w // 8)
        c["cbh"] = -(-comp_h // 8)
    return {"mcux": mcux, "mcuy": mcuy}


def _next_marker_pos(data, pos):
    """Position of the next real marker at/after ``pos``, skipping
    stuffed 0xFF00 pairs, fill 0xFF bytes and stray RSTn."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            pos += 2
        elif nxt == 0xFF:
            pos += 1
        else:
            return pos
    raise ValueError("unterminated scan")


def _decode_progressive_scan(payload, pos, prog, scomps, ss, se, ah, al, huff, restart):
    """Decode one progressive scan into the components' coefficient
    arrays; returns the payload position of the next marker."""
    if al > 13 or ah > 14 or se > 63 or ss > se:
        raise ValueError("invalid spectral selection / successive approximation")
    reader = _BitReader(payload, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        tbls = []
        for c, td, _ta in scomps:
            if ah == 0:
                if (0, td) not in huff:
                    raise ValueError("missing Huffman table")
                tbls.append(huff[(0, td)])
            else:
                tbls.append(None)  # DC refinement: raw bits, no table
        pred = [0] * len(scomps)

        def dc_one(ci, blk):
            if ah == 0:
                t = _huff_decode(reader, tbls[ci])
                pred[ci] += _extend(reader.receive(t), t)
                blk[0, 0] = pred[ci] << al
            elif reader.read_bit():
                blk[0, 0] = int(blk[0, 0]) | (1 << al)

        cnt = 0
        if len(scomps) > 1:  # interleaved MCU order
            for my in range(prog["mcuy"]):
                for mx in range(prog["mcux"]):
                    if restart and cnt and cnt % restart == 0:
                        reader.align_to_marker()
                        pred = [0] * len(scomps)
                    cnt += 1
                    for ci, (c, _td, _ta) in enumerate(scomps):
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_one(ci, c["coef"][my * c["v"] + by, mx * c["h"] + bx])
        else:  # non-interleaved: the component's own block grid
            c = scomps[0][0]
            for by in range(c["cbh"]):
                for bx in range(c["cbw"]):
                    if restart and cnt and cnt % restart == 0:
                        reader.align_to_marker()
                        pred = [0] * len(scomps)
                    cnt += 1
                    dc_one(0, c["coef"][by, bx])
        return _next_marker_pos(payload, reader.pos)

    # AC scan: always single-component, non-interleaved (T.81 G.1.1.1.1)
    if len(scomps) != 1:
        raise ValueError("progressive AC scan must have exactly one component")
    c, _td, ta = scomps[0]
    if (1, ta) not in huff:
        raise ValueError("missing Huffman table")
    actbl = huff[(1, ta)]
    eobrun = 0
    cnt = 0
    for by in range(c["cbh"]):
        for bx in range(c["cbw"]):
            if restart and cnt and cnt % restart == 0:
                reader.align_to_marker()
                eobrun = 0
            cnt += 1
            blk = c["coef"][by, bx].reshape(64)
            if ah == 0:
                eobrun = _ac_first_block(reader, actbl, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(reader, actbl, blk, ss, se, al, eobrun)
    return _next_marker_pos(payload, reader.pos)


def _ac_first_block(reader, actbl, blk, ss, se, al, eobrun):
    """First AC scan for one block (T.81 G.1.2.2): EOB runs, ZRL, and
    point-transformed coefficients shifted up by Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, actbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC coefficient run past band end")
        blk[_ZZ[k]] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, actbl, blk, ss, se, al, eobrun):
    """AC refinement scan for one block (T.81 G.1.2.3): newly-nonzero
    coefficients arrive as +-1<<Al; already-nonzero ones receive one
    correction bit each, interleaved in scan order."""
    p1 = 1 << al

    def correct(k):
        cval = int(blk[_ZZ[k]])
        if cval != 0:
            if reader.read_bit() and (abs(cval) & p1) == 0:
                blk[_ZZ[k]] = cval + (p1 if cval > 0 else -p1)
            return True
        return False

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, actbl)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    # unlike the first-scan case, the run INCLUDES this
                    # block: the tail-correction loop below handles it
                    # and then decrements
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid magnitude in AC refinement scan")
                val = p1 if reader.read_bit() else -p1
            while k <= se:
                if not correct(k):
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[_ZZ[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            correct(k)
            k += 1
        eobrun -= 1
    return eobrun


# --------------------------------------------------------------------------
# encoder (fixture sibling)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _encode_block(bw_, blk_zz, pred, dc_codes, ac_codes):
    diff = int(blk_zz[0]) - pred
    t = int(diff).bit_length() if diff != 0 else 0
    mag = diff if diff >= 0 else diff + (1 << t) - 1
    code, ln = dc_codes[t]
    bw_.write(code, ln)
    if t:
        bw_.write(mag & ((1 << t) - 1), t)
    run = 0
    last_nz = int(np.max(np.nonzero(blk_zz)[0])) if np.any(blk_zz[1:]) else 0
    for k in range(1, 64):
        v = int(blk_zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                code, ln = ac_codes[0xF0]
                bw_.write(code, ln)
                run = 0
            continue
        s = abs(v).bit_length()
        mag = v if v >= 0 else v + (1 << s) - 1
        code, ln = ac_codes[(run << 4) | s]
        bw_.write(code, ln)
        bw_.write(mag & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw_.write(code, ln)
    return int(blk_zz[0])


def _prep_quantized(img: np.ndarray, subsample: bool):
    """Color-convert + pad + FDCT + quantize to MCU-padded block arrays
    — shared by the baseline and progressive encoders, so a progressive
    encoding of the same image carries IDENTICAL quantized coefficients
    (the cross-encoder pixel-equality tests rest on this)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    img = img.astype(np.float64)
    if c == 3:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            planes = [(y, 2, 2, 0), (_half(cb), 1, 1, 1), (_half(cr), 1, 1, 1)]
            maxh = maxv = 2
        else:
            planes = [(y, 1, 1, 0), (cb, 1, 1, 1), (cr, 1, 1, 1)]
            maxh = maxv = 1
    elif c == 1:
        planes = [(img[:, :, 0], 1, 1, 0)]
        maxh = maxv = 1
    else:
        raise ValueError("expected 1 or 3 channels")

    qts = [_Q_LUMA, _Q_CHROMA]
    # pad each plane to whole MCUs (edge replicate) and pre-block FDCT
    mcux_n = -(-w // (8 * maxh))
    mcuy_n = -(-h // (8 * maxv))
    blocks = []
    for plane, hs, vs, tq in planes:
        ph = mcuy_n * 8 * vs
        pw = mcux_n * 8 * hs
        p = plane
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        bh, bw_ = ph // 8, pw // 8
        tiles = p.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3) - 128.0
        coef = np.einsum("ux,ijxy,yv->ijuv", _C, tiles, _C.T)
        q = np.round(coef / qts[tq][None, None]).astype(np.int64)
        blocks.append((q, hs, vs, tq))
    return h, w, planes, blocks, maxh, maxv


def encode_jpeg(img: np.ndarray, subsample: bool = False, restart_interval: int = 0) -> bytes:
    """Baseline JFIF encoder over the Annex K tables: 4:4:4 by default,
    4:2:0 with ``subsample=True``, optional restart markers. Fixture
    sibling of :func:`decode_jpeg` (the pair is round-trip-tested; the
    decoder is the product surface)."""
    h, w, planes, blocks, maxh, maxv = _prep_quantized(img, subsample)
    dc_codes = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]
    qts = [_Q_LUMA, _Q_CHROMA]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, qtbl in enumerate(qts[: 2 if len(planes) > 1 else 1]):
        zz = qtbl.reshape(64)[_ZZ]  # DQT ships zigzag order
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(int(v) for v in zz)
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (_, hs, vs, tq) in enumerate(planes):
        sof += bytes([i + 1, (hs << 4) | vs, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc_th, (bits, vals) in (
        ((0x00, _DC_LUMA), (0x10, _AC_LUMA)) + (((0x01, _DC_CHROMA), (0x11, _AC_CHROMA)) if nc > 1 else ())
    ):
        data = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(data)) + data
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        td_ta = 0x00 if i == 0 else 0x11
        sos += bytes([i + 1, td_ta])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw_ = _BitWriter()
    pred = [0] * nc
    mcux = blocks[0][0].shape[1] // planes[0][1]
    mcuy = blocks[0][0].shape[0] // planes[0][2]
    inv_zz = _ZZ  # blk.reshape(64)[_ZZ] produces zigzag order
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw_.pad()
                out += bw_.out
                bw_ = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = [0] * nc
            mcu_count += 1
            for i, (q, hs, vs, tq) in enumerate(blocks):
                for by in range(vs):
                    for bx in range(hs):
                        blk = q[my * vs + by, mx * hs + bx].reshape(64)[inv_zz]
                        pred[i] = _encode_block(
                            bw_, blk, pred[i],
                            dc_codes[0 if i == 0 else 1], ac_codes[0 if i == 0 else 1],
                        )
    bw_.pad()
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# progressive encoder (fixture sibling of the SOF2 decoder)
#
# Universal fixed-length Huffman tables: every symbol present (DC 0..15
# at 5 bits, AC 0x00..0xFF at 9/10 bits), Kraft sum < 1 so no code is
# all ones (T.81 C.2). Spec-valid, deliberately inefficient, and
# deliberately DIFFERENT from the baseline encoder's Annex K tables —
# the decoder's generic-DHT path gets exercised, and progressive EOB/
# refinement symbols (absent from Annex K) are all encodable.

_DC_UNIV = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(16)))
_AC_UNIV = (
    [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
    list(range(255)) + [255],
)


class _ScanWriter:
    """One scan's entropy output: a _BitWriter plus restart-marker
    bookkeeping shared by every progressive scan emitter."""

    def __init__(self, out: bytearray, restart_interval: int):
        self.out = out
        self.ri = restart_interval
        self.bw = _BitWriter()
        self.cnt = 0
        self.rst = 0

    def due(self) -> bool:
        """True when the NEXT unit_boundary() will emit a restart —
        AC emitters must flush their pending EOB run before that."""
        return bool(self.ri) and self.cnt > 0 and self.cnt % self.ri == 0

    def unit_boundary(self) -> bool:
        """Call before each MCU/block; emits RSTn when due. True means
        a restart was emitted (caller resets its pred/EOB state)."""
        due = self.due()
        if due:
            self.bw.pad()
            self.out += self.bw.out
            self.bw = _BitWriter()
            self.out += bytes([0xFF, 0xD0 + (self.rst % 8)])
            self.rst += 1
        self.cnt += 1
        return due

    def finish(self):
        self.bw.pad()
        self.out += self.bw.out


def _emit_dc_scan(out, blocks, al, ah, dc_codes, restart_interval):
    """DC scan, first (Ah=0: Huffman-coded diffs of coef>>Al) or
    refinement (Ah>0: one raw bit per block). Interleaved MCU order —
    for a single component maxh=maxv=1 makes this the block grid too."""
    sw = _ScanWriter(out, restart_interval)
    pred = [0] * len(blocks)
    q0, hs0, vs0, _ = blocks[0]
    mcuy = q0.shape[0] // vs0
    mcux = q0.shape[1] // hs0
    for my in range(mcuy):
        for mx in range(mcux):
            if sw.unit_boundary():
                pred = [0] * len(blocks)
            for i, (q, hs, vs, _tq) in enumerate(blocks):
                for by in range(vs):
                    for bx in range(hs):
                        v = int(q[my * vs + by, mx * hs + bx][0, 0])
                        if ah:
                            sw.bw.write((v >> al) & 1, 1)
                            continue
                        d = (v >> al) - pred[i]
                        pred[i] = v >> al
                        t = abs(d).bit_length()
                        code, ln = dc_codes[t]
                        sw.bw.write(code, ln)
                        if t:
                            mag = d if d >= 0 else d + (1 << t) - 1
                            sw.bw.write(mag & ((1 << t) - 1), t)
    sw.finish()


def _emit_ac_first(out, q, cbw, cbh, ss, se, al, ac_codes, restart_interval):
    """First AC scan over one component's own block grid: ZRL for runs
    of 16+, point-transformed magnitudes, and BATCHED EOB runs across
    blocks (EOBn symbols, r appended bits) like real encoders emit —
    the decoder's eobrun>1 path gets exercised on every smooth image."""
    sw = _ScanWriter(out, restart_interval)
    run = 0

    def flush_run():
        nonlocal run
        if run:
            r = run.bit_length() - 1
            c_, l_ = ac_codes[r << 4]
            sw.bw.write(c_, l_)
            if r:
                sw.bw.write(run - (1 << r), r)
            run = 0

    for by in range(cbh):
        for bx in range(cbw):
            if sw.due():  # decoder resets its EOB run at RSTn
                flush_run()
            sw.unit_boundary()
            blk = q[by, bx].reshape(64)[_ZZ]
            r = 0
            emitted = False
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = abs(v) >> al  # AC point transform truncates toward 0
                if t == 0:
                    r += 1
                    continue
                if not emitted:
                    flush_run()  # run ends at the first coded block
                    emitted = True
                while r > 15:
                    c_, l_ = ac_codes[0xF0]
                    sw.bw.write(c_, l_)
                    r -= 16
                s = t.bit_length()
                sv = t if v > 0 else -t
                mag = sv if sv >= 0 else sv + (1 << s) - 1
                c_, l_ = ac_codes[(r << 4) | s]
                sw.bw.write(c_, l_)
                sw.bw.write(mag & ((1 << s) - 1), s)
                r = 0
            if not emitted or r:
                # whole band zero, or a coded block with a zero tail:
                # (re)start / extend the EOB run
                run += 1
                if run == 0x7FFF:  # r<=14: the largest expressible run
                    flush_run()
    flush_run()
    sw.finish()


def _emit_ac_refine(out, q, cbw, cbh, ss, se, al, ac_codes, restart_interval):
    """AC refinement scan (Ah=Al+1): newly-nonzero coefficients as
    run/1 symbols + sign, correction bits for history-nonzero ones
    buffered and flushed after each symbol — bit-exact mirror of the
    decoder's interleaved read order (T.81 G.1.2.3)."""
    ah = al + 1
    sw = _ScanWriter(out, restart_interval)
    run = 0
    runbits = []  # correction bits the decoder reads in its EOB tail

    def flush_run():
        nonlocal run, runbits
        if run:
            r = run.bit_length() - 1
            c_, l_ = ac_codes[r << 4]
            sw.bw.write(c_, l_)
            if r:
                sw.bw.write(run - (1 << r), r)
            for bit in runbits:
                sw.bw.write(bit, 1)
            run = 0
            runbits = []

    for by in range(cbh):
        for bx in range(cbw):
            if sw.due():  # decoder resets its EOB run at RSTn
                flush_run()
            sw.unit_boundary()
            blk = q[by, bx].reshape(64)[_ZZ]
            # history-nonzero <=> t > 1 (Ah = Al+1, so a coefficient
            # that was nonzero at Ah has abs >> Al >= 2); t == 1 is
            # always newly nonzero
            ts = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            if 1 not in ts:
                # no symbols to emit: the whole band joins the EOB run;
                # its history coefficients' correction bits are read in
                # the decoder's per-block tail loop, in scan order
                run += 1
                runbits.extend(t & 1 for t in ts if t > 1)
                if run == 0x7FFF:
                    flush_run()
                continue
            flush_run()
            r = 0
            pending = []
            for k, t in zip(range(ss, se + 1), ts):
                if t == 0:
                    r += 1
                    continue
                # at any nonzero coefficient, first emit ZRLs that are
                # due: keeps every pending correction bit inside the
                # decoder's 16-zero skip window (history coefficients
                # do NOT reset the run)
                while r > 15:
                    c_, l_ = ac_codes[0xF0]
                    sw.bw.write(c_, l_)
                    r -= 16
                    for bit in pending:
                        sw.bw.write(bit, 1)
                    pending = []
                if t > 1:  # history-nonzero: next bit of the magnitude
                    pending.append(t & 1)
                    continue
                c_, l_ = ac_codes[(r << 4) | 1]
                sw.bw.write(c_, l_)
                sw.bw.write(1 if int(blk[k]) > 0 else 0, 1)
                for bit in pending:
                    sw.bw.write(bit, 1)
                pending = []
                r = 0
            if r or pending:
                # zero tail (plus trailing correction bits): this
                # block's EOB starts a new batched run
                run = 1
                runbits = pending
    flush_run()
    sw.finish()


def encode_jpeg_progressive(
    img: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Progressive (SOF2) JFIF encoder: same color convert / FDCT /
    quantization as :func:`encode_jpeg`, but a multi-scan script with
    spectral selection + two successive-approximation levels. Because
    the quantized coefficients are identical and the final scans reach
    Al=0, decode_jpeg MUST produce pixel-identical output for the
    baseline and progressive encodings of any image — the round-trip
    tests pin exactly that."""
    h, w, planes, blocks, maxh, maxv = _prep_quantized(img, subsample)
    nc = len(planes)
    qts = [_Q_LUMA, _Q_CHROMA]
    dc_codes = _canonical_codes(*_DC_UNIV)
    ac_codes = _canonical_codes(*_AC_UNIV)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, qtbl in enumerate(qts[: 2 if nc > 1 else 1]):
        zz = qtbl.reshape(64)[_ZZ]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(int(v) for v in zz)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (_, hs, vs, tq) in enumerate(planes):
        sof += bytes([i + 1, (hs << 4) | vs, tq])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for tc_th, (bits, vals) in ((0x00, _DC_UNIV), (0x10, _AC_UNIV)):
        data = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(data)) + data
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    grids = []  # per-component non-interleaved block grids
    for q, hs, vs, _tq in blocks:
        comp_w = -(-(w * hs) // maxh)
        comp_h = -(-(h * vs) // maxv)
        grids.append((-(-comp_w // 8), -(-comp_h // 8)))

    def sos(comp_idxs, ss, se, ah, al):
        seg = bytes([len(comp_idxs)])
        for i in comp_idxs:
            seg += bytes([i + 1, 0x00])  # Td=0 Ta=0: universal tables
        seg += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg)

    all_comps = list(range(nc))
    # scan script — hits every decoder path: interleaved and single-
    # component DC, split spectral bands, two successive-approximation
    # levels on luma, AC + DC refinement:
    sos(all_comps, 0, 0, 0, 1)  # DC first, Al=1
    _emit_dc_scan(out, blocks, 1, 0, dc_codes, restart_interval)
    sos([0], 1, 5, 0, 2)  # luma low band, Al=2
    _emit_ac_first(out, blocks[0][0], *grids[0], 1, 5, 2, ac_codes, restart_interval)
    sos([0], 6, 63, 0, 2)  # luma high band, Al=2
    _emit_ac_first(out, blocks[0][0], *grids[0], 6, 63, 2, ac_codes, restart_interval)
    for i in all_comps[1:]:  # chroma full band, Al=1
        sos([i], 1, 63, 0, 1)
        _emit_ac_first(out, blocks[i][0], *grids[i], 1, 63, 1, ac_codes, restart_interval)
    sos([0], 1, 63, 2, 1)  # luma refinement Al=2 -> 1
    _emit_ac_refine(out, blocks[0][0], *grids[0], 1, 63, 1, ac_codes, restart_interval)
    sos(all_comps, 0, 0, 1, 0)  # DC refinement to full precision
    _emit_dc_scan(out, blocks, 0, 1, dc_codes, restart_interval)
    for i in all_comps:  # AC refinement to full precision
        sos([i], 1, 63, 1, 0)
        _emit_ac_refine(out, blocks[i][0], *grids[i], 1, 63, 0, ac_codes, restart_interval)
    out += b"\xff\xd9"
    return bytes(out)


def _half(p: np.ndarray) -> np.ndarray:
    """2x2 box downsample with edge replication for odd sizes."""
    h, w = p.shape
    p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
