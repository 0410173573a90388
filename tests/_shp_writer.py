"""Minimal spec-conformant ESRI shapefile writer (test-only helper).

Packs the ESRI Technical Description layouts directly so the reader in
``trackintel_spark.sources.shapefile`` is tested against the spec, not
against itself.
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# minimal spec-conformant shapefile writer (test-only)
# --------------------------------------------------------------------------

def _shp_record(num: int, content: bytes) -> bytes:
    return struct.pack(">2i", num, len(content) // 2) + content


def _point(x, y) -> bytes:
    return struct.pack("<i2d", 1, x, y)


def _polyline(parts: list[list[tuple[float, float]]]) -> bytes:
    pts = [p for part in parts for p in part]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    out = struct.pack("<i4d", 3, min(xs), min(ys), max(xs), max(ys))
    out += struct.pack("<2i", len(parts), len(pts))
    idx = 0
    for part in parts:
        out += struct.pack("<i", idx)
        idx += len(part)
    for x, y in pts:
        out += struct.pack("<2d", x, y)
    return out


def _polygon(rings: list[list[tuple[float, float]]]) -> bytes:
    b = _polyline(rings)
    return struct.pack("<i", 5) + b[4:]


def _null_shape() -> bytes:
    return struct.pack("<i", 0)


def write_shapefile(base: str, shapes: list[bytes], shape_type: int,
                    fields: list[tuple[str, str, int, int]], rows: list[tuple]):
    recs, offsets = [], []
    pos = 100
    for i, content in enumerate(shapes):
        offsets.append((pos // 2, len(content) // 2))
        rec = _shp_record(i + 1, content)
        recs.append(rec)
        pos += len(rec)

    def header(total_bytes: int) -> bytes:
        h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0) + struct.pack(">i", total_bytes // 2)
        h += struct.pack("<2i", 1000, shape_type)
        h += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
        return h

    with open(base + ".shp", "wb") as f:
        f.write(header(pos))
        for r in recs:
            f.write(r)
    with open(base + ".shx", "wb") as f:
        f.write(header(100 + 8 * len(shapes)))
        for off, ln in offsets:
            f.write(struct.pack(">2i", off, ln))

    rec_size = 1 + sum(fl for _, _, fl, _ in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    with open(base + ".dbf", "wb") as f:
        f.write(struct.pack("<4Bi2H20x", 3, 24, 1, 1, len(rows), hdr_size, rec_size))
        for name, ftype, flen, fdec in fields:
            f.write(name.encode().ljust(11, b"\x00") + ftype.encode()
                    + b"\x00" * 4 + bytes([flen, fdec]) + b"\x00" * 14)
        f.write(b"\x0d")
        for row in rows:
            f.write(b" ")
            for (name, ftype, flen, fdec), val in zip(fields, row):
                if val is None:
                    cell = b" " * flen
                elif ftype == "N" and not fdec:
                    cell = str(int(val)).rjust(flen).encode()
                elif ftype == "N":
                    cell = f"{val:.{fdec}f}".rjust(flen).encode()
                elif ftype == "L":
                    cell = (b"T" if val else b"F")
                else:
                    cell = str(val).ljust(flen).encode()[:flen]
                f.write(cell)
        f.write(b"\x1a")


