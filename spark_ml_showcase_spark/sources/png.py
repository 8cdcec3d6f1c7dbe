"""Stdlib PNG sinks for the reference's rendered-image artifacts.

The reference saves pie charts and a day×hour heatmap as image files via
matplotlib/seaborn (``Log Analysis/log_mining_analysis.py:88,128``). This
container has no plotting stack — but a PNG is just zlib-compressed
filter-0 scanlines plus CRC-tagged chunks, so ``struct`` + ``zlib``
render one deterministically. Same driver-side contract as
``io.write_report``: SMALL, already-aggregated tables only (the raster is
bounded by ``max_cells``); the distributed work is the upstream agg.

Determinism: fixed palettes, integer ramps, ``zlib.compress(level=9)`` —
byte-identical output for identical input data across runs.
"""

from __future__ import annotations

import os
import struct
import zlib

from pyspark.sql import DataFrame

# light→dark blue-purple ramp (BuPu-flavored), linearly interpolated
_RAMP = [(247, 252, 253), (191, 211, 230), (140, 150, 198), (110, 1, 107)]

# categorical wedge colors (matplotlib tab10-flavored, fixed)
_WEDGES = [
    (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
    (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
    (188, 189, 34), (23, 190, 207),
]


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def encode_png(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """8-bit RGB PNG from a row-major pixel matrix (filter type 0)."""
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    raw = b"".join(
        b"\x00" + bytes(c for px in row for c in px) for row in pixels
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def decode_png_header(buf: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR — the validity
    probe tests and sink queries use to confirm a readable artifact."""
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    if buf[12:16] != b"IHDR":
        raise ValueError("IHDR not first chunk")
    w, h, depth, ctype = struct.unpack(">IIBB", buf[16:26])
    return w, h, depth, ctype


def _ramp_color(v: float) -> tuple[int, int, int]:
    """v in [0,1] → interpolated ramp color (integer-rounded)."""
    v = min(1.0, max(0.0, v))
    pos = v * (len(_RAMP) - 1)
    i = min(int(pos), len(_RAMP) - 2)
    t = pos - i
    a, b = _RAMP[i], _RAMP[i + 1]
    return tuple(round(a[k] + (b[k] - a[k]) * t) for k in range(3))


def write_heatmap_png(
    df: DataFrame,
    row_col: str,
    col_col: str,
    value_col: str,
    path: str,
    *,
    cell: int = 8,
    max_cells: int = 100_000,
) -> tuple[str, int, int]:
    """Render a (row, col, value) aggregate as a color-mapped heatmap PNG
    (the reference's day×hour visit heatmap, ``log_mining_analysis.py:128``
    — hours on the y axis, days on the x axis, BuPu color ramp).

    Axis labels are sorted ascending; missing cells render as the ramp
    floor. Returns (path, width_px, height_px) with width =
    n_distinct_cols·cell, height = n_distinct_rows·cell — dimensions an
    oracle can recompute from the aggregate alone.
    """
    rows = df.select(row_col, col_col, value_col).collect()
    if not rows:
        raise ValueError("empty heatmap input")
    vals = {(r[0], r[1]): float(r[2]) for r in rows}
    ys = sorted({k[0] for k in vals})
    xs = sorted({k[1] for k in vals})
    if len(ys) * len(xs) > max_cells:
        raise ValueError(
            f"heatmap grid {len(ys)}x{len(xs)} exceeds max_cells={max_cells}; "
            "this sink is for small aggregated matrices"
        )
    vmax = max(vals.values()) or 1.0
    pixels = []
    for y in ys:
        prow = []
        for x in xs:
            prow.extend([_ramp_color(vals.get((y, x), 0.0) / vmax)] * cell)
        pixels.extend([prow] * cell)
    buf = encode_png(pixels)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(buf)
    return path, len(xs) * cell, len(ys) * cell


def write_pie_png(
    df: DataFrame,
    label_col: str,
    value_col: str,
    path: str,
    *,
    size: int = 240,
    max_slices: int = 32,
) -> tuple[str, list[tuple[str, float]]]:
    """Render label shares as a pie-chart PNG (the reference's top-host
    percentage pies, ``log_mining_analysis.py:88``). Slices are drawn
    clockwise from 12 o'clock in descending-value order (label
    tie-break), fixed categorical palette. Returns (path, [(label,
    share)...]) — the share table is the data artifact next to the image.
    """
    import math

    rows = df.select(label_col, value_col).collect()
    if not rows or len(rows) > max_slices:
        raise ValueError(f"pie needs 1..{max_slices} pre-aggregated rows")
    items = sorted(
        ((str(r[0]), float(r[1])) for r in rows), key=lambda kv: (-kv[1], kv[0])
    )
    total = sum(v for _, v in items) or 1.0
    shares = [(k, v / total) for k, v in items]
    bounds = []
    acc = 0.0
    for i, (_, s) in enumerate(shares):
        acc += s
        bounds.append((acc, _WEDGES[i % len(_WEDGES)]))
    c = (size - 1) / 2.0
    radius = size * 0.45
    white = (255, 255, 255)
    pixels = []
    for py in range(size):
        prow = []
        for px in range(size):
            dx, dy = px - c, py - c
            if dx * dx + dy * dy > radius * radius:
                prow.append(white)
                continue
            # angle clockwise from 12 o'clock, in [0, 1)
            frac = (math.atan2(dx, -dy) / (2 * math.pi)) % 1.0
            color = bounds[-1][1]
            for upper, col in bounds:
                if frac < upper:
                    color = col
                    break
            prow.append(color)
        pixels.append(prow)
    buf = encode_png(pixels)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(buf)
    return path, shares
