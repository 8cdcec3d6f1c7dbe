"""Stdlib PNG sink: chunk structure, header round-trip, heatmap grid
dimensions, pie share math (reference image artifacts,
log_mining_analysis.py:88,128)."""

from __future__ import annotations

import zlib

from spark_ml_showcase_spark.sources import png


def test_encode_decode_header_roundtrip():
    pixels = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (9, 9, 9)]]
    buf = png.encode_png(pixels)
    assert png.decode_png_header(buf) == (2, 2, 8, 2)
    # IDAT decompresses to filter-0 scanlines with the exact pixel bytes
    idat = buf[buf.index(b"IDAT") + 4 :]
    raw = zlib.decompress(idat[: len(idat) - 12])
    assert raw == b"\x00\xff\x00\x00\x00\xff\x00" + b"\x00\x00\x00\xff\x09\x09\x09"


def test_ramp_endpoints():
    assert png._ramp_color(0.0) == (247, 252, 253)
    assert png._ramp_color(1.0) == (110, 1, 107)


def test_heatmap_dims_and_validity(spark, tmp_path):
    df = spark.createDataFrame(
        [("00", "01", 5), ("00", "02", 1), ("01", "01", 3)],
        "hour string, day string, n bigint",
    )
    path, w, h = png.write_heatmap_png(
        df, "hour", "day", "n", str(tmp_path / "hm.png"), cell=4
    )
    assert (w, h) == (2 * 4, 2 * 4)  # 2 days x 2 hours
    with open(path, "rb") as f:
        assert png.decode_png_header(f.read()) == (8, 8, 8, 2)


def test_pie_shares_and_file(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 3.0), ("b", 1.0)], "label string, n double"
    )
    path, shares = png.write_pie_png(df, "label", "n", str(tmp_path / "pie.png"))
    assert shares == [("a", 0.75), ("b", 0.25)]
    with open(path, "rb") as f:
        w, h, depth, ctype = png.decode_png_header(f.read())
    assert (w, h, depth, ctype) == (240, 240, 8, 2)
