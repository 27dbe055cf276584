"""PNG codec (png.py) conformance + the lossless compressed path.

Losslessness makes verification stronger than JPEG's: every round
trip asserts EXACT pixel equality, hand-built streams cover each
scanline filter (computed forward here with independent filter math),
and the Spark PNG pipeline must produce features bit-identical to the
BMP pipeline — which is exactly why the driver catalog twin decodes
from PNG while keeping its full relational oracle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from moera_search_spark.png import decode_png, encode_png
from moera_search_spark.operators.multimodal import (
    multimodal_decode_features,
    synth_image,
)

SF_DIR = "/root/testdata/sf0.001"
_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + ctype + data \
        + struct.pack(">I", zlib.crc32(ctype + data))


def _assemble(w, h, color, lines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return _SIG + _chunk(b"IHDR", ihdr) \
        + _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")


def _filter_forward(img: np.ndarray, ftype: int) -> bytes:
    """Independent forward filter (spec §6.5-6.6, python ints)."""
    h, w, ch = img.shape
    flat = img.reshape(h, w * ch).astype(int)
    out = bytearray()
    prev = [0] * (w * ch)
    for y in range(h):
        out.append(ftype)
        for x in range(w * ch):
            raw = flat[y][x]
            left = flat[y][x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc \
                    else (up if pb <= pc else ul)
            out.append((raw - pred) % 256)
        prev = flat[y]
    return bytes(out)


class TestFilters:
    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_each_filter_reconstructs_exactly(self, ftype):
        img = synth_image(11)
        h, w, _ = img.shape
        buf = _assemble(w, h, 2, _filter_forward(img, ftype))
        assert (decode_png(buf) == img).all()

    def test_mixed_filters_per_scanline(self):
        img = synth_image(3)
        h, w, _ = img.shape
        # alternate all five filter types row by row
        per_row = [_filter_forward(img, f) for f in range(5)]
        stride = w * 3 + 1
        lines = b"".join(per_row[y % 5][y * stride:(y + 1) * stride]
                         for y in range(h))
        assert (decode_png(_assemble(w, h, 2, lines)) == img).all()


class TestColorTypes:
    def test_greyscale_replicates(self):
        g = np.arange(24, dtype=np.uint8).reshape(4, 6)
        lines = b"".join(b"\x00" + g[y].tobytes() for y in range(4))
        out = decode_png(_assemble(6, 4, 0, lines))
        assert out.shape == (4, 6, 3)
        assert (out[:, :, 0] == g).all() and (out[:, :, 2] == g).all()

    def test_rgba_drops_alpha(self):
        img = synth_image(2)
        h, w, _ = img.shape
        rgba = np.dstack([img, np.full((h, w), 7, np.uint8)])
        lines = b"".join(b"\x00" + rgba.reshape(h, -1)[y].tobytes()
                         for y in range(h))
        assert (decode_png(_assemble(w, h, 6, lines)) == img).all()


class TestErrors:
    def test_crc_corruption_detected(self):
        buf = bytearray(encode_png(synth_image(1)))
        buf[40] ^= 0xFF                       # flip a byte inside IDAT
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(buf))

    def test_palette_raises_not_implemented(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        buf = _SIG + _chunk(b"IHDR", ihdr)
        with pytest.raises(NotImplementedError):
            decode_png(buf)

    def test_not_a_png(self):
        with pytest.raises(ValueError):
            decode_png(b"BMxxxx")


class TestRoundTrip:
    @pytest.mark.parametrize("ftype", [0, 1])
    def test_lossless(self, ftype):
        for d in (0, 7, 123, 4242):
            img = synth_image(d)
            assert (decode_png(encode_png(img, filter_type=ftype))
                    == img).all()

    def test_compresses_smooth_content(self):
        y, x = np.mgrid[0:64, 0:64]
        img = np.stack([x, y, x], axis=-1).astype(np.uint8)
        assert len(encode_png(img)) < img.nbytes / 4

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**31))
    def test_any_image_roundtrips_exactly(self, h, w, seed):
        rng = np.random.RandomState(seed % 2**32)
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()


class TestSparkLosslessPipeline:
    def test_png_features_bit_identical_to_bmp(self, spark):
        png = {r["doc_id"]: r["features"] for r in
               multimodal_decode_features(spark, SF_DIR,
                                          decode_stub="png").collect()}
        bmp = {r["doc_id"]: r["features"] for r in
               multimodal_decode_features(spark, SF_DIR,
                                          decode_stub="bmp").collect()}
        assert png == bmp and len(png) > 0
