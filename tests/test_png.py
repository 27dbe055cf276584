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

    def test_palette_without_idat_rejected(self):
        # palette decodes natively since round 4; a header-only
        # stream is a data error, not a library slot
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        buf = _SIG + _chunk(b"IHDR", ihdr)
        with pytest.raises(ValueError, match="IDAT"):
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


def _assemble_full(w, h, depth, color, lines: bytes,
                   plte: bytes | None = None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(lines)) \
        + _chunk(b"IEND", b"")


class TestPaletteAnd16Bit:
    def test_palette_8bit(self):
        rng = np.random.RandomState(5)
        plte = rng.randint(0, 256, (256, 3), dtype=np.uint8)
        idx = rng.randint(0, 256, (7, 9), dtype=np.uint8)
        lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(7))
        out = decode_png(_assemble_full(9, 7, 8, 3, lines,
                                        plte.tobytes()))
        assert (out == plte[idx]).all()

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_palette_subbyte(self, depth):
        rng = np.random.RandomState(depth)
        n = 1 << depth
        plte = rng.randint(0, 256, (n, 3), dtype=np.uint8)
        w, h = 11, 5                      # w*depth not byte-aligned
        idx = rng.randint(0, n, (h, w), dtype=np.uint8)
        lines = bytearray()
        for y in range(h):
            lines.append(0)
            bits = np.unpackbits(
                idx[y][:, None], axis=1, count=8)[:, 8 - depth:]
            packed = np.packbits(bits.reshape(-1))
            lines += packed.tobytes()
        out = decode_png(_assemble_full(w, h, depth, 3, bytes(lines),
                                        plte.tobytes()))
        assert (out == plte[idx]).all()

    def test_palette_with_sub_filter(self):
        plte = np.arange(768, dtype=np.uint8).reshape(256, 3)
        idx = np.tile(np.arange(16, dtype=np.uint8), (4, 2))  # (4, 32)
        # Sub filter on index bytes (bpp = 1)
        lines = bytearray()
        for y in range(4):
            lines.append(1)
            row = idx[y].astype(int)
            sub = [row[0]] + [(row[x] - row[x - 1]) % 256
                              for x in range(1, len(row))]
            lines += bytes(sub)
        out = decode_png(_assemble_full(32, 4, 8, 3, bytes(lines),
                                        plte.tobytes()))
        assert (out == plte[idx]).all()

    def test_palette_missing_plte_rejected(self):
        lines = b"\x00" + bytes(4)
        with pytest.raises(ValueError, match="PLTE"):
            decode_png(_assemble_full(4, 1, 8, 3, lines))

    def test_palette_index_out_of_range_rejected(self):
        plte = bytes(6)                   # 2 entries
        lines = b"\x00" + bytes([0, 1, 3, 0])
        with pytest.raises(ValueError, match="palette index"):
            decode_png(_assemble_full(4, 1, 8, 3, lines, plte))

    def test_16bit_rgb_msb(self):
        rng = np.random.RandomState(16)
        px16 = rng.randint(0, 65536, (5, 6, 3), dtype=np.uint16)
        raw = px16.byteswap().tobytes()   # big-endian network order
        stride = 6 * 3 * 2
        lines = b"".join(
            b"\x00" + raw[y * stride:(y + 1) * stride] for y in range(5))
        out = decode_png(_assemble_full(6, 5, 16, 2, lines))
        assert (out == (px16 >> 8).astype(np.uint8)).all()

    def test_16bit_grey_paeth_filter(self):
        """16-bit + Paeth: the filter unit is 2 bytes (bpp), exercised
        through the wavefront path; replicated-byte samples survive
        the MSB reduction losslessly."""
        g8 = synth_image(9)[:, :, 0]
        h, w = g8.shape
        px16 = (g8.astype(np.uint16) << 8) | g8
        raw = np.frombuffer(px16.byteswap().tobytes(),
                            np.uint8).reshape(h, w * 2)
        # forward-Paeth with bpp=2 (python ints, independent impl)
        lines = bytearray()
        prev = [0] * (w * 2)
        for y in range(h):
            lines.append(4)
            row = [int(v) for v in raw[y]]
            for x in range(w * 2):
                a = row[x - 2] if x >= 2 else 0
                b = prev[x]
                c = prev[x - 2] if x >= 2 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else \
                    (b if pb <= pc else c)
                lines.append((row[x] - pred) % 256)
            prev = row
        out = decode_png(_assemble_full(w, h, 16, 0, bytes(lines)))
        assert (out[:, :, 0] == g8).all()
        assert (out[:, :, 1] == g8).all()

    def test_bad_interlace_method_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 2)
        buf = _SIG + _chunk(b"IHDR", ihdr) \
            + _chunk(b"IDAT", zlib.compress(bytes(13 * 4))) \
            + _chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="interlace"):
            decode_png(buf)


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _interlace_forward(samples: np.ndarray, depth: int,
                       ftype: int = 0) -> bytes:
    """Independent Adam7 forward pass-splitter + per-pass filter
    (python/numpy, spec §8.2): samples is (h, w, nch) of raw sample
    values (palette indices for color 3, per-channel bytes or 16-bit
    ints otherwise)."""
    h, w, nch = samples.shape
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = samples[y0::dy, x0::dx]
        hp, wp = sub.shape[:2]
        if hp == 0 or wp == 0:
            continue
        if depth == 16:
            rows = sub.astype(">u2").reshape(hp, -1).view(np.uint8)
        elif depth == 8:
            rows = sub.astype(np.uint8).reshape(hp, -1)
        else:                    # sub-byte palette: bit-pack per row
            packed = []
            for y in range(hp):
                bits = np.unpackbits(
                    sub[y].reshape(-1, 1).astype(np.uint8),
                    axis=1)[:, 8 - depth:]
                packed.append(np.packbits(bits.reshape(-1)))
            rows = np.stack(packed)
        bpp = max(1, depth // 8) * nch
        for y in range(hp):
            row = rows[y].astype(int)
            out.append(ftype)
            if ftype == 0:
                out += row.astype(np.uint8).tobytes()
            else:                # Sub
                sb = row.copy()
                sb[bpp:] = (row[bpp:] - row[:-bpp]) % 256
                out += sb.astype(np.uint8).tobytes()
    return bytes(out)


def _assemble_interlaced(w, h, depth, color, lines: bytes,
                         plte: bytes | None = None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(lines)) \
        + _chunk(b"IEND", b"")


class TestAdam7:
    @pytest.mark.parametrize("wh", [(1, 1), (3, 5), (8, 8), (13, 7),
                                    (17, 11)])
    def test_rgb8_roundtrip(self, wh):
        w, h = wh
        rng = np.random.RandomState(w * 100 + h)
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        lines = _interlace_forward(img, 8)
        assert (decode_png(_assemble_interlaced(w, h, 8, 2, lines))
                == img).all()

    def test_rgb8_sub_filtered_passes(self):
        img = synth_image(21)
        h, w, _ = img.shape
        lines = _interlace_forward(img, 8, ftype=1)
        assert (decode_png(_assemble_interlaced(w, h, 8, 2, lines))
                == img).all()

    def test_palette_4bit_interlaced(self):
        rng = np.random.RandomState(44)
        plte = rng.randint(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.randint(0, 16, (9, 10), dtype=np.uint8)
        lines = _interlace_forward(idx[:, :, None], 4)
        out = decode_png(_assemble_interlaced(10, 9, 4, 3, lines,
                                              plte.tobytes()))
        assert (out == plte[idx]).all()

    def test_grey16_interlaced(self):
        g8 = synth_image(14)[:, :, 1]
        h, w = g8.shape
        px16 = ((g8.astype(np.uint16) << 8) | g8)[:, :, None]
        lines = _interlace_forward(px16, 16)
        out = decode_png(_assemble_interlaced(w, h, 16, 0, lines))
        assert (out[:, :, 0] == g8).all()

    def test_interlaced_matches_sequential(self):
        img = synth_image(77)
        h, w, _ = img.shape
        seq = b"".join(b"\x00" + img.reshape(h, -1)[y].tobytes()
                       for y in range(h))
        a = decode_png(_assemble(w, h, 2, seq))
        b = decode_png(_assemble_interlaced(
            w, h, 8, 2, _interlace_forward(img, 8)))
        assert (a == b).all()
