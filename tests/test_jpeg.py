"""Baseline JPEG codec (jpeg.py) conformance + the compressed
multimodal decode path.

Three independent verification angles, none sharing code with the
implementation:

* hand-built T.81 byte streams whose decoded output is computed
  analytically from the spec (DC-only flat block, a single AC basis
  function, a byte-stuffed 0xFF entropy byte, a 16-bit DQT);
* encoder→decoder round trips graded by PSNR against the source
  pixels (4:4:4 / 4:2:0, with and without restart markers);
* the Spark pipeline (`multimodal_decode_features(decode_stub='jpeg')`)
  checked row-by-row against a driver-side pure-python recompute.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from moera_search_spark.jpeg import (
    ZIGZAG,
    _BitWriter,
    _split_entropy,
    decode_jpeg,
    encode_jpeg,
)
from moera_search_spark.operators.multimodal import (
    decode_image,
    image_features,
    multimodal_decode_features,
    synth_image,
)

SF_DIR = "/root/testdata/sf0.001"

# Orthonormal IDCT basis, written independently of the module's _A.
_BASIS = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
                    * np.cos((2 * x + 1) * u * np.pi / 16.0)
                    for x in range(8)] for u in range(8)])


def _seg(out: bytearray, marker: int, payload: bytes):
    out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
    out.extend(payload)


def _gray_frame_header(out: bytearray, qtable: bytes, pq: int = 0):
    """SOI + DQT + 8×8 single-component SOF0 shared by the hand-built
    conformance vectors."""
    _seg(out, 0xDB, bytes([(pq << 4) | 0x00]) + qtable)
    _seg(out, 0xC0, struct.pack(">BHHB", 8, 8, 8, 1)
         + struct.pack(">BBB", 1, 0x11, 0))


def _idct_expected(coef: np.ndarray) -> np.ndarray:
    f = _BASIS.T @ coef @ _BASIS + 128.0
    return np.clip(np.round(f), 0, 255).astype(np.uint8)


class TestHandBuiltConformance:
    """Decode hand-assembled spec streams and compare to analytic
    pixel values — no encoder involved, so decoder bugs cannot cancel."""

    def test_dc_only_flat_block(self):
        # quant all-8s; DC table = {cat2: '0'}; AC = {EOB: '0'};
        # bits '0' + '10'(diff=+2) + '0' → dequant DC 16 → flat
        # 16/8 + 128 = 130 everywhere.
        out = bytearray(b"\xff\xd8")
        _gray_frame_header(out, bytes([8] * 64))
        _seg(out, 0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2]))
        _seg(out, 0xC4, bytes([0x10]) + bytes([1] + [0] * 15)
             + bytes([0x00]))
        _seg(out, 0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        out += bytes([0x4F]) + b"\xff\xd9"
        img = decode_jpeg(bytes(out))
        assert img.shape == (8, 8, 3)
        assert (img == 130).all()

    def test_single_ac_basis_function(self):
        # DC {cat0:'0'}; AC {EOB:'00', 0x01:'01'}; bits '0'+'01'+'1'
        # (run 0, cat 1, v=+1) + EOB → coefficient 8 at zigzag k=1
        # = raster (0, 1): one horizontal cosine.
        out = bytearray(b"\xff\xd8")
        _gray_frame_header(out, bytes([8] * 64))
        _seg(out, 0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0]))
        _seg(out, 0xC4, bytes([0x10]) + bytes([0, 2] + [0] * 14)
             + bytes([0x00, 0x01]))
        _seg(out, 0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        out += bytes([0x33]) + b"\xff\xd9"
        img = decode_jpeg(bytes(out))
        coef = np.zeros((8, 8))
        coef[0, 1] = 8.0
        exp = _idct_expected(coef)
        assert (img[:, :, 0] == exp).all()
        assert (img[:, :, 0] == img[:, :, 2]).all()

    def test_stuffed_ff_entropy_byte(self):
        # DC {cat0:'0'} (1 bit) + AC 7-bit codes {EOB, 0x18} align the
        # 8 value bits of 0x18 (run 1, cat 8, v=+255) on a byte
        # boundary → raw entropy byte 0xFF, stuffed as FF 00 on the
        # wire.  Coefficient lands at zigzag k=2 = raster (1, 0).
        out = bytearray(b"\xff\xd8")
        _gray_frame_header(out, bytes([8] * 64))
        _seg(out, 0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0]))
        _seg(out, 0xC4, bytes([0x10]) + bytes([0] * 6 + [2] + [0] * 9)
             + bytes([0x00, 0x18]))
        _seg(out, 0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        # bits: 0 0000001 | 11111111 | 0000000 1(pad)
        out += bytes([0x01, 0xFF, 0x00, 0x01]) + b"\xff\xd9"
        img = decode_jpeg(bytes(out))
        coef = np.zeros((8, 8))
        coef[1, 0] = 255 * 8.0
        exp = _idct_expected(coef)
        assert (img[:, :, 0] == exp).all()

    def test_16bit_quant_table(self):
        # Same DC-only stream but Pq=1 (16-bit big-endian entries,
        # value 300): dequant DC = 2*300 → flat 600/8 + 128 = 203.
        out = bytearray(b"\xff\xd8")
        _gray_frame_header(out, struct.pack(">64H", *([300] * 64)), pq=1)
        _seg(out, 0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2]))
        _seg(out, 0xC4, bytes([0x10]) + bytes([1] + [0] * 15)
             + bytes([0x00]))
        _seg(out, 0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        out += bytes([0x4F]) + b"\xff\xd9"
        img = decode_jpeg(bytes(out))
        assert (img == 203).all()

    def test_arithmetic_coding_raises_not_implemented(self):
        """SOF9 (arithmetic sequential) stays a declared library slot
        (progressive SOF2 decodes natively since round 4)."""
        out = bytearray(b"\xff\xd8")
        _seg(out, 0xC9, struct.pack(">BHHB", 8, 8, 8, 1)
             + struct.pack(">BBB", 1, 0x11, 0))
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(out))

    def test_not_a_jpeg_raises(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"BMnot-a-jpeg")


class TestBitIO:
    def test_writer_stuffs_ff(self):
        bw = _BitWriter()
        bw.write(0xFF, 8)
        bw.flush()
        assert bytes(bw.out) == b"\xff\x00"

    def test_split_entropy_unstuffs_and_splits_at_rst(self):
        # data FF00 AB | RST0 | CD, then a real marker ends the scan
        buf = b"\xff\x00\xab\xff\xd0\xcd\xff\xd9"
        segs, end = _split_entropy(buf, 0)
        assert segs == [b"\xff\xab", b"\xcd"]
        assert buf[end:end + 2] == b"\xff\xd9"


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


class TestRoundTrip:
    """Encoder → decoder fidelity on deterministic images.  The 4:2:0
    thresholds are lower because ``synth_image``'s mod-gradients carry
    pixel-rate chroma detail that subsampling removes by design."""

    @pytest.mark.parametrize("subsampling,ri,min_db",
                             [("444", 0, 28.0), ("444", 2, 28.0),
                              ("420", 0, 15.0), ("420", 3, 15.0)])
    def test_synth_images(self, subsampling, ri, min_db):
        for doc_id in (0, 7, 123, 4242):
            img = synth_image(doc_id)
            buf = encode_jpeg(img, quality=90, subsampling=subsampling,
                              restart_interval=ri)
            got = decode_jpeg(buf)
            assert got.shape == img.shape
            assert _psnr(img, got) > min_db

    def test_restart_markers_do_not_change_pixels(self):
        img = synth_image(99)
        plain = decode_jpeg(encode_jpeg(img, quality=85))
        rst = decode_jpeg(encode_jpeg(img, quality=85,
                                      restart_interval=1))
        assert (plain == rst).all()

    def test_smooth_gradient_high_fidelity(self):
        y, x = np.mgrid[0:40, 0:56]
        img = np.stack([x * 4 % 256, y * 6 % 256, (x + y) * 3 % 256],
                       axis=-1).astype(np.uint8)
        for ss in ("444", "420"):
            got = decode_jpeg(encode_jpeg(img, quality=95,
                                          subsampling=ss,
                                          restart_interval=3))
            assert got.shape == img.shape
            assert _psnr(img, got) > 30.0

    def test_non_multiple_of_mcu_dims(self):
        # 13×11 forces edge padding in every 4:2:0 MCU dimension.
        img = synth_image(5)[:13, :11]
        got = decode_jpeg(encode_jpeg(img, quality=90,
                                      subsampling="420"))
        assert got.shape == (13, 11, 3)
        assert _psnr(img, got) > 14.0

    def test_zigzag_is_a_permutation(self):
        assert sorted(ZIGZAG.tolist()) == list(range(64))
        # spec spot values: start of rows 2 and 3 of the scan pattern
        assert ZIGZAG[2] == 8 and ZIGZAG[9] == 24 and ZIGZAG[63] == 63


class TestSparkCompressedPipeline:
    """The compressed multimodal path end-to-end on Spark: JPEG
    payload synthesis → native decode → features, checked against a
    driver-side pure-python recompute of the same pipeline."""

    def test_jpeg_decode_features_match_python(self, spark):
        rows = multimodal_decode_features(spark, SF_DIR,
                                          decode_stub="jpeg").collect()
        assert len(rows) > 0
        by_id = {r["doc_id"]: np.array(r["features"]) for r in rows}
        from moera_search_spark.jpeg import encode_jpeg as enc
        for doc_id in sorted(by_id)[:8]:
            buf = enc(synth_image(int(doc_id)), quality=90,
                      subsampling="420")
            exp = image_features(decode_image(buf))
            assert np.allclose(by_id[doc_id], exp, atol=1e-12)


class TestPropertyFuzz:
    """Hypothesis-driven: ANY small RGB image must round-trip without
    exceptions, with exact dimensions and bounded error (quantization
    at q=90 keeps even noise images within a loose PSNR floor on the
    luma channel, where no subsampling loss applies)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**31),
           st.sampled_from(["444", "420"]), st.integers(0, 3))
    def test_any_image_roundtrips(self, h, w, seed, ss, ri):
        rng = np.random.RandomState(seed % 2**32)
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = decode_jpeg(encode_jpeg(img, quality=90, subsampling=ss,
                                      restart_interval=ri))
        assert got.shape == (h, w, 3)
        lum = np.array([0.299, 0.587, 0.114])
        y_in = img.astype(float) @ lum
        y_out = got.astype(float) @ lum
        mse = np.mean((y_in - y_out) ** 2)
        assert mse < 800.0     # luma error bounded even for noise


class TestMarkerRobustness:
    def test_fill_bytes_before_markers(self):
        """T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        fill bytes; insert some before every segment of a valid stream
        and require identical pixels."""
        img = synth_image(7)
        buf = encode_jpeg(img, quality=90)
        base = decode_jpeg(buf)
        # re-assemble with fill bytes before each marker (skip SOI,
        # never touch entropy data: stop padding after SOS)
        out = bytearray(buf[:2])
        i = 2
        while i < len(buf):
            assert buf[i] == 0xFF
            marker = buf[i + 1]
            out += b"\xff\xff\xff"          # three fill bytes
            (seglen,) = struct.unpack_from(">H", buf, i + 2)
            out += buf[i: i + 2 + seglen]
            i += 2 + seglen
            if marker == 0xDA:              # entropy data follows
                out += buf[i:]
                break
        got = decode_jpeg(bytes(out))
        assert (got == base).all()

    def test_non_interleaved_scan_raises(self):
        """A scan covering fewer components than the frame (multi-scan
        baseline) must refuse rather than silently mis-decode."""
        out = bytearray(b"\xff\xd8")
        _seg(out, 0xDB, bytes([0x00]) + bytes([8] * 64))
        sof = struct.pack(">BHHB", 8, 8, 8, 3)
        for cid, hv in ((1, 0x22), (2, 0x11), (3, 0x11)):
            sof += struct.pack(">BBB", cid, hv, 0)
        _seg(out, 0xC0, sof)
        _seg(out, 0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0]))
        _seg(out, 0xC4, bytes([0x10]) + bytes([1] + [0] * 15)
             + bytes([0x00]))
        _seg(out, 0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # Y-only scan
        out += bytes([0x4F]) + b"\xff\xd9"
        with pytest.raises(NotImplementedError, match="interleaved"):
            decode_jpeg(bytes(out))
