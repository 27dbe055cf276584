"""Progressive JPEG (T.81 Annex G) conformance.

The core oracle is bit-identity with the baseline decoder:
``encode_jpeg_progressive`` quantizes the SAME coefficients as
``encode_jpeg`` (shared ``_prep_components``), and progressive entropy
coding is a lossless reorganization of those coefficients — so for any
image, quality, subsampling, scan script and restart interval, the
progressive decode must equal the baseline decode EXACTLY, byte for
byte.  That single invariant exercises every decode regime: DC
first/refine, spectral-selection AC bands, successive-approximation
AC refinement with correction bits, EOB runs, ZRL inside refinement,
and restart-marker resets.

A hand-built two-scan stream (DC first + DC refine) additionally pins
the successive-approximation arithmetic against values computed
analytically from the spec, independent of both encoders.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from moera_search_spark.jpeg import (
    DEFAULT_PROGRESSIVE_SCANS,
    SPECTRAL_ONLY_SCANS,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
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


def _identical(img, quality=85, subsampling="444",
               scans=DEFAULT_PROGRESSIVE_SCANS, ri=0):
    base = decode_jpeg(encode_jpeg(img, quality=quality,
                                   subsampling=subsampling,
                                   restart_interval=ri))
    prog = decode_jpeg(encode_jpeg_progressive(
        img, quality=quality, subsampling=subsampling, scans=scans,
        restart_interval=ri))
    assert prog.shape == base.shape
    assert (prog == base).all()


class TestBitIdentityWithBaseline:
    @pytest.mark.parametrize("hw", [(1, 1), (5, 7), (8, 8), (16, 16),
                                    (17, 19), (33, 21)])
    @pytest.mark.parametrize("ss", ["444", "420"])
    @pytest.mark.parametrize("scans", [DEFAULT_PROGRESSIVE_SCANS,
                                       SPECTRAL_ONLY_SCANS],
                             ids=["successive-approx", "spectral-only"])
    def test_sizes_subsamplings_scripts(self, hw, ss, scans):
        h, w = hw
        rng = np.random.RandomState(h * 100 + w)
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        _identical(img, quality=85, subsampling=ss, scans=scans)

    @pytest.mark.parametrize("ri", [1, 2, 5])
    def test_restart_intervals(self, ri):
        img = synth_image(11)
        _identical(img, quality=90, subsampling="420", ri=ri)
        _identical(img, quality=90, subsampling="444",
                   scans=SPECTRAL_ONLY_SCANS, ri=ri)

    def test_flat_image_long_eob_runs(self):
        """A flat image zeroes every AC band → cross-block EOB runs
        spanning the whole scan, in both first and refinement passes."""
        img = np.full((48, 48, 3), 77, np.uint8)
        _identical(img, quality=85, subsampling="420")

    def test_sparse_features_zrl_paths(self):
        """Isolated bright pixels on a flat field at high quality →
        long intra-block zero runs (ZRL), including ZRL-vs-EOB folding
        inside the refinement scans."""
        img = np.full((32, 32, 3), 40, np.uint8)
        img[3, 3] = img[3, 28] = img[28, 3] = img[17, 16] = 255
        _identical(img, quality=95, subsampling="444")

    def test_synth_images(self):
        for i in (0, 7, 23):
            _identical(synth_image(i), quality=90, subsampling="420")


class TestHandBuiltStream:
    def test_dc_successive_approximation_analytic(self):
        """Grayscale 8×8, quant=8, two scans: DC first at Al=1 coding
        diff=+3 (category 2, code '0' + bits '11'), then a DC
        refinement at Al=0 sending a 1 bit.  DC = (3 << 1) | 1 = 7 →
        dequantized 56 → flat level 128 + 56/8 = 135."""
        out = bytearray(b"\xff\xd8")
        _seg(out, 0xDB, bytes([0x00]) + bytes([8] * 64))
        _seg(out, 0xC2, struct.pack(">BHHB", 8, 8, 8, 1)
             + struct.pack(">BBB", 1, 0x11, 0))
        _seg(out, 0xC4, bytes([0x00]) + bytes([1] + [0] * 15)
             + bytes([2]))
        _seg(out, 0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
        out += bytes([0x7F])                 # '0' '11' + 1-padding
        _seg(out, 0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
        out += bytes([0xFF, 0x00])           # '1' + padding, stuffed
        out += b"\xff\xd9"
        img = decode_jpeg(bytes(out))
        assert img.shape == (8, 8, 3)
        assert (img == 135).all()

    def test_ac_first_scan_analytic(self):
        """Add an AC scan (Ss=1..63, Al=0) placing zigzag k=1 → raster
        (0, 1) with value +1: symbols {EOB:'00', (0,1):'01'}, entropy
        '01' + '1' + '00' + padding.  Expected pixels = analytic IDCT
        of DC=56, AC(0,1)=8."""
        out = bytearray(b"\xff\xd8")
        _seg(out, 0xDB, bytes([0x00]) + bytes([8] * 64))
        _seg(out, 0xC2, struct.pack(">BHHB", 8, 8, 8, 1)
             + struct.pack(">BBB", 1, 0x11, 0))
        _seg(out, 0xC4, bytes([0x00]) + bytes([1] + [0] * 15)
             + bytes([2]))
        _seg(out, 0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
        out += bytes([0x7F])
        _seg(out, 0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
        out += bytes([0xFF, 0x00])
        _seg(out, 0xC4, bytes([0x10]) + bytes([0, 2] + [0] * 14)
             + bytes([0x00, 0x01]))
        _seg(out, 0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        out += bytes([0b01100111])           # '01' '1' '00' + padding
        out += b"\xff\xd9"
        img = decode_jpeg(bytes(out))
        coef = np.zeros((8, 8))
        coef[0, 0] = 56.0
        coef[0, 1] = 8.0
        exp = np.clip(np.round(_BASIS.T @ coef @ _BASIS + 128.0),
                      0, 255).astype(np.uint8)
        assert (img == np.stack([exp] * 3, axis=-1)).all()


class TestDispatch:
    def test_decode_image_routes_progressive(self):
        img = synth_image(5)
        buf = encode_jpeg_progressive(img, quality=90, subsampling="420")
        assert (decode_image(buf) == decode_jpeg(buf)).all()

    def test_progressive_features_match_baseline_pipeline(self, spark):
        """The Spark decode-features stage over progressive payloads
        equals the baseline-JPEG stage row for row (same synth images,
        same coefficients → bit-identical decodes → equal features)."""
        prog = multimodal_decode_features(spark, SF_DIR,
                                          decode_stub="pjpeg")
        base = multimodal_decode_features(spark, SF_DIR,
                                          decode_stub="jpeg")
        p = {r["doc_id"]: r["features"] for r in prog.collect()}
        b = {r["doc_id"]: r["features"] for r in base.collect()}
        assert p.keys() == b.keys() and len(p) > 0
        for k in p:
            assert p[k] == b[k]

    def test_features_match_driver_recompute(self):
        for i in (1, 9):
            buf = encode_jpeg_progressive(synth_image(i), quality=90,
                                          subsampling="420")
            feats = image_features(decode_image(buf))
            exp = image_features(decode_jpeg(buf))
            assert np.allclose(feats, exp, atol=0)


class TestPropertyFuzz:
    """Hypothesis: ANY small image, any subsampling, script and
    restart interval — progressive decode is bit-identical to the
    baseline decode of the same coefficients."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**31),
           st.sampled_from(["444", "420"]), st.integers(0, 3),
           st.booleans())
    def test_any_image_identical(self, h, w, seed, ss, ri, spectral):
        rng = np.random.RandomState(seed % 2**32)
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        scans = SPECTRAL_ONLY_SCANS if spectral \
            else DEFAULT_PROGRESSIVE_SCANS
        _identical(img, quality=90, subsampling=ss, scans=scans, ri=ri)
