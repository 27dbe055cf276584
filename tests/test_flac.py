"""FLAC codec (flac.py) conformance + the lossless compressed-audio
decode path.

Verification mirrors test_jpeg.py / test_adpcm.py: exact round trips
(lossless, so equality is bitwise), hand-BUILT streams for the
decoder features our encoder never emits (LPC subframes checked
against an independent straight-line recurrence, Rice2 parameters,
multi-partition residuals, wasted bits), corruption tests for every
CRC, and hypothesis fuzz over signal shapes, lengths, channel modes
and bit depths.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from moera_search_spark.flac import (
    _best_rice_k,
    _BitWriter,
    _plan_subframe,
    _zigzag,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    parse_streaminfo,
)


def _tone(n, f=440.0, amp=12000, rate=8000.0, noise=0.0, seed=3):
    t = np.arange(n) / rate
    s = amp * np.sin(2 * np.pi * f * t)
    if noise:
        s = s + np.random.RandomState(seed).normal(0, noise, n)
    return s.astype(np.int16)


class TestRoundTrip:
    def test_mono_tone_exact_and_smaller(self):
        pcm = _tone(10000)[None, :]
        buf = encode_flac(pcm, 8000)
        out, rate = decode_flac(buf, verify_md5=True)
        assert rate == 8000
        assert (out == pcm).all()
        assert len(buf) < pcm.nbytes          # actually compresses

    @pytest.mark.parametrize("mode", ["indep", "left_side",
                                      "right_side", "mid_side"])
    def test_stereo_decorrelation_modes(self, mode):
        left = _tone(9000, 330.0)
        right = (left // 2 + 100).astype(np.int16)
        st = np.stack([left, right])
        buf = encode_flac(st, 44100, stereo_mode=mode)
        out, rate = decode_flac(buf, verify_md5=True)
        assert rate == 44100
        assert (out == st).all()

    def test_random_noise_verbatim_path(self):
        rng = np.random.RandomState(7)
        x = rng.randint(-32768, 32768, 6000).astype(np.int16)[None, :]
        out, _ = decode_flac(encode_flac(x, 8000), verify_md5=True)
        assert (out == x).all()

    @pytest.mark.parametrize("n", [1, 5, 191, 192, 256, 4096, 4097])
    def test_boundary_lengths(self, n):
        x = _tone(n)[None, :]
        out, _ = decode_flac(encode_flac(x, 8000), verify_md5=True)
        assert (out == x).all()

    def test_constant_subframe_tiny_stream(self):
        x = np.full((1, 5000), -3, np.int16)
        buf = encode_flac(x, 16000, bps=8)
        out, _ = decode_flac(buf, verify_md5=True)
        assert (out == x).all()
        assert len(buf) < 100                  # constant folds away

    def test_multi_frame_utf8_frame_numbers(self):
        # 200 frames of 192 samples: frame index crosses the 1- and
        # 2-byte UTF-8 boundary (127) that single-frame tests miss
        x = _tone(192 * 200, noise=30.0)[None, :]
        out, _ = decode_flac(encode_flac(x, 8000, blocksize=192),
                             verify_md5=True)
        assert (out == x).all()

    def test_escape_partition_roundtrip(self):
        # uniform residuals in a power-of-2 range make raw (escaped)
        # coding strictly cheaper than any Rice k, so the planner must
        # pick the escape and the decoder must undo it
        rng = np.random.RandomState(11)
        x = np.cumsum(rng.randint(-16, 16, 5000)).astype(np.int16)
        kind = _plan_subframe(x.astype(np.int64), 16)[0]
        assert kind == "fixed_esc"
        out, _ = decode_flac(encode_flac(x[None, :], 8000),
                             verify_md5=True)
        assert (out == x[None, :]).all()

    def test_24_bit_samples(self):
        rng = np.random.RandomState(5)
        x = (np.cumsum(rng.randint(-999, 999, 4000))
             + 2_000_000).astype(np.int64)[None, :]
        out, _ = decode_flac(encode_flac(x, 48000, bps=24),
                             verify_md5=True)
        assert (out == x).all()


# --------------------------------------------------- hand-built streams
# A minimal single-frame builder so the decoder's LPC / Rice2 /
# multi-partition / wasted-bits paths (which encode_flac never emits)
# are exercised against independently computed expectations.

def _frame_stream(write_subframes, n, nch=1, bps=16, rate=8000):
    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)                       # 16-bit blocksize follows
    w.write(0, 4)                       # rate from STREAMINFO
    w.write(nch - 1, 4)
    w.write(4, 3)                       # 16-bit samples
    w.write(0, 1)
    w.write(0, 8)                       # frame number 0 (UTF-8)
    w.write(n - 1, 16)
    w.write(crc8(bytes(w.out)), 8)
    write_subframes(w)
    w.align()
    body = bytes(w.out)
    frames = body + struct.pack(">H", crc16(body))
    si = ((((((0 << 16 | n) << 16 | n) << 48 | 0) << 20 | rate)
           << 3 | (nch - 1)) << 5 | (bps - 1)) << 36 | n
    return (b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
            + si.to_bytes(18, "big") + b"\x00" * 16 + frames)


def _write_rice(w, residual, k, method=0, porder=0):
    w.write(method, 2)
    w.write(porder, 4)
    pbits = 4 if method == 0 else 5
    parts = np.array_split(residual, 1 << porder)
    for part in parts:
        w.write(k, pbits)
        u = _zigzag(np.asarray(part, np.int64))
        for q, r in zip((u >> k).tolist(),
                        (u & ((1 << k) - 1)).tolist()):
            w.write(1, q + 1)
            if k:
                w.write(r, k)


class TestHandBuiltConformance:
    def test_lpc_subframe_matches_reference_recurrence(self):
        # order-3 LPC, coefs/shift chosen by hand; expected output
        # computed by an independent straight-line loop here
        # the fixed order-3 predictor (3, -3, 1) expressed as
        # quantized LPC — stable, so 600 steps stay in int64 range
        n, order, shift = 600, 3, 5
        coefs = [96, -96, 32]
        rng = np.random.RandomState(2)
        warmup = [100, -50, 75]
        residual = rng.randint(-40, 40, n - order)
        expect = list(warmup)
        for r in residual:
            pred = sum(c * expect[-1 - j]
                       for j, c in enumerate(coefs)) >> shift
            expect.append(int(r) + pred)

        def subframes(w):
            w.write(0, 1)
            w.write(32 + (order - 1), 6)   # LPC, order 3
            w.write(0, 1)
            for v in warmup:
                w.write(v, 16)
            w.write(12 - 1, 4)             # precision 12
            w.write(shift, 5)
            for c in coefs:
                w.write(c, 12)
            _write_rice(w, residual, 4)

        out, _ = decode_flac(_frame_stream(subframes, n))
        assert (out[0] == np.array(expect)).all()

    def test_rice2_and_partitions(self):
        # method 1 (5-bit params) + partition order 2 over a fixed
        # order-1 subframe; different k per partition
        n = 512
        rng = np.random.RandomState(4)
        sig = np.cumsum(rng.randint(-20, 20, n)).astype(np.int64)
        residual = np.diff(sig)

        def subframes(w):
            w.write(0, 1)
            w.write(8 + 1, 6)              # FIXED order 1
            w.write(0, 1)
            w.write(int(sig[0]), 16)
            w.write(1, 2)                  # Rice2
            w.write(2, 4)                  # 4 partitions
            parts = [residual[:n // 4 - 1],
                     residual[n // 4 - 1: 2 * (n // 4) - 1],
                     residual[2 * (n // 4) - 1: 3 * (n // 4) - 1],
                     residual[3 * (n // 4) - 1:]]
            for k, part in zip((3, 5, 2, 6), parts):
                w.write(k, 5)
                u = _zigzag(np.asarray(part, np.int64))
                for q, r in zip((u >> k).tolist(),
                                (u & ((1 << k) - 1)).tolist()):
                    w.write(1, q + 1)
                    w.write(r, k)

        out, _ = decode_flac(_frame_stream(subframes, n))
        assert (out[0] == sig).all()

    def test_wasted_bits(self):
        # every sample has 2 trailing zero bits; subframe stores the
        # shifted-down signal and declares wasted=2 (unary '01')
        n = 300
        sig = (np.arange(n, dtype=np.int64) - 150) << 2

        def subframes(w):
            w.write(0, 1)
            w.write(1, 6)                  # VERBATIM
            w.write(1, 1)                  # wasted-bits flag
            w.write(1, 2)                  # unary 1 -> wasted = 2
            for v in (sig >> 2).tolist():
                w.write(v, 14)             # bps minus wasted

        out, _ = decode_flac(_frame_stream(subframes, n))
        assert (out[0] == sig).all()

    def test_escaped_partition_handbuilt(self):
        n = 64
        residual = np.arange(n, dtype=np.int64) - 32

        def subframes(w):
            w.write(0, 1)
            w.write(8, 6)                  # FIXED order 0
            w.write(0, 1)
            w.write(0, 2)
            w.write(0, 4)
            w.write(15, 4)                 # escape
            w.write(7, 5)                  # raw width 7
            for v in residual.tolist():
                w.write(v, 7)

        out, _ = decode_flac(_frame_stream(subframes, n))
        assert (out[0] == residual).all()


class TestErrors:
    def test_bad_magic(self):
        with pytest.raises(ValueError, match="not a FLAC"):
            decode_flac(b"OggS" + b"\x00" * 64)

    def test_frame_crc16_corruption_detected(self):
        buf = bytearray(encode_flac(_tone(3000)[None, :], 8000))
        buf[-3] ^= 0x40                    # inside the last frame body
        with pytest.raises(ValueError, match="CRC"):
            decode_flac(bytes(buf))

    def test_header_crc8_corruption_detected(self):
        buf = bytearray(encode_flac(_tone(3000)[None, :], 8000))
        start = parse_streaminfo(bytes(buf))["frame_start_bit"] // 8
        buf[start + 4] ^= 0x01             # frame header byte
        with pytest.raises(ValueError):
            decode_flac(bytes(buf))

    def test_md5_mismatch_detected(self):
        buf = bytearray(encode_flac(_tone(3000)[None, :], 8000))
        buf[26] ^= 0xFF                    # a STREAMINFO md5 byte
        with pytest.raises(ValueError, match="MD5"):
            decode_flac(bytes(buf), verify_md5=True)
        decode_flac(bytes(buf))            # without verify: fine

    def test_reserved_subframe_type_raises(self):
        def subframes(w):
            w.write(0, 1)
            w.write(2, 6)                  # reserved type
            w.write(0, 1)

        with pytest.raises(ValueError, match="reserved subframe"):
            decode_flac(_frame_stream(subframes, 16))

    def test_lost_sync_raises(self):
        buf = bytearray(encode_flac(_tone(3000)[None, :], 8000))
        start = parse_streaminfo(bytes(buf))["frame_start_bit"] // 8
        buf[start] = 0x00
        with pytest.raises(ValueError, match="sync"):
            decode_flac(bytes(buf))


class TestPlannerInternals:
    def test_best_rice_k_is_exhaustive_argmin(self):
        rng = np.random.RandomState(9)
        u = _zigzag(rng.randint(-500, 500, 400).astype(np.int64))
        k, cost = _best_rice_k(u)
        costs = [int(np.sum(u >> kk)) + len(u) * (kk + 1)
                 for kk in range(15)]
        assert cost == min(costs) and costs[k] == cost


class TestFeaturePath:
    def test_flac_features_bit_identical_to_pcm(self):
        # lossless: the windowed-RMS features of the FLAC round trip
        # EQUAL the PCM-path features exactly — the oracle property
        # that makes compressed audio hash-verifiable end-to-end
        from moera_search_spark.operators.multimodal import (
            audio_features, decode_audio, encode_wav, synth_audio)
        for doc_id in (0, 3, 17):
            sig = synth_audio(doc_id)
            pcm16 = (np.clip(sig, -1, 1) * 32767.0).astype(np.int16)
            via_flac, _ = decode_audio(encode_flac(pcm16[None, :],
                                                   8000))
            via_pcm, _ = decode_audio(encode_wav(sig))
            assert (via_flac == via_pcm).all()
            f1, f2 = audio_features(via_flac), audio_features(via_pcm)
            assert (f1 == f2).all()

    def test_spark_flac_features_match_python_and_pcm(self, spark):
        from moera_search_spark.operators.multimodal import (
            audio_features, audio_window_features, decode_audio,
            encode_wav, synth_audio)
        rows = audio_window_features(spark, "/root/testdata/sf0.001",
                                     codec="flac").collect()
        assert len(rows) > 0
        by_id = {r["doc_id"]: np.array(r["features"]) for r in rows}
        for doc_id in sorted(by_id)[:6]:
            pcm, _ = decode_audio(encode_wav(synth_audio(int(doc_id))))
            exp = audio_features(pcm)
            assert (by_id[doc_id] == exp).all()


class TestFuzz:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 5000), st.integers(0, 2**31),
           st.sampled_from(["indep", "left_side", "right_side",
                            "mid_side"]),
           st.sampled_from([1, 2]))
    def test_any_signal_roundtrips(self, n, seed, mode, nch):
        rng = np.random.RandomState(seed)
        kind = seed % 3
        if kind == 0:
            x = rng.randint(-32768, 32768, (nch, n))
        elif kind == 1:
            x = np.clip(np.cumsum(
                rng.randint(-300, 300, (nch, n)), axis=1),
                -32768, 32767)
        else:
            t = np.arange(n) / 8000.0
            x = np.stack([(np.sin(2 * np.pi * (200 + 80 * c) * t)
                           * 11000) for c in range(nch)]).astype(int)
        x = x.astype(np.int16)
        buf = encode_flac(x, 8000, stereo_mode=mode,
                          blocksize=1024)
        out, _ = decode_flac(buf, verify_md5=True)
        assert (out == x).all()
