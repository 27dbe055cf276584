"""IMA ADPCM codec (adpcm.py) conformance + the compressed audio
decode path.

Verification mirrors test_jpeg.py: hand-computed spec vectors (the
step/index state machine walked by hand for the first samples), an
independently-written straight-line reference decoder over random
nibble streams, encoder→decoder SNR round trips, and the Spark
pipeline against a driver-side recompute.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from moera_search_spark.adpcm import (
    BLOCK_ALIGN,
    SAMPLES_PER_BLOCK,
    decode_adpcm_data,
    encode_adpcm_wav,
)
from moera_search_spark.operators.multimodal import (
    audio_features,
    audio_window_features,
    decode_wav,
    encode_wav,
    synth_audio,
)

SF_DIR = "/root/testdata/sf0.001"

# The public IMA spec tables, retyped independently here so a typo in
# the module's tables cannot self-verify.
_STEPS = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
          34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
          130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
          408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060,
          1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749,
          3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
          7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
          18500, 20350, 22385, 24623, 27086, 29794, 32767]
_IDX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ref_decode(nibbles, pred, index):
    """Independent straight-line IMA decoder (spec pseudocode shape:
    accumulate delta bit by bit rather than the closed form)."""
    out = []
    for n in nibbles:
        step = _STEPS[index]
        delta = step >> 3
        if n & 1:
            delta += step >> 2
        if n & 2:
            delta += step >> 1
        if n & 4:
            delta += step
        if n & 8:
            delta = -delta
        pred = max(-32768, min(32767, pred + delta))
        out.append(pred)
        index = max(0, min(88, index + _IDX_ADJ[n & 7]))
    return out


def _block(pred, index, nibbles):
    """Assemble one mono ADPCM block (pad to BLOCK_ALIGN with zero
    nibbles)."""
    body = bytearray(struct.pack("<hBB", pred, index, 0))
    nib = list(nibbles) + [0] * ((-len(nibbles)) % 2)
    for lo, hi in zip(nib[0::2], nib[1::2]):
        body.append(lo | (hi << 4))
    body += b"\x00" * (BLOCK_ALIGN - len(body))
    return bytes(body)


class TestSpecConformance:
    def test_hand_walked_first_samples(self):
        # pred=0, index=0 (step 7):
        #   nibble 7 → delta=0+1+3+7=11, pred 11, index 0+8=8 (step 16)
        #   nibble 3 → delta=2+4+8=14,  pred 25, index 8-1=7 (step 14)
        #   nibble 8 → delta=-(14>>3)=-1, pred 24, index 7-1=6
        got = decode_adpcm_data(_block(0, 0, [7, 3, 8]), BLOCK_ALIGN, 4)
        assert np.allclose(got * 32767.0, [0, 11, 25, 24])

    def test_closed_form_matches_bitwise_reference(self):
        rng = np.random.RandomState(7)
        nibbles = rng.randint(0, 16, size=500).tolist()
        for pred, index in ((0, 0), (-1200, 40), (30000, 88)):
            got = decode_adpcm_data(
                _block(pred, index, nibbles), BLOCK_ALIGN,
                1 + len(nibbles))
            exp = [pred] + _ref_decode(nibbles, pred, index)
            assert np.allclose(got * 32767.0, exp)

    def test_predictor_saturates(self):
        # all-maximum positive nibbles from a high predictor must pin
        # at int16 max, not wrap
        got = decode_adpcm_data(_block(32000, 88, [7] * 8),
                                BLOCK_ALIGN, 9)
        assert got.max() * 32767.0 == 32767
        assert (np.diff(got) >= 0).all()

    def test_unsupported_codec_raises(self):
        fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 0)  # MP3 tag
        buf = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE" \
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        with pytest.raises(NotImplementedError):
            decode_wav(buf)


class TestRoundTrip:
    def test_snr_and_length(self):
        for doc_id in (0, 3, 17, 123):
            s = synth_audio(doc_id)
            out, rate = decode_wav(encode_adpcm_wav(s))
            assert rate == 8000 and len(out) == len(s)
            snr = 10 * np.log10(np.mean(s ** 2)
                                / np.mean((s - out) ** 2))
            assert snr > 20.0, snr

    def test_compression_ratio(self):
        s = synth_audio(1)
        assert len(encode_wav(s)) / len(encode_adpcm_wav(s)) > 3.5

    def test_block_boundary_lengths(self):
        for n in (5, SAMPLES_PER_BLOCK - 1, SAMPLES_PER_BLOCK,
                  SAMPLES_PER_BLOCK + 1, 2 * SAMPLES_PER_BLOCK):
            s = synth_audio(1, n=n)
            out, _ = decode_wav(encode_adpcm_wav(s))
            assert len(out) == n
            if n > 100:     # tiny n: the step size is still adapting
                assert np.mean((s - out) ** 2) < 1e-2

    def test_step_index_carries_across_blocks(self):
        # a loud signal drives the step index high by block 1's end;
        # block 2 must seed from it (stored in its header), so decoding
        # block 2 standalone equals the tail of the full decode
        s = synth_audio(9, n=2 * SAMPLES_PER_BLOCK)
        buf = encode_adpcm_wav(s)
        full, _ = decode_wav(buf)
        data_off = buf.index(b"data") + 8
        second = decode_adpcm_data(
            buf[data_off + BLOCK_ALIGN: data_off + 2 * BLOCK_ALIGN],
            BLOCK_ALIGN, SAMPLES_PER_BLOCK)
        assert np.allclose(second, full[SAMPLES_PER_BLOCK:])


class TestSparkCompressedAudio:
    def test_adpcm_features_match_python_and_pcm(self, spark):
        rows = audio_window_features(spark, SF_DIR,
                                     codec="adpcm").collect()
        assert len(rows) > 0
        by_id = {r["doc_id"]: np.array(r["features"]) for r in rows}
        from moera_search_spark.adpcm import encode_adpcm_wav as enc
        for doc_id in sorted(by_id)[:6]:
            samples, _ = decode_wav(enc(synth_audio(int(doc_id))))
            exp = audio_features(samples)
            assert np.allclose(by_id[doc_id], exp, atol=1e-12)
            # lossy but close to the uncompressed feature vector
            pcm, _ = decode_wav(encode_wav(synth_audio(int(doc_id))))
            assert np.allclose(exp, audio_features(pcm), rtol=0.05)


class TestPropertyFuzz:
    """Hypothesis-driven: any signal round-trips with exact length;
    any nibble stream decodes identically under the closed module
    decoder and the independent bitwise reference."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 1200), st.integers(0, 2**31))
    def test_any_signal_roundtrips(self, n, seed):
        rng = np.random.RandomState(seed % 2**32)
        s = np.clip(rng.randn(n) * 0.3, -1, 1)
        out, _ = decode_wav(encode_adpcm_wav(s))
        assert len(out) == n
        # predictor saturates at int16 min → magnitude ≤ 32768/32767
        assert np.abs(out).max() <= 32768.0 / 32767.0

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(0, 15), min_size=1, max_size=120),
           st.integers(-32768, 32767), st.integers(0, 88))
    def test_decoder_matches_reference_on_any_stream(self, nibbles,
                                                     pred, index):
        got = decode_adpcm_data(_block(pred, index, nibbles),
                                BLOCK_ALIGN, 1 + len(nibbles))
        exp = [pred] + _ref_decode(nibbles, pred, index)
        assert np.allclose(got * 32767.0, exp)


class TestFactlessPartialBlock:
    def test_partial_trailing_block_without_fact(self):
        """An externally-produced ADPCM WAV with no fact chunk and a
        truncated final block must not gain phantom padding samples
        (ADVICE r3): n_samples derives from the nibbles present."""
        import struct

        from moera_search_spark.adpcm import encode_adpcm_wav
        from moera_search_spark.operators.multimodal import decode_wav

        t = np.arange(2000) / 8000.0
        clip = (np.sin(2 * np.pi * 300 * t) * 9000).astype(np.int16)
        wav = bytearray(encode_adpcm_wav(clip, 8000))
        # locate chunks: drop fact, truncate data mid-block
        off, chunks = 12, {}
        while off + 8 <= len(wav):
            cid = bytes(wav[off:off + 4])
            (clen,) = struct.unpack_from("<I", wav, off + 4)
            chunks[cid] = (off, clen)
            off += 8 + clen + (clen % 2)
        d_off, d_len = chunks[b"data"]
        f_off, f_len = chunks[b"fmt "]
        block_align = struct.unpack_from("<H", wav, f_off + 8 + 12)[0]
        cut = 10                                  # drop 10 data bytes
        data = bytes(wav[d_off + 8: d_off + 8 + d_len - cut])
        out = (bytes(wav[:f_off])
               + bytes(wav[f_off: f_off + 8 + f_len])
               + b"data" + struct.pack("<I", len(data)) + data)
        samples, rate = decode_wav(out)
        full, rem = divmod(len(data), block_align)
        expect = full * (1 + (block_align - 4) * 2)
        if rem >= 4:
            expect += 1 + (rem - 4) * 2
        assert len(samples) == expect
        # decoded prefix matches the fact-bearing original's prefix
        orig, _ = decode_wav(bytes(wav))
        assert np.allclose(samples, orig[:len(samples)])
