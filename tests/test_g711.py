"""G.711 companding (g711.py) + the WAV tag-6/7 decode path.

The decode tables are checked against hand-known ITU reference pairs
(independent of the table-builder code), the encoders against an
exhaustive nearest-level argmin, and the WAV plumbing end-to-end
through ``decode_wav`` / ``decode_audio``.
"""

from __future__ import annotations

import numpy as np
import pytest

from moera_search_spark.g711 import (
    ALAW_TABLE,
    ULAW_TABLE,
    decode_alaw,
    decode_ulaw,
    encode_alaw,
    encode_ulaw,
)
from moera_search_spark.operators.multimodal import (
    decode_audio,
    decode_wav,
    encode_g711_wav,
    synth_audio,
)


class TestTables:
    def test_known_ulaw_pairs(self):
        # Sun/CCITT reference values: extreme magnitudes and zero
        assert ULAW_TABLE[0x00] == -32124
        assert ULAW_TABLE[0x80] == 32124
        assert ULAW_TABLE[0xFF] == 0
        assert ULAW_TABLE[0x7F] == -0 or ULAW_TABLE[0x7F] == 0

    def test_known_alaw_pairs(self):
        assert ALAW_TABLE[0x55] == -8      # code 0 toggled
        assert ALAW_TABLE[0xD5] == 8
        assert ALAW_TABLE[0x2A] == -32256  # max negative magnitude
        assert ALAW_TABLE[0xAA] == 32256

    def test_ulaw_table_is_symmetric(self):
        # bytes with only the sign bit flipped decode to +-same value
        lo = ULAW_TABLE[np.arange(128)]
        hi = ULAW_TABLE[np.arange(128) + 128]
        assert (lo == -hi).all()

    def test_alaw_table_is_symmetric(self):
        idx = np.arange(128)
        assert (ALAW_TABLE[idx ^ 0x80] == -ALAW_TABLE[idx]).all()


class TestEncoders:
    @pytest.mark.parametrize("enc,table", [(encode_ulaw, ULAW_TABLE),
                                           (encode_alaw, ALAW_TABLE)])
    def test_encoder_is_exact_nearest_level(self, enc, table):
        rng = np.random.RandomState(0)
        s = rng.randint(-33000, 33000, 4000)
        got = table[np.frombuffer(enc(s), np.uint8)].astype(np.int64)
        # brute-force nearest distance per sample
        dist = np.abs(table.astype(np.int64)[None, :] - s[:, None])
        assert (np.abs(got - s) == dist.min(axis=1)).all()

    @pytest.mark.parametrize("enc,dec", [(encode_ulaw, decode_ulaw),
                                         (encode_alaw, decode_alaw)])
    def test_roundtrip_idempotent_on_levels(self, enc, dec):
        rng = np.random.RandomState(1)
        s = rng.randint(-32768, 32768, 4000).astype(np.int32)
        once = dec(enc(s))
        twice = dec(enc(once.astype(np.int32)))
        assert (once == twice).all()


class TestWavPath:
    @pytest.mark.parametrize("law,tag", [("ulaw", 7), ("alaw", 6)])
    def test_wav_roundtrip_snr(self, law, tag):
        sig = synth_audio(5)
        wav = encode_g711_wav(sig, 8000, law=law)
        out, rate = decode_wav(wav)
        assert rate == 8000 and len(out) == len(sig)
        err = out - np.clip(sig, -1, 1)
        snr = 10 * np.log10(np.mean(sig ** 2) / np.mean(err ** 2))
        assert snr > 30                    # telephony-grade

    def test_compression_ratio_is_2_to_1(self):
        sig = synth_audio(9)
        from moera_search_spark.operators.multimodal import encode_wav
        assert len(encode_g711_wav(sig)) < len(encode_wav(sig)) * 0.55

    def test_decode_audio_dispatches_g711(self):
        sig = synth_audio(7)
        out, rate = decode_audio(encode_g711_wav(sig, law="alaw"))
        assert rate == 8000 and len(out) == len(sig)

    def test_unknown_tag_still_raises(self):
        import struct
        hdr = b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 0x55, 1, 8000,
                                    8000, 1, 8)
        with pytest.raises(NotImplementedError):
            decode_wav(hdr + fmt + b"data" + struct.pack("<I", 0))
