"""ITU-T G.711 companding codecs (mu-law / A-law), from scratch.

Telephony-grade 2:1 companded audio is the other compressed WAV
format a real crawl actually contains (WAVE format tags 6 = A-law,
7 = mu-law from the public Microsoft RIFF registry; the reference
stores posting media by MIME type, `media/MediaManager.java`, so an
audio crawl surfaces these immediately after PCM).  Like ``adpcm.py``
this makes the format decode natively in pure numpy — one 256-entry
LUT built from the public G.711 expansion formulas, applied
vectorized to the whole payload (`lut[frombuffer(data, uint8)]`), so
decode throughput is memcpy-class and needs no per-sample loop.

Encoders exist for the test/synthesis path and are exact inverses by
construction: they pick the nearest codeword under the decode table
(vectorized searchsorted + midpoint comparison), so
``decode(encode(x))`` is the closest representable level of ``x`` —
the round-trip oracle the tests assert — while the decode side
follows the ITU formulas bit-for-bit (segment/mantissa expansion with
the 0x84 mu-law bias and the 0x55 A-law toggle).
"""

from __future__ import annotations

import numpy as np


def _build_ulaw_table() -> np.ndarray:
    """Expand every mu-law byte per G.711 (Sun/CCITT reference form:
    complement, 3-bit segment, 4-bit mantissa, bias 0x84)."""
    out = np.empty(256, np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        out[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return out


def _build_alaw_table() -> np.ndarray:
    """Expand every A-law byte per G.711 (0x55 toggle; segment 0/1
    linear, higher segments shifted; sign bit 0x80 set = positive)."""
    out = np.empty(256, np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[b] = t if (a & 0x80) else -t
    return out


ULAW_TABLE = _build_ulaw_table()
ALAW_TABLE = _build_alaw_table()


def _nearest_encoder(table: np.ndarray):
    """Vectorized exact-nearest quantizer onto a 256-level decode
    table: sort the levels once, searchsorted the inputs, pick the
    closer of the two bracketing levels (ties toward the lower level,
    matching np.searchsorted 'left')."""
    order = np.argsort(table, kind="stable")
    levels = table[order].astype(np.int32)

    def encode(samples: np.ndarray) -> bytes:
        s = np.asarray(samples, np.int32)
        hi = np.clip(np.searchsorted(levels, s, side="left"), 0, 255)
        lo = np.clip(hi - 1, 0, 255)
        pick_lo = (np.abs(levels[lo] - s) <= np.abs(levels[hi] - s))
        idx = np.where(pick_lo, lo, hi)
        return order[idx].astype(np.uint8).tobytes()

    return encode


encode_ulaw = _nearest_encoder(ULAW_TABLE)
encode_alaw = _nearest_encoder(ALAW_TABLE)


def decode_ulaw(data: bytes) -> np.ndarray:
    """mu-law bytes -> int16 linear samples (one vectorized LUT hit)."""
    return ULAW_TABLE[np.frombuffer(data, np.uint8)]


def decode_alaw(data: bytes) -> np.ndarray:
    """A-law bytes -> int16 linear samples (one vectorized LUT hit)."""
    return ALAW_TABLE[np.frombuffer(data, np.uint8)]
